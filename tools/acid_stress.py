"""Multi-PROCESS stress for the acid commit protocol.

The unit tests exercise races with in-process fault injection; this
tool runs REAL concurrent processes — N appender processes each
committing B batches (every row tagged writer/seq), while a compactor
loops compact() and a vacuum loop reclaims with a 30 s grace (zero
grace would — correctly, and observed when tried — reclaim live
writers' staging dirs: the grace IS the writer protection, sized to
the longest writer stage per the vacuum docstring) — then
checks the exact invariant: the final snapshot contains every
(writer, seq) batch exactly once, nothing else, and the manifest row
count matches.  Exercises cross-process O_EXCL/hardlink atomicity,
CommitConflict redo under genuine contention, and vacuum racing live
commits.

Usage: python tools/acid_stress.py [writers] [batches] [rows_per_batch]
Exit 0 = invariant holds.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(app: str):
    from pyspark.sql import SparkSession

    from tiki_e_commerce_analytics_etl_spark.session import configure

    spark = (
        configure(SparkSession.builder.appName(app).master("local[2]"))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def appender(path: str, writer_id: int, batches: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from tiki_e_commerce_analytics_etl_spark import acid

    spark = _session(f"stress-writer-{writer_id}")
    for seq in range(batches):
        df = spark.range(rows).select(
            F.lit(writer_id).alias("writer"),
            F.lit(seq).alias("seq"),
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
        )
        # txn id makes each batch exactly-once even if we crashed and
        # re-ran (not exercised here, but the production shape)
        acid.atomic_overwrite_partitions(
            df, path, ["p"], mode="append",
            txn_app=f"w{writer_id}", txn_version=seq,
        )
    spark.stop()


def compactor(path: str, stop_flag, conflicts) -> None:
    from tiki_e_commerce_analytics_etl_spark import acid

    spark = _session("stress-compactor")
    while not stop_flag.value:
        try:
            acid.compact(spark, path, target_partitions=1)
        except FileNotFoundError:
            pass  # table not born yet
        except acid.CommitConflict:
            with conflicts.get_lock():
                conflicts.value += 1
        time.sleep(0.05)
    spark.stop()


def vacuumer(path: str, stop_flag) -> None:
    from tiki_e_commerce_analytics_etl_spark import acid

    while not stop_flag.value:
        try:
            acid.vacuum(path, keep_versions=3, grace_seconds=30)
        except FileNotFoundError:
            pass
        time.sleep(0.1)


def main() -> int:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    path = os.path.join(tempfile.mkdtemp(prefix="acid_stress_"), "t")

    ctx = mp.get_context("spawn")
    stop_flag = ctx.Value("b", False)
    conflicts = ctx.Value("i", 0)
    procs = [
        ctx.Process(target=appender, args=(path, w, batches, rows))
        for w in range(writers)
    ]
    aux = [
        ctx.Process(target=compactor, args=(path, stop_flag, conflicts)),
        ctx.Process(target=vacuumer, args=(path, stop_flag)),
    ]
    for p in aux + procs:
        p.start()
    for p in procs:
        p.join()
        if p.exitcode != 0:
            stop_flag.value = True
            for a in aux:
                a.join()
            print(f"FAIL: appender exited {p.exitcode}")
            return 1
    stop_flag.value = True
    for a in aux:
        a.join()

    from pyspark.sql import functions as F

    from tiki_e_commerce_analytics_etl_spark import acid

    spark = _session("stress-verify")
    df = acid.read_atomic(spark, path)
    got = {
        (r.writer, r.seq): r.n
        for r in df.groupBy("writer", "seq").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {(w, s): rows for w in range(writers) for s in range(batches)}
    total = df.count()
    manifest_rows = acid.snapshot_row_count(path)
    spark.stop()

    ok = got == want and total == writers * batches * rows and manifest_rows == total
    print(
        f"writers={writers} batches={batches} rows={rows} "
        f"total={total} manifest_rows={manifest_rows} "
        f"batches_seen={len(got)}/{len(want)} compact_conflicts={conflicts.value} "
        f"-> {'OK' if ok else 'FAIL'}"
    )
    if not ok:
        missing = {k for k in want if k not in got}
        wrong = {k: v for k, v in got.items() if want.get(k) != v}
        print(f"missing={sorted(missing)[:10]} wrong_counts={dict(list(wrong.items())[:10])}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
