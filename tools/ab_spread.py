"""Interleaved A/B/C of spread_small_scan settings (round 13).

spread_small_scan reads its env knobs per call, so one process can
alternate settings rep-by-rep — the interleaving controls for the
machine's drift/steal noise (this sandbox measures ~0.7 stolen cores
even idle) far better than back-to-back solo runs.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_spread.py q1 [q2 ...]
Prints one JSON line per query: medians + all reps per setting.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.session import configure  # noqa: E402

SETTINGS = {
    # round-12 behavior: unconditional fan-out to defaultParallelism
    "full": {"SPARK_GRAFT_SPREAD": "1", "SPARK_GRAFT_SPREAD_BYTES_PER_TASK": "1"},
    # round-13 default: width floored at one task per 64 KiB input
    "cap": {"SPARK_GRAFT_SPREAD": "1", "SPARK_GRAFT_SPREAD_BYTES_PER_TASK": "65536"},
    # spread disabled outright (pre-round-12 behavior)
    "off": {"SPARK_GRAFT_SPREAD": "0"},
}


def _apply(env: dict[str, str]) -> None:
    for k, v in env.items():
        os.environ[k] = v


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "5"))
    from pyspark.sql import SparkSession

    spark = (
        configure(SparkSession.builder.appName("ab-spread").master(f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["distinct_segments"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in sys.argv[1:]:
        fn = qs[name]
        # one unmeasured warmup per setting (codegen/JIT per plan shape)
        for env in SETTINGS.values():
            _apply(env)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        reps: dict[str, list[float]] = {k: [] for k in SETTINGS}
        for _ in range(rounds):
            for key, env in SETTINGS.items():
                _apply(env)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                reps[key].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
        print(
            json.dumps(
                {
                    "query": name,
                    "medians": {
                        k: round(statistics.median(v), 3) for k, v in reps.items()
                    },
                    "reps": reps,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
