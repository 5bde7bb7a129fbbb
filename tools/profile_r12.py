"""Per-query job-count + wall profiler (round-12 optimization aid):
for each named queries() entry, runs the noop-sink write once cold and
once warm, reporting wall seconds and the NUMBER OF SPARK JOBS the
execution launched (driver-side actions — each is a scheduling
round-trip; iterative trainers are dominated by them at bench scale).

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_r12.py q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.session import configure  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        configure(
            SparkSession.builder.appName("profile-r12").master(f"local[{cpus}]")
        )
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warmups (the bench's discipline)
    qs["distinct_segments"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    def job_id() -> int:
        nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        # Spark builds differ: AtomicInteger (has .get()) vs plain int
        return nid.get() if hasattr(nid, "get") else int(nid)

    for name in sys.argv[1:]:
        fn = qs[name]
        for label in ("cold", "warm"):
            j0, t0 = job_id(), time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall, jobs = time.perf_counter() - t0, job_id() - j0
            spark.catalog.clearCache()
            print(
                f"{name:36s} {label}: {wall:7.3f}s  {jobs:3d} jobs"
                f"  ({wall / max(jobs, 1):.3f}s/job)",
                flush=True,
            )


if __name__ == "__main__":
    main()
