"""Dump ``.explain("formatted")`` for named queries() entries into
plans/r13/<query>_<tag>.txt — the before/after plan evidence the
round-12 optimization notes cite.

Usage: python tools/explain_r13.py <before|after> <query> [query ...]
       python tools/explain_r13.py <before|after> --file <list.txt>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    if tag not in ("before", "after"):
        raise SystemExit("first arg must be 'before' or 'after'")
    if sys.argv[2] == "--file":
        with open(sys.argv[3]) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    else:
        names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession
    from tiki_e_commerce_analytics_etl_spark.session import configure

    spark = (
        configure(
            SparkSession.builder.appName("explain-r13").master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        )
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
