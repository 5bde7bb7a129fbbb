"""Bucketed tables must join without a shuffle on either side — the
co-located-join guarantee the write-side bucketing exists for."""

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.io import write_bucketed_table


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed_table(a, "bkt_a", ["k"], n_buckets=8, sort_cols=["k"])
        write_bucketed_table(b, "bkt_b", ["k"], n_buckets=8, sort_cols=["k"])
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
