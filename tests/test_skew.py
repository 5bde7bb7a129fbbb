"""Salting helpers must produce results identical to the unsalted
formulation (salting only changes physical distribution)."""

from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import skew


def test_salted_count_distinct_matches_plain(spark):
    rows = [(k, v % 37) for k in (1, 2) for v in range(500)] + [(3, 7)]
    df = spark.createDataFrame(rows, "k: long, v: long")
    plain = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    salted = {
        r["k"]: r["distinct_v"]
        for r in skew.salted_count_distinct(df, ["k"], "v", n_salts=8).collect()
    }
    assert salted == plain == {1: 37, 2: 37, 3: 1}


def test_salted_join_matches_plain(spark):
    # hot key 1 dominates the left side
    left = spark.createDataFrame(
        [(1, i) for i in range(300)] + [(2, 0), (3, 1)], "k: long, payload: long"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k: long, attr: string")
    plain = sorted(
        (r["k"], r["payload"], r["attr"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["attr"])
        for r in skew.salted_join_left_skewed(
            left, right, ["k"], salt_from=["payload"], n_salts=8
        ).collect()
    )
    assert salted == plain
    assert len(salted) == 301  # 300 (hot k=1) + 1 (k=2); k=3/k=4 unmatched
