"""Salting helpers must produce results identical to the unsalted
formulation (salting only changes physical distribution); hash
sampling must be deterministic and weight-proportional."""

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import sampling, skew


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(df, "doc_id", weights)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    # Re-running yields the identical assignment (content-hash based).
    b = {r["doc_id"]: r["split"] for r in sampling.hash_split(df, "doc_id", weights).collect()}
    a_map = {r["doc_id"]: r["split"] for r in a.collect()}
    assert a_map == b
    # Adding rows never reassigns existing ones.
    bigger = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    c = {r["doc_id"]: r["split"] for r in sampling.hash_split(bigger, "doc_id", weights).collect()}
    assert all(c[k] == v for k, v in a_map.items())
    with pytest.raises(ValueError):
        sampling.hash_split(df, "doc_id", {"train": 0.5})


def test_hash_sample_fraction(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    n = sampling.hash_sample(df, "doc_id", 0.25).count()
    assert abs(n / 10000 - 0.25) < 0.02


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
