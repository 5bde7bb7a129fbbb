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


def _skewed_golden_inputs(spark, n=120_000, hot_tenths=3):
    """Golden-join inputs with one product_id carrying hot_tenths/10 of
    the fact — the hot-SKU regime (a flash-sale product crawled every
    snapshot) where the fact->dim_products shuffle develops a straggler
    partition once dims are too big to broadcast."""
    import datetime

    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < hot_tenths, F.lit(7))
        .otherwise((F.col("id") % 997) + 100)
        .alias("product_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias(
            "snapshot_date"
        ),
        (F.col("id") % 100000).cast("double").alias("current_price"),
        (F.col("id") % 120000).cast("double").alias("original_price"),
        (F.col("id") % 50).cast("long").alias("discount_rate"),
    )
    dim_p = spark.range(1200).select(
        F.col("id").alias("product_id"),
        F.concat(F.lit("p"), F.col("id")).alias("name"),
        F.lit("b").alias("brand_name"),
        (F.col("id") % 50).alias("category_id"),
    )
    dim_c = spark.range(50).select(
        F.col("id").alias("category_id"),
        F.concat(F.lit("c"), F.col("id")).alias("category_name"),
    )
    km = spark.range(50).select(
        F.col("id").alias("tiki_category_id"),
        F.concat(F.lit("kw"), F.col("id") % 5).alias("trend_keyword"),
        F.lit(True).alias("is_active"),
    )
    trends = spark.createDataFrame(
        [
            (f"kw{k}", datetime.date(2024, 1, 1) + datetime.timedelta(days=d), float(k * 10 + d))
            for k in range(5)
            for d in range(30)
        ],
        "keyword string, date date, score double",
    )
    fx = spark.createDataFrame(
        [
            ("USD", "VND", datetime.date(2024, 1, 1) + datetime.timedelta(days=d), 25000.0 + d)
            for d in range(30)
        ],
        "from_currency string, to_currency string, date date, rate double",
    )
    return fact, dim_p, dim_c, km, trends, fx


def _checksum(rows):
    return len(rows), sum(hash(tuple(r)) for r in rows) & ((1 << 64) - 1)


def test_golden_join_skewed_fact_aqe_splits(spark):
    """Golden Join under a hot-SKU fact in the no-broadcast regime:
    AQE's skew-join handling must split the straggler partition (the
    executed plan carries the skew=true marker) and the skew-split run
    must produce bit-identical results to the broadcast plan, which is
    immune to join skew by construction (the fact never shuffles)."""
    from tiki_e_commerce_analytics_etl_spark.plans.golden_join import golden_join

    inputs = _skewed_golden_inputs(spark)
    expected = _checksum(golden_join(*inputs, broadcast_dims=True).collect())

    # Scale AQE's skew thresholds (tuned for multi-GB partitions) down
    # to test-size data; the mechanism under test is identical.
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = golden_join(*inputs, broadcast_dims=False)
        got = _checksum(out.collect())
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin" in plan  # broadcasts really were disabled
    assert plan.count("skew=true") >= 1  # the hot partition was split
    assert got == expected


def test_golden_join_skewed_fact_salted_fallback_matches(spark):
    """The engine-side fallback for planners without AQE skew handling:
    salt the hot fact side of the golden join's fact->dim_products
    join.  Results must be identical to the broadcast formulation
    (salting only changes the physical distribution), and the salted
    plan must actually shuffle on (key, salt) so the hot SKU spreads
    across reducers."""
    fact, dim_p, *_ = _skewed_golden_inputs(spark, n=30_000)
    cols = ["product_id", "snapshot_date", "current_price", "name", "category_id"]
    expected = _checksum(
        fact.join(F.broadcast(dim_p), "product_id").select(*cols).collect()
    )
    salted = skew.salted_join_left_skewed(
        fact, dim_p, ["product_id"], salt_from=["snapshot_date", "current_price"], n_salts=8
    ).select(*cols)
    got = _checksum(salted.collect())
    assert got == expected
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # join really ran on (product_id, salt)


def test_domain_cap_deterministic_and_bounded(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, f"d{i % 3}", 100 - (i % 7)) for i in range(60)],
        "doc_id: long, source: string, n_chars: long",
    )
    capped = sampling.domain_cap(df, "source", k=5, order_col="n_chars")
    rows = capped.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append((r.n_chars, r.doc_id))
    assert all(len(v) == 5 for v in per.values())
    # deterministic: re-run yields the identical selection
    again = {(r.doc_id) for r in sampling.domain_cap(df, "source", 5, "n_chars").collect()}
    assert {r.doc_id for r in rows} == again
    # keeps the LARGEST docs per domain
    for v in per.values():
        assert min(c for c, _ in v) >= 99  # top chars are 100/99 repeats


def test_chunk_dedup_hot_chunk_bounded(spark):
    """A boilerplate tile shared by EVERY document (license-header
    shape) must neither blow up pair-wise nor skew results: the window
    formulation counts it with one row per distinct holder."""
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import duplicate_chunk_stats

    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [(i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(10))) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, text string").repartition(8)
    out = duplicate_chunk_stats(df, "text", "doc_id", chunk=10)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("dup_chunks").alias("dups"),
        F.sum("n_chunks").alias("chunks"),
    ).collect()[0]
    # every doc: 2 tiles, exactly 1 (the boilerplate) duplicated
    assert agg.docs == 2000 and agg.chunks == 4000 and agg.dups == 2000


def test_detect_hot_keys_finds_planted_hot_key(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import skew as skew_ops

    rows = [(1, i) for i in range(20000)] + [(k, 0) for k in range(2, 2002)]
    df = spark.createDataFrame(rows, "k long, v long")
    hot = [r.k for r in skew_ops.detect_hot_keys(
        df, ["k"], sample_fraction=0.2, hot_share=0.05
    ).collect()]
    assert hot == [1]


def test_hybrid_skew_join_equals_plain(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import skew as skew_ops

    left = spark.createDataFrame(
        [(1, i) for i in range(5000)] + [(k, k) for k in range(2, 300)],
        "k long, lv long",
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 300)] + [(1, 99)], "k long, rv long"
    )
    for how in ("inner", "left"):
        got = skew_ops.hybrid_skew_join(left, right, ["k"], how=how)
        want = left.join(right, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how
    # the hot arm must be a broadcast join and the hot set must route
    # key 1 away from the shuffle arm
    hot = skew_ops.detect_hot_keys(left, ["k"], sample_fraction=0.5, hot_share=0.05)
    assert [r.k for r in hot.collect()] == [1]
    plan = skew_ops.hybrid_skew_join(left, right, ["k"], hot_keys=hot)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_differential_equals_plain(spark):
    """Round 8: per-key differential salting — result is exactly the
    plain inner join; the hot key's left rows spread across ITS
    profiled fan-out, cold and unmapped keys keep fan-out 1 (no
    right-side inflation for them)."""
    from tiki_e_commerce_analytics_etl_spark.operators import profile, skew as skew_ops

    left = spark.createDataFrame(
        [(1, i) for i in range(2000)]            # hot key
        + [(k, k) for k in range(2, 50)],        # cold keys
        "k long, lv long",
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 60)] + [(1, 99)], "k long, rv long"
    )
    salt_map = profile.key_skew_profile(
        left, ["k"], top_n=3, target_rows_per_bucket=100
    ).select(F.col("key").cast("long").alias("k"), "salt_buckets")
    got = skew_ops.salted_join_differential(
        left, right, ["k"], salt_map, salt_from=["lv"]
    )
    want = left.join(right, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # the profiled fan-out: hot key 1 gets ceil(2000/100)=20 buckets,
    # and its left rows actually spread across ALL of them
    fan = {r["k"]: r["salt_buckets"] for r in salt_map.collect()}
    assert fan[1] == 20
    l_salted = (
        left.join(F.broadcast(salt_map), ["k"], "left")
        .withColumn("__fan", F.coalesce(F.col("salt_buckets"), F.lit(1)))
        .withColumn("s", F.pmod(F.xxhash64("lv"), F.col("__fan")))
    )
    spread = l_salted.filter("k = 1").select("s").distinct().count()
    assert spread == 20
    # cold keys never leave salt 0 (fan-out 1)
    assert l_salted.filter("k != 1").filter("s != 0").count() == 0

    # missing buckets column is a loud error
    with pytest.raises(ValueError, match="salt_buckets"):
        skew_ops.salted_join_differential(
            left, right, ["k"], salt_map.select("k"), salt_from=["lv"]
        )

    # LEFT join: unmatched left keys null-pad exactly once — never
    # duplicated across salts, never dropped (right covers every salt
    # of an existing key; an absent key has no replicas at all)
    left2 = left.unionByName(
        spark.createDataFrame([(999, 7)], "k long, lv long")  # no right match
    )
    got_l = skew_ops.salted_join_differential(
        left2, right, ["k"], salt_map, salt_from=["lv"], how="left"
    )
    want_l = left2.join(right, ["k"], "left")
    assert sorted(map(tuple, got_l.collect())) == sorted(map(tuple, want_l.collect()))
    with pytest.raises(ValueError, match="how"):
        skew_ops.salted_join_differential(
            left, right, ["k"], salt_map, salt_from=["lv"], how="full"
        )
