"""Property tests for the relational Bloom filter (operators/bloom.py)
and count-min sketch (operators/sketch.py): the classic guarantees hold
on arbitrary key sets, and shard-merge equals the one-shot build."""

import random

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import bloom, sketch

M = 1 << 12
K = 4


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(42)
    history = [f"doc-{rng.randrange(10_000)}" for _ in range(400)]
    batch_seen = rng.sample(history, 50)
    batch_new = [f"new-{i}" for i in range(50)]
    return history, batch_seen, batch_new


def test_bloom_no_false_negatives(spark, corpora):
    history, batch_seen, batch_new = corpora
    words = bloom.bloom_build(_keys_df(spark, history), "k", m_bits=M, k=K)
    flags = {
        r["k"]: r["maybe_seen"]
        for r in bloom.bloom_probe(
            _keys_df(spark, batch_seen + batch_new), words, "k", m_bits=M, k=K
        ).collect()
    }
    # Hard guarantee: every key fed to the build probes positive.
    assert all(flags[k] for k in batch_seen)
    # Statistical check: most genuinely-new keys screen out.  With
    # ~400 distinct keys in 4096 bits the per-key FP rate is far below
    # 50%; 50 trials at even p=0.5 all-positive is 2^-50.
    assert sum(not flags[k] for k in batch_new) > 25


def test_bloom_merge_equals_single_build(spark, corpora):
    history, _, _ = corpora
    cut = len(history) // 3
    single = bloom.bloom_build(_keys_df(spark, history), "k", m_bits=M, k=K)
    merged = bloom.bloom_merge(
        bloom.bloom_build(_keys_df(spark, history[:cut]), "k", m_bits=M, k=K),
        bloom.bloom_build(_keys_df(spark, history[cut:]), "k", m_bits=M, k=K),
    )
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, merged.collect()))


def test_bloom_word_count_bounded(spark, corpora):
    history, _, _ = corpora
    words = bloom.bloom_build(_keys_df(spark, history), "k", m_bits=M, k=K)
    assert words.count() <= (M + bloom.BITS_PER_WORD - 1) // bloom.BITS_PER_WORD
    # No mask touches the sign bit: every word is non-negative.
    assert words.where(F.col("word") < 0).count() == 0


@pytest.fixture(scope="module")
def stream(spark):
    rng = random.Random(7)
    # Zipf-ish: key i appears ~ 200//(i+1) times.
    rows = [(f"key-{i}",) for i in range(60) for _ in range(200 // (i + 1))]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "k string")


def test_cms_overcounts_only(spark, stream):
    cms = sketch.cms_build(stream, "k", depth=4, width=256)
    exact = {r["k"]: r["n"] for r in stream.groupBy("k").agg(F.count("*").alias("n")).collect()}
    probes = _keys_df(spark, list(exact) + ["absent-x", "absent-y"])
    est = {r["k"]: r["est"] for r in sketch.cms_estimate(probes, cms, "k", depth=4, width=256).collect()}
    for k, n in exact.items():
        assert est[k] >= n
    # Total mass bound: estimate error is bounded by collisions, which
    # cannot exceed the stream size.
    n_total = sum(exact.values())
    assert all(v <= n_total for v in est.values())


def test_cms_merge_equals_single_build(spark, stream):
    a = stream.where(F.crc32(F.col("k")) % 2 == 0)
    b = stream.where(F.crc32(F.col("k")) % 2 == 1)
    single = sketch.cms_build(stream, "k", depth=4, width=256)
    merged = sketch.cms_merge(
        sketch.cms_build(a, "k", depth=4, width=256),
        sketch.cms_build(b, "k", depth=4, width=256),
    )
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, merged.collect()))


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 3), ("b", 2)], "k string, w int")
    cms = sketch.cms_build(df, "k", weight_col="w", depth=4, width=64)
    est = {
        r["k"]: r["est"]
        for r in sketch.cms_estimate(_keys_df(spark, ["a", "b"]), cms, "k", depth=4, width=64).collect()
    }
    assert est["a"] >= 8 and est["b"] >= 2


def test_quantile_histogram_merge_and_bound(spark):
    import random as _r

    rng = _r.Random(3)
    vals = [rng.uniform(0, 1000) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, nb = 0.0, 1000.0, 256
    hist = sketch.quantile_histogram(df, "x", lo, hi, nb)
    # shard-merge == one-shot
    a = sketch.quantile_histogram(df.where(F.crc32(F.col("x").cast("string")) % 2 == 0), "x", lo, hi, nb)
    b = sketch.quantile_histogram(df.where(F.crc32(F.col("x").cast("string")) % 2 == 1), "x", lo, hi, nb)
    merged = sketch.quantile_merge(a, b)
    assert sorted(map(tuple, hist.collect())) == sorted(map(tuple, merged.collect()))
    # estimates within one bin width of the discrete quantile
    est = {r.q_pct: r.est for r in sketch.histogram_quantiles(hist, [10, 50, 90], lo, hi, nb).collect()}
    s = sorted(vals)
    width = (hi - lo) / nb
    import math
    for q in (10, 50, 90):
        exact = s[math.ceil(q * len(s) / 100) - 1]
        assert abs(est[q] - exact) <= width, (q, est[q], exact)


def test_cms_join_size_bounds_and_exactness(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sketch as sk

    def build(rows):
        df = spark.createDataFrame([(str(r),) for r in rows], "key string")
        return sk.cms_build(df, "key", depth=4, width=4096)

    def est(a_rows, b_rows):
        return sk.cms_join_size(build(a_rows), build(b_rows), depth=4).collect()[0]["est"]

    # single shared key: inner product is exactly n_a * n_b
    assert est([1] * 5, [1] * 3) == 15
    # multiset join size: sum over keys of counts product
    a = [1, 1, 2, 3]
    b = [1, 2, 2, 9]
    true = 2 * 1 + 1 * 2  # key1: 2x1, key2: 1x2
    e = est(a, b)
    assert e >= true  # overcount-only guarantee
    assert e == true  # 4 distinct keys in 4096 columns: no collisions
    # disjoint keys -> 0 (no shared cells in some row, or zero products)
    assert est([1, 2], [3, 4]) == 0


def test_cms_join_size_merged_shards_equal_one_shot(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sketch as sk

    rows = [str(i % 7) for i in range(50)]
    df = spark.createDataFrame([(r,) for r in rows], "key string")
    whole = sk.cms_build(df, "key", depth=4, width=1024)
    half_a = spark.createDataFrame([(r,) for r in rows[:20]], "key string")
    half_b = spark.createDataFrame([(r,) for r in rows[20:]], "key string")
    merged = sk.cms_merge(
        sk.cms_build(half_a, "key", depth=4, width=1024),
        sk.cms_build(half_b, "key", depth=4, width=1024),
    )
    other = sk.cms_build(
        spark.createDataFrame([("3",), ("5",)], "key string"), "key", depth=4, width=1024
    )
    e_whole = sk.cms_join_size(whole, other, depth=4).collect()[0]["est"]
    e_merged = sk.cms_join_size(merged, other, depth=4).collect()[0]["est"]
    assert e_whole == e_merged


def test_hll_overlap_tracks_exact(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sketch as sk

    a = spark.createDataFrame([(i,) for i in range(1000)], "u long")
    b = spark.createDataFrame([(i,) for i in range(700, 1500)], "u long")  # 300 shared
    r = sk.hll_overlap(a, b, "u").collect()[0]
    for col, true in (("n_a", 1000), ("n_b", 800), ("n_union", 1500), ("n_intersection", 300)):
        assert abs(r[col] - true) / true <= 0.10, (col, r[col])
    # disjoint sets: intersection floored at zero, never negative
    c = spark.createDataFrame([(i,) for i in range(5000, 5100)], "u long")
    assert sk.hll_overlap(a, c, "u").collect()[0]["n_intersection"] >= 0
