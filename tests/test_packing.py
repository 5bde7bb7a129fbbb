"""Packing invariants for both the global (oracle-exact) and sharded
(scale-path) formulations."""

from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import packing


def _fixture(spark):
    rows = [(i, 100 + (i * 37) % 900) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id: long, tokens: long")


def test_pack_global_bins_respect_budget(spark):
    df = _fixture(spark)
    out = packing.pack_global(df, "tokens", "doc_id", budget=2048)
    per_bin = out.groupBy("bin_id").agg(F.sum("tokens").alias("t"), F.count("*").alias("n"))
    rows = per_bin.collect()
    # Scan-pack property: a bin's total minus its last doc is < budget
    # (docs may straddle; the exclusive cumsum opens a new bin when the
    # running total crosses the boundary).
    assert all(r["t"] - 999 < 2048 + 999 for r in rows)
    assert out.count() == 500
    # deterministic across runs
    a = {r["doc_id"]: r["bin_id"] for r in out.collect()}
    b = {r["doc_id"]: r["bin_id"]
         for r in packing.pack_global(df, "tokens", "doc_id", 2048).collect()}
    assert a == b


def test_pack_sharded_parallel_and_deterministic(spark):
    df = _fixture(spark)
    out = packing.pack_sharded(df, "tokens", "doc_id", budget=2048, n_shards=8)
    assert out.count() == 500
    a = {r["doc_id"]: r["bin_id"] for r in out.collect()}
    b = {r["doc_id"]: r["bin_id"]
         for r in packing.pack_sharded(df, "tokens", "doc_id", 2048, 8).collect()}
    assert a == b
    # Bins never mix shards: all docs in a bin share bin_id // stride.
    stride = packing._SHARD_STRIDE
    shard_of = {r["doc_id"]: r["bin_id"] // stride for r in out.collect()}
    assert len(set(shard_of.values())) > 1  # actually sharded
    # Repartitioning the input must not change assignments.
    c = {r["doc_id"]: r["bin_id"]
         for r in packing.pack_sharded(df.repartition(13), "tokens", "doc_id", 2048, 8).collect()}
    assert a == c


def test_pack_sharded_portable_hash_windows_on_shard(spark):
    df = _fixture(spark)
    out = packing.pack_sharded(df, "tokens", "doc_id", budget=2048, n_shards=8, portable_hash=True)
    assert out.count() == 500
    stride = packing._SHARD_STRIDE
    assert len({r["bin_id"] // stride for r in out.collect()}) > 1
    # The packing window must partition on the shard key (parallel),
    # never on a constant.
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "windowspecdefinition(__shard" in plan
    assert "SinglePartition" not in plan
