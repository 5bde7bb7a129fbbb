"""Sequence packing: assign documents to fixed-token-budget bins.

Two formulations:
  - ``pack_global``: one total order, exclusive running token sum,
    bin = floor(cum/budget).  Exactly reproducible and SQL-expressible
    (the oracle target), but the single global-order window moves all
    rows through one task — fine for a sample, wrong at 100 TB.
  - ``pack_sharded``: the scale path.  Rows are hash-sharded, each
    shard packs independently with the same scan-pack rule, and bin
    ids are namespaced by shard.  No global sort; the window
    partitions on the shard key, so packing parallelizes across
    executors.  Still deterministic (hash shard + in-shard id order),
    at the cost of at most one under-filled bin per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Generous per-shard bin namespace: shard * _SHARD_STRIDE + local bin.
_SHARD_STRIDE = 1 << 32


def pack_global(df: DataFrame, token_col: str, order_col: str, budget: int) -> DataFrame:
    """Append ``bin_id`` by exclusive running sum over one total order."""
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "bin_id", F.floor((cum - F.col(token_col)) / F.lit(float(budget))).cast("long")
    )


def pack_sharded(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    n_shards: int = 256,
    portable_hash: bool = False,
) -> DataFrame:
    """Append ``bin_id`` with per-shard scan-packing (deterministic
    hash shards; window partitioned on shard → parallel, no global
    sort).

    ``portable_hash=True`` shards by the md5 bucket of the id's string
    form (sampling.hash_bucket) instead of xxhash64 — a few cycles
    slower per row but reproducible on any engine with md5, which is
    what makes the sharded path exactly oracle-checkable.  xxhash64
    stays the default for engine-internal runs."""
    from tiki_e_commerce_analytics_etl_spark.operators.sampling import hash_bucket

    if portable_hash:
        shard = F.pmod(hash_bucket(F.col(order_col)), F.lit(n_shards))
    else:
        shard = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards))
    w = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    local_bin = F.floor((cum - F.col(token_col)) / F.lit(float(budget))).cast("long")
    return (
        df.withColumn("__shard", shard)
        .withColumn("bin_id", F.col("__shard") * F.lit(_SHARD_STRIDE) + local_bin)
        .drop("__shard")
    )
