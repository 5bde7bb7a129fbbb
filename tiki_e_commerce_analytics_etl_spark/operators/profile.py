"""Key-distribution profiling — the pre-flight diagnostic for join /
aggregation strategy at scale.

Before shuffling 100 TB on a key, you want to know whether the key is
skewed (one reducer gets the whale partition), how many distinct keys
there are (broadcast vs shuffle), and how many salt buckets a salted
repartition would need.  ``key_skew_profile`` answers all three with
ONE shuffle: a hash aggregation on the key (map-side partial combine,
uniform by construction), after which everything else is arithmetic
over the tiny per-key-count relation.  The heavy-key list itself is a
``TakeOrderedAndProject`` (top-N, never a full sort), and the global
scalars attach via a broadcast of a one-row aggregate — the same
scalar-attachment shape the rest of the engine uses.

All derived ratios are integer ppm (floor), so results are bit-exact
across engines — no float division in the contract columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
    target_rows_per_bucket: int = 1000,
) -> DataFrame:
    """Per-heavy-key skew report over ``df`` grouped by ``key_cols``.

    Returns ``top_n`` rows (heaviest keys first, key-asc tiebreak):

    - ``key``            — the key rendered as a string (composite
      keys joined with ``0x1f``, the unit separator; NULL components
      render as ``0x00`` so (NULL,'x') / ('x',NULL) / ('x','x') stay
      distinct — plain ``concat_ws`` would drop the NULLs and merge
      them)
    - ``key_rows``       — exact row count for the key
    - ``heavy_rank``     — 1-based rank by (key_rows desc, key asc)
    - ``share_ppm``      — floor(1e6 · key_rows / total_rows)
    - ``total_rows`` / ``n_keys`` / ``max_key_rows`` — global stats
    - ``skew_ppm``       — floor(1e6 · max_key_rows · n_keys /
      total_rows): 1_000_000 means perfectly uniform; N·1e6 means the
      largest key is N× the mean — the direct "do I need AQE skew
      handling / salting" signal
    - ``salt_buckets``   — ceil(key_rows / target_rows_per_bucket),
      the per-key salt fan-out that caps each bucket at the target

    Scale shape: one uniform-key shuffle (the groupBy), a top-N that
    never global-sorts, and a broadcast one-row join.  The per-key
    count relation is never collected.
    """
    if not key_cols:
        raise ValueError("key_skew_profile needs at least one key column")
    if target_rows_per_bucket < 1:
        raise ValueError("target_rows_per_bucket must be >= 1")
    if len(key_cols) == 1:
        key = F.col(key_cols[0]).cast("string")
    else:
        # concat_ws silently DROPS null components, which would merge
        # distinct composite keys like (NULL,'x') / ('x',NULL) into one
        # rendered key and inflate its count.  Coalesce each component
        # with a NUL sentinel first so nulls render explicitly (a real
        # value equal to "\x00" would collide, but NUL never survives
        # the string casts of real data columns).
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in key_cols
        ]
        key = F.concat_ws("\x1f", *parts)
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("key_rows")
    )
    totals = counts.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("key_rows").alias("max_key_rows"),
    )
    top = (
        counts.orderBy(F.desc("key_rows"), F.asc("key"))
        .limit(top_n)
        .select(
            "key",
            "key_rows",
            F.row_number()
            .over(
                # bounded by top_n rows — a single in-memory window,
                # not a global sort of the key space
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.orderBy(F.desc("key_rows"), F.asc("key"))
            )
            .alias("heavy_rank"),
        )
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "key_rows",
        "heavy_rank",
        F.floor(
            F.lit(1_000_000) * F.col("key_rows") / F.col("total_rows")
        )
        .cast("long")
        .alias("share_ppm"),
        "total_rows",
        "n_keys",
        "max_key_rows",
        F.floor(
            F.lit(1_000_000)
            * F.col("max_key_rows")
            * F.col("n_keys")
            / F.col("total_rows")
        )
        .cast("long")
        .alias("skew_ppm"),
        F.floor(
            (F.col("key_rows") + F.lit(target_rows_per_bucket - 1))
            / F.lit(target_rows_per_bucket)
        )
        .cast("long")
        .alias("salt_buckets"),
    )
