"""Skew-mitigation helpers: salting for hot keys.

When to reach for these (and when not to):
- Plain algebraic aggregates (sum/count/min/max) already do map-side
  partial aggregation — a hot key ships one partial row per map task,
  so salting adds nothing.  AQE's skew-join splitting likewise handles
  most skewed sort-merge joins.
- Salting earns its keep where neither applies: count-distinct-style
  aggregates whose per-key state is large, window functions partitioned
  on a hot key, and joins where one build key dominates and the build
  side can't broadcast.

Both helpers are deterministic (hash-derived salts, no rand()), so
re-runs and speculative task retries produce identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) hashed from ``from_cols`` —
    pick columns with high cardinality within each hot key (an id,
    a timestamp) so the hot key's rows spread across salts."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(n_salts))
    )


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """count(DISTINCT x) per key without concentrating a hot key's
    whole distinct-set in one task: stage 1 dedups (keys, salt, x)
    spread over salts, stage 2 sums per-salt distinct counts.  Exact
    (each x lands in exactly one salt: the salt is hashed from x)."""
    salted = with_salt(df, [distinct_col], n_salts)
    stage1 = (
        salted.select(*keys, "__salt", distinct_col)
        .dropDuplicates([*keys, "__salt", distinct_col])
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__partial").alias(f"distinct_{distinct_col}"))


def salted_join_left_skewed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``left`` has skewed hot keys and ``right`` is
    too large to broadcast: left rows get a hash salt, right rows are
    replicated once per salt value, and the join runs on
    (keys + salt) — a hot key's rows land on ``n_salts`` reducers
    instead of one.  Cost: right side inflates ×n_salts, so size salts
    to the skew, not higher.  Result equals the plain inner join.
    """
    l = with_salt(left, salt_from, n_salts)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return l.join(r, [*keys, "__salt"]).drop("__salt")
