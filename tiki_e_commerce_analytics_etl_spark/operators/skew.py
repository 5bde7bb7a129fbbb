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


def salted_join_differential(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_map: DataFrame,
    salt_from: list[str],
    buckets_col: str = "salt_buckets",
    how: str = "inner",
) -> DataFrame:
    """Per-key differentially salted equi-join — the executable form
    of ``profile.key_skew_profile``'s advice: each key is salted by
    ITS OWN profiled fan-out instead of a global constant, so the
    right side inflates only where the left is actually hot.

    ``salt_map`` is a small relation (keys + ``buckets_col``, e.g. the
    profiler's top-N output with its ``salt_buckets`` column); it is
    broadcast to both sides.  Keys absent from the map get fan-out 1
    (no replication, no salt spread).  ``salt_from`` picks the left
    columns the salt hashes from — high cardinality within a hot key
    (an event id, a timestamp) so the hot key's rows spread evenly.

    Contrast with the module's other strategies: full salting
    (``salted_join_left_skewed``) replicates the ENTIRE right side
    ×n_salts — simple, but at 100 TB the cold 99.9% of keys pay for
    the hot 0.1%; the hybrid join avoids inflation but needs the hot
    slice to broadcast.  Differential salting handles the middle
    regime — hot keys too big to broadcast, right side too big to
    replicate wholesale.  Result equals the plain join exactly
    (the salt is a partition of each key's left rows; each right
    replica meets exactly one partition).  ``how`` supports 'inner'
    and 'left': an unmatched left row carries some salt s and the
    right side, when the key exists at all, is replicated across
    EVERY salt 0..fan-1 ⊇ {s}, so left rows null-pad exactly once —
    never duplicated, never dropped.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if buckets_col not in salt_map.columns:
        raise ValueError(f"salt_map must carry a {buckets_col!r} column")
    fanout = F.broadcast(
        salt_map.select(
            *keys, F.col(buckets_col).cast("long").alias("__fan")
        ).dropDuplicates(keys)
    )
    l = (
        left.join(fanout, keys, "left")
        .withColumn("__fan", F.coalesce(F.col("__fan"), F.lit(1)))
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.col("__fan")),
        )
        .drop("__fan")
    )
    r = (
        right.join(fanout, keys, "left")
        .withColumn("__fan", F.coalesce(F.col("__fan"), F.lit(1)))
        .withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__fan") - 1)),
        )
        .drop("__fan")
    )
    return l.join(r, [*keys, "__salt"], how).drop("__salt")


def detect_hot_keys(
    df: DataFrame,
    keys: list[str],
    sample_fraction: float = 0.01,
    hot_share: float = 0.001,
    max_hot: int = 1000,
) -> DataFrame:
    """Hot join keys from a deterministic hash SAMPLE: keys whose
    sampled frequency exceeds ``hot_share`` of the sampled rows.  One
    narrow filter + one small agg — never a full-table count per key.
    The sample is md5-bucket deterministic (re-runs see the same
    sample), and ``max_hot`` bounds the result so the hot set always
    broadcasts.  Mirrors what AQE's skew statistics do at runtime,
    usable ahead of time and across stages.

    The bucket hashes ALL columns (not just keys) so rows of a hot key
    sample independently — hashing only the key would sample whole
    keys and miss the hot one entirely.  Fully-duplicate rows collapse
    into one bucket; include a distinguishing column in ``df`` when
    rows can be identical."""
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *[F.col(c) for c in df.columns])), 1, 8),
        16,
        10,
    ).cast("long")
    n_buckets = 1 << 20
    sampled = df.select(*keys).where(
        bucket % n_buckets < int(n_buckets * sample_fraction)
    )
    counts = sampled.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("__n") >= F.col("__t") * hot_share)
        .orderBy(F.desc("__n"), *keys)
        .limit(max_hot)
        .select(*keys)
    )


def hybrid_skew_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    hot_keys: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """The classic skew-hint hybrid join: route HOT keys through a
    broadcast join (the right side's hot-key slice is small enough to
    broadcast precisely BECAUSE keys are few), cold keys through the
    ordinary shuffle join — so no reducer ever receives a hot key's
    full row set, without inflating the whole right side the way
    full-table salting does.

    ``hot_keys`` defaults to ``detect_hot_keys(left, keys)``.  Result
    equals the plain join exactly (each row is routed to exactly one
    arm by a semi/anti split on the same hot set).  Supports 'inner'
    and 'left' joins (outer-right would need the arms to agree on
    unmatched right rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, keys)
    hot = F.broadcast(hot_keys.select(*keys).distinct())
    left_hot = left.join(hot, keys, "left_semi")
    left_cold = left.join(hot, keys, "left_anti")
    right_hot = right.join(hot, keys, "left_semi")
    hot_arm = left_hot.join(F.broadcast(right_hot), keys, how)
    cold_arm = left_cold.join(right, keys, how)
    return hot_arm.unionByName(cold_arm)
