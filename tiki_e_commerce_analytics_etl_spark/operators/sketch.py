"""Count-min sketch as a relational aggregate: bounded-size frequency
summaries built, merged, and queried with pure DataFrame expressions.

Complements the existing frequency machinery: ``text.heavy_hitters_ngrams``
(Misra-Gries) answers "which keys are frequent"; the CMS answers
"roughly how often does THIS key occur" for any key, from a summary of
fixed size ``depth × width`` — independent of vocabulary size.  Like
``merge.incremental_distinct`` (HLL) it makes a non-decomposable
statistic foldable: sketches over corpus shards merge by cell-wise SUM
into exactly the sketch of the union, so per-day/per-shard sketches
roll up without touching raw data again.

Guarantees (classic Cormode-Muthukrishnan): estimate ≥ true count
always (only overcounts from collisions), and ≤ true + εN with
probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Portability: rows use the same seeded universal-hash family over the
portable 48-bit md5 key hash as ``operators.bloom`` /
``dedup.minhash_lsh_candidates_portable`` — every cell and every
estimate is bit-exact reproducible in any SQL engine, which is how the
``cms_counts`` query's DuckDB oracle verifies it.

Scale notes: the build is one scan + one hash aggregation onto at most
depth·width uniform cells (partial agg collapses each partition to
≤ depth·width rows before the shuffle); estimates broadcast the sketch
(depth·width rows — KBs) so querying N keys is a narrow pass over the
keys.  Nothing about the corpus is retained or re-shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import md5_48
from .dedup import portable_minhash_params


def _cols(key: Column, width: int, depth: int, seed: int) -> list[Column]:
    """The per-row column index for each of the `depth` hash rows."""
    a, b = portable_minhash_params(depth, seed=seed)
    h = md5_48(key)
    return [(F.lit(a[i]) * h + F.lit(b[i])) % F.lit(width) for i in range(depth)]


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
) -> DataFrame:
    """Sketch the (weighted) frequency of ``key_col`` values.

    Returns ``(row_i: int, col_i: long, cnt: long)`` — at most
    depth·width rows.  Null keys are ignored; ``weight_col`` defaults
    to 1 per row.  Sketches over disjoint data merge with
    ``cms_merge`` (cell-wise sum ≡ sketch of the union, exactly).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.posexplode(F.array(*_cols(F.col(key_col), width, depth, seed)))
    return (
        df.where(F.col(key_col).isNotNull())
        .select(rows.alias("row_i", "col_i"), w.alias("__w"))
        .groupBy("row_i", "col_i")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with identical parameters."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "col_i").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
    est_col: str = "est",
) -> DataFrame:
    """Point-query the sketch: one row per input key with the CMS
    estimate (min over the depth rows; a missing cell reads 0, which
    can only happen for keys absent from the build).

    Plan: explode depth probes per key, broadcast-join the sketch
    cells, groupBy the key taking the min — the sketch never shuffles,
    the groupBy is on the caller's own keys.
    """
    probes = F.posexplode(F.array(*_cols(F.col(key_col), width, depth, seed)))
    exploded = keys.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("__key"), probes.alias("row_i", "col_i")
    )
    joined = exploded.join(F.broadcast(cms), ["row_i", "col_i"], "left")
    return (
        joined.groupBy("__key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(est_col))
        .withColumnRenamed("__key", key_col)
    )


def cms_join_size(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two sketches built with
    IDENTICAL (depth, width, seed) over each side's join-key
    occurrences: est = MIN over hash rows of Σ_col cnt_a·cnt_b — the
    AMS-style inner product of each row's count vectors.

    Overcount-only, like point estimates: matching keys land in the
    same cells, so every row's inner product equals the TRUE join size
    plus nonnegative collision cross-terms; the min across rows
    tightens it.  A row with no overlapping cells means a zero join
    (handled explicitly — the groupBy would otherwise drop it from the
    min).

    Estimating |A ⋈ B| costs one join of two ≤ depth·width-row
    summaries (KBs) — never a pass over either table.  This is the
    planning-time cardinality primitive behind broadcast-vs-shuffle
    and skew decisions at 100 TB, and the sketches fold (cms_merge)
    so per-shard/per-day summaries answer for any union.

    Returns one row: (est: long).
    """
    j = cms_a.select("row_i", "col_i", F.col("cnt").alias("__ca")).join(
        cms_b.select("row_i", "col_i", F.col("cnt").alias("__cb")),
        ["row_i", "col_i"],
    )
    per_row = j.groupBy("row_i").agg(F.sum(F.col("__ca") * F.col("__cb")).alias("ip"))
    agg = per_row.agg(F.min("ip").alias("__m"), F.count(F.lit(1)).alias("__n"))
    return agg.select(
        F.when(F.col("__n") < F.lit(depth), F.lit(0).cast("long"))
        .otherwise(F.coalesce(F.col("__m"), F.lit(0)).cast("long"))
        .alias("est")
    )


def hll_overlap(
    df_a: DataFrame, df_b: DataFrame, key_col: str
) -> DataFrame:
    """Set-overlap estimate between two key sets WITHOUT a join:
    distinct counts of each side and of their union from HLL sketches,
    intersection by inclusion-exclusion (|A| + |B| - |A∪B|).

    The sketches are mergeable (hll_union), so per-shard/per-day
    sketches answer overlap questions for ANY pair of unions — e.g.
    "how much does this crawl overlap the existing corpus" costs two
    KB-sized summaries instead of an anti-join against history.
    Errors compound across three estimates (each ~1.6% rsd at the
    default lgConfigK); the registered gate asserts ≤10% against the
    exact intersection.

    Returns one row: (n_a, n_b, n_union, n_intersection) — estimates,
    with n_intersection floored at 0 (inclusion-exclusion can go
    slightly negative for near-disjoint sets).
    """
    sa = df_a.agg(F.expr(f"hll_sketch_agg({key_col})").alias("sa"))
    sb = df_b.agg(F.expr(f"hll_sketch_agg({key_col})").alias("sb"))
    return (
        sa.crossJoin(F.broadcast(sb))
        .select(
            F.expr("hll_sketch_estimate(sa)").alias("n_a"),
            F.expr("hll_sketch_estimate(sb)").alias("n_b"),
            F.expr("hll_sketch_estimate(hll_union(sa, sb))").alias("n_union"),
        )
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.greatest(
                F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0)
            ).alias("n_intersection"),
        )
    )


def quantile_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Mergeable quantile sketch: a fixed-width histogram over
    [lo, hi] (tails clamped into the edge bins).  ``(bin, cnt)`` rows,
    at most n_bins — merge shard histograms with ``quantile_merge``
    (cell-wise sum ≡ histogram of the union, exactly), then estimate
    any quantile with ``histogram_quantiles`` to within one bin width
    (for in-range values).  The incremental / cross-shard complement
    of exact ``percentile`` and ``approx_percentile`` — those answer
    one dataset; this folds forever, like the HLL (incremental_distinct)
    and CMS neighbours.

    Scale: one scan + one hash agg onto uniform integer bins; the
    summary is KBs regardless of data volume.
    """
    x = F.col(col).cast("double")
    width_inv = F.lit(float(n_bins)) / F.lit(hi - lo)
    bin_ = F.least(
        F.greatest(F.floor((x - F.lit(lo)) * width_inv).cast("long"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    return (
        df.where(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_merge(*hists: DataFrame) -> DataFrame:
    """Cell-wise sum of histograms built with identical (lo, hi, bins)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    q_pcts: list[int],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Quantile estimates from the sketch: for each integer percent in
    ``q_pcts``, the upper edge of the first bin whose cumulative count
    reaches q% of the total — INTEGER comparison (cum·100 ≥ q·total),
    no float threshold, so the selection is bit-exact in any engine.
    Max error one bin width for in-range data (clamped tails pin to
    the edge bins).  The window/cross ops below run over the
    ≤ n_bins-row sketch, not data."""
    from pyspark.sql import Window

    cum = hist.select(
        "bin",
        F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    qs = hist.sparkSession.createDataFrame([(q,) for q in q_pcts], "q_pct int")
    width = (hi - lo) / n_bins
    return (
        cum.crossJoin(F.broadcast(qs))
        .where(F.col("cum") * 100 >= F.col("q_pct").cast("long") * F.col("total"))
        .groupBy("q_pct")
        .agg(F.min("bin").alias("__bin"))
        .select(
            "q_pct",
            (F.lit(lo) + (F.col("__bin") + 1) * F.lit(width)).alias("est"),
        )
    )
