"""Data-quality checks as a first-class operator (SURVEY.md §2.12).

The reference runs six SQL ASSERTs + a summary SELECT against the mart
(analytics_dag.py:172-240) and fails the run on any violation.  Here a
check is (name, violation_predicate_or_aggregate); ``run_checks``
evaluates ALL checks in one aggregate pass over the DataFrame — a
single job, not one count() action per check, which matters when the
input is a 100 TB scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Row, Window
from pyspark.sql import functions as F


class QualityCheckError(AssertionError):
    """Raised when any quality check fails (ASSERT semantics)."""


@dataclass(frozen=True)
class Check:
    name: str
    # count of violating rows must be zero...
    violation: Column | None = None
    # ...or this aggregate boolean must be true (e.g. count(*) > 0)
    must_hold: Column | None = None


def mart_checks() -> list[Check]:
    """Q1-Q6 for the analytics mart (analytics_dag.py:177-227)."""
    return [
        Check("no_nonpositive_price", violation=F.col("price_vnd_real") <= 0),
        Check("no_null_product_id", violation=F.col("product_id").isNull()),
        Check("fx_rate_present", violation=F.col("fx_rate").isNull()),
        Check("partition_nonempty", must_hold=F.count(F.lit(1)) > 0),
        Check("usd_price_sane", violation=F.col("price_usd_real") > 100000),
        Check(
            "some_full_trend_data",
            must_hold=F.count_if(F.col("trend_signal_status") == "Full Data") > 0,
        ),
    ]


def run_checks(df: DataFrame, checks: list[Check], raise_on_fail: bool = True) -> Row:
    """Evaluate every check in one aggregation job.  Returns the summary
    row (one boolean per check, named ``ok_<name>``); raises
    QualityCheckError listing failures when ``raise_on_fail``."""
    aggs = []
    for c in checks:
        if c.violation is not None:
            aggs.append((F.count_if(F.coalesce(c.violation, F.lit(False))) == 0).alias(f"ok_{c.name}"))
        else:
            aggs.append(c.must_hold.alias(f"ok_{c.name}"))
    row = df.agg(*aggs).collect()[0]
    failures = [c.name for c in checks if not row[f"ok_{c.name}"]]
    if failures and raise_on_fail:
        raise QualityCheckError(f"quality checks failed: {failures}")
    return row


def checks_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks as a result table (check_name, violations, passed) —
    the ASSERT block reified as a query.  Still ONE aggregation pass
    over the input (every count_if folds into the same partial agg);
    the unpivot to rows happens on the single aggregate row, so the
    100 TB scan is touched exactly once.
    """
    aggs = []
    for c in checks:
        if c.violation is not None:
            aggs.append(
                F.count_if(F.coalesce(c.violation, F.lit(False))).alias(f"v_{c.name}")
            )
        else:
            aggs.append(c.must_hold.alias(f"v_{c.name}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in checks:
        if c.violation is not None:
            stack_args.append(
                f"'{c.name}', cast(v_{c.name} as long), v_{c.name} = 0"
            )
        else:
            stack_args.append(f"'{c.name}', cast(null as long), v_{c.name}")
    expr = f"stack({len(checks)}, {', '.join(stack_args)}) as (check_name, violations, passed)"
    return one.selectExpr(expr)


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than ``z`` group standard
    deviations from the group mean — the distributional screen a
    training pipeline runs before ingesting a numeric feed.

    Two-pass shape: one aggregation for per-group (n, sum, sum-of-
    squares) over DECIMAL (order-insensitive, engine-portable), then a
    broadcast join back and a narrow filter.  Mean/std use the closed
    form so results are bit-identical across engines (built-in
    stddev implementations differ at the ulp level).
    """
    d = F.col(value_col).cast("decimal(18,6)")
    # Squares are taken at scale 3 so the sum-of-squares decimal stays
    # small enough that BOTH engines' decimal→double conversions are
    # exact-integer-over-exact-power-of-ten divisions (DuckDB's cast of
    # wide scale-12 decimals is not correctly rounded and drifts an ulp
    # from Spark's BigDecimal conversion).  A 1e-3 quantization of the
    # squared values is immaterial for an outlier screen.
    d3 = F.col(value_col).cast("decimal(18,3)")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(d).cast("double").alias("__s"),
        F.sum(d3 * d3).cast("double").alias("__ss"),
    )
    mean = F.col("__s") / F.col("__n")
    var = F.col("__ss") / F.col("__n") - mean * mean
    enriched = df.join(F.broadcast(stats), group_cols).withColumn(
        "__mean", mean
    ).withColumn("__std", F.sqrt(F.greatest(var, F.lit(0.0))))
    return (
        enriched.filter(
            F.abs(F.col(value_col) - F.col("__mean")) > F.lit(z) * F.col("__std")
        )
        .drop("__n", "__s", "__ss")
        .withColumnsRenamed({"__mean": "group_mean", "__std": "group_std"})
    )


def summary(df: DataFrame) -> DataFrame:
    """Q7 — success-summary projection (analytics_dag.py:230-239):
    row count, distinct products, rows per trend_signal_status."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("product_id").alias("unique_products"),
        F.count_if(F.col("trend_signal_status") == "Full Data").alias("full_data_rows"),
        F.count_if(F.col("trend_signal_status") == "No Trend Data").alias("no_trend_rows"),
        F.count_if(F.col("trend_signal_status") == "Unmapped").alias("unmapped_rows"),
    )


def observed_write(
    df: DataFrame,
    checks: list[Check],
    writer: "callable",
    name: str = "quality",
) -> Row:
    """Run ``checks`` as write-time observations: the metrics ride the
    write job itself (``df.observe``), so a quality-gated load costs
    ONE pass over the data instead of check-aggregate + write — at a
    100 TB scan that halves the job.  ``writer`` receives the observed
    DataFrame and must trigger exactly one action (e.g.
    ``lambda d: write_partitioned(d, path, [...])``).  Returns the
    summary row (``ok_<name>`` booleans) and raises QualityCheckError
    on any violation — after the write, which is the observe tradeoff:
    gate-before-write needs the extra pass, gate-with-write validates
    the landed partition (pair with the idempotent partition-overwrite
    loads so a failed gate just re-runs the slice).
    """
    from pyspark.sql import Observation

    aggs = []
    for c in checks:
        if c.violation is not None:
            aggs.append(
                (F.count_if(F.coalesce(c.violation, F.lit(False))) == 0).alias(f"ok_{c.name}")
            )
        else:
            aggs.append(c.must_hold.alias(f"ok_{c.name}"))
    obs = Observation(name)
    writer(df.observe(obs, *aggs))
    row = Row(**obs.get)
    failures = [c.name for c in checks if not row[f"ok_{c.name}"]]
    if failures:
        raise QualityCheckError(f"quality checks failed: {failures}")
    return row


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust twin of ``zscore_outliers``: flag rows deviating more
    than ``k`` MADs (median absolute deviations) from the group
    median.  Mean/std screens are themselves dragged by the outliers
    they hunt; median/MAD are breakdown-resistant, the screen of
    choice for heavy-tailed telemetry.

    Two exact ``percentile`` aggregations (group median, then median
    absolute deviation) with broadcast join-backs.  Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` interpolate
    identically, so flags are engine-exact.  Exact percentile buffers
    each group's values — right for bounded group cardinalities; at
    unbounded 100 TB group sizes swap ``approx_percentile`` (the
    sketch gate pattern) and widen ``k``.
    """
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    with_med = df.join(F.broadcast(med), group_cols)
    mad = (
        with_med.withColumn("__adev", F.abs(F.col(value_col) - F.col("__med")))
        .groupBy(*group_cols)
        .agg(F.expr("percentile(__adev, 0.5)").alias("__mad"))
    )
    return (
        with_med.join(F.broadcast(mad), group_cols)
        .filter(F.abs(F.col(value_col) - F.col("__med")) > F.lit(k) * F.col("__mad"))
        .withColumnsRenamed({"__med": "group_median", "__mad": "group_mad"})
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
    clamp: bool = True,
) -> DataFrame:
    """Fixed-width histogram for data profiling: (bin, bin_lo, n) with
    ``bin = floor((v - lo) * nbins / (hi - lo))``.  With ``clamp``,
    out-of-range values land in the edge bins (profiling wants to SEE
    the tails); otherwise they are dropped.  Empty bins are not
    emitted (a reader left-joins a bin spine if it needs zeros).

    One partial-agg hash aggregate on a small integer key; the bin
    expression is plain double arithmetic + floor, identical in any
    engine, and the checked outputs are integers (bin, count) plus the
    exactly-representable bin_lo edge — no float-sum ordering anywhere.
    """
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(lo)) * nbins / (F.lit(hi) - F.lit(lo))).cast("long")
    b = (
        F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(nbins - 1).cast("long"))
        if clamp
        else raw
    )
    out = df.filter(v.isNotNull())
    if not clamp:
        out = out.filter((raw >= 0) & (raw < nbins))
    return (
        out.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * (F.lit(hi) - F.lit(lo)) / nbins).alias("bin_lo"),
            "n",
        )
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    n_partitions: int = 32,
) -> list[float]:
    """Exact linear-interpolation percentiles WITHOUT the `percentile`
    aggregate's single final counts-map buffer (which holds every
    distinct value on one core — measured 2.5-3 s over 600k
    near-distinct doubles at sf0.1, vs ~0.9 s for this).

    Distributed sort-rank in three cheap parallel jobs:

    1. approx_percentile boundaries split the value domain into
       ~n_partitions buckets.  Bucket id is thereafter a PURE FUNCTION
       of the value (literal comparisons) — unlike
       ``repartitionByRange``, whose per-execution boundary sampling
       is not stable across the two jobs below (measured: offsets
       from one execution mis-rank a later one by thousands of rows).
    2. count per bucket → driver prefix-sums the offsets (≤
       n_partitions scalars).
    3. global rank = bucket offset + within-bucket row_number; only
       the ≤ 2·len(probs) rows sitting AT the needed ranks return.

    Interpolation runs on the driver with the same IEEE-double
    expression Spark's `percentile` uses (``lower * (1 - frac) +
    higher * frac`` at rank ``p * (n-1)`` — NOT the algebraically
    equal ``lower + (higher - lower) * frac``, which drifts an ulp),
    which DuckDB's quantile_cont reproduces bit-for-bit.  Value-ties
    all land in one bucket, so tie runs never straddle an offset
    boundary.

    This is the verification-grade exact path; at 100 TB the
    production boundary source is ``approx_percentile`` alone — see
    ``equidepth_bins(exact=False)``.

    SPECIAL VALUES (pinned by tests/test_round6_properties.py):
    semantics follow Spark's `percentile` aggregate exactly — NaN
    orders GREATER than +Inf (Spark's total order), so high quantiles
    of NaN-bearing data are NaN; ±Inf interpolate under the IEEE
    expression (-Inf..+Inf midpoints are NaN).  DuckDB's
    quantile_cont DISAGREES on NaN ordering, so the DuckDB-oracle
    comparison precondition is NaN-free input; on that domain results
    are bit-identical including infinities and massive ties.
    """
    if not probs:
        return []
    bad = [p for p in probs if not (0.0 <= float(p) <= 1.0)]
    if bad:
        # Fail up front with the same contract Spark's `percentile`
        # enforces via AnalysisException — without this, p > 1 dies
        # deep inside with an opaque KeyError on the rank lookup and
        # p < 0 silently walks a wrong negative-rank path.
        raise ValueError(
            f"percentile probabilities must be in [0, 1]; got {bad}"
        )
    vals = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("v"))
    if n_partitions > 1:
        arr = "array(" + ", ".join(
            repr(i / n_partitions) for i in range(1, n_partitions)
        ) + ")"
        splits = (
            vals.agg(F.expr(f"approx_percentile(v, {arr}, 1000)").alias("bs"))
            .collect()[0]["bs"]
            or []
        )
        # dedupe (heavy value-ties can repeat a split) keeping order
        splits = sorted(set(float(s) for s in splits))
    else:
        splits = []
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + F.when(F.col("v") > F.lit(s), 1).otherwise(0)
    b_vals = vals.withColumn("bkt", bucket)
    counts = b_vals.groupBy("bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    n = sum(r["c"] for r in counts)
    if n == 0:
        return []
    offsets = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["bkt"]):
        offsets[r["bkt"]] = acc
        acc += r["c"]
    # ranks needed: floor/ceil of p * (n-1), in Spark's own double
    # arithmetic (Python floats ARE IEEE doubles — same ops, same bits)
    want: set[int] = set()
    for p in probs:
        r = p * (n - 1)
        lo = int(r // 1)
        want.add(lo)
        if r != lo:
            want.add(lo + 1)
    # Only the buckets that CONTAIN a wanted rank enter the sort —
    # for deciles over 32 buckets that drops ~70% of the rows before
    # the window exchange.
    sizes = {r["bkt"]: r["c"] for r in counts}
    needed_bkts = {
        b
        for rk in want
        for b, off in offsets.items()
        if off <= rk < off + sizes[b]
    }
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], "bkt int, off long"
        )
    )
    w = Window.partitionBy("bkt").orderBy("v")
    at_ranks = (
        b_vals.filter(F.col("bkt").isin([int(b) for b in needed_bkts]))
        .withColumn("lrk", F.row_number().over(w) - 1)
        .join(off_df, "bkt")
        .withColumn("rk", F.col("lrk") + F.col("off"))
        .filter(F.col("rk").isin([int(x) for x in want]))
        .select("rk", "v")
        .collect()
    )
    by_rank = {r["rk"]: r["v"] for r in at_ranks}
    out = []
    for p in probs:
        r = p * (n - 1)
        lo = int(r // 1)
        frac = r - lo
        if frac == 0.0:
            out.append(float(by_rank[lo]))
        else:
            vlo, vhi = float(by_rank[lo]), float(by_rank[lo + 1])
            out.append(vlo * (1.0 - frac) + vhi * frac)
    return out


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    col: str,
    probs: list[float],
    names: list[str] | None = None,
) -> DataFrame:
    """Exact linear-interpolation percentiles PER GROUP without the
    `percentile` aggregate's per-group counts-map buffer (one reducer
    builds a value→count map of the whole group — measured 2.4 s for
    3 × 200k-value groups at sf0.1, vs ~1 s for this).

    Sort-rank, relationally: per-group counts (broadcast), a
    ``row_number`` window partitioned by the group, a codegen
    prefilter keeping only the ≤ 2·len(probs) rank-bearing rows per
    group, and one hash aggregate summing the interpolation terms
    (``v_lo*(1-frac) + v_hi*frac`` — the same IEEE expression Spark's
    `percentile` and DuckDB's quantile_cont produce, bit-exact).

    Group-partitioned windows sort each group in one task: right for
    verification-grade exact answers over low-cardinality groups (the
    production path for high-cardinality or skewed groups is
    ``approx_percentile``, partial-aggregating).  Returns one row per
    group: (group_col, *names, n).

    NULL CONTRACT (differs from a bare `percentile` aggregate): rows
    with a NULL value are dropped BEFORE ranking, so (a) a group whose
    values are ALL NULL does not appear in the output at all (the
    aggregate form would return it with NULL percentiles), and (b)
    ``n`` counts NON-NULL values, not group rows.  Callers that need
    the all-NULL groups back should left-join this result from the
    distinct group keys of the unfiltered input.
    """
    names = names or [f"p{int(p * 100)}" for p in probs]
    bad = [p for p in probs if not (0.0 <= float(p) <= 1.0)]
    if bad:
        raise ValueError(
            f"percentile probabilities must be in [0, 1]; got {bad}"
        )
    vals = df.filter(F.col(col).isNotNull()).select(
        F.col(group_col).alias("__g"), F.col(col).cast("double").alias("__v")
    )
    n_df = vals.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy("__g").orderBy("__v")
    ranked = vals.withColumn("__rk", F.row_number().over(w) - 1).join(
        F.broadcast(n_df), "__g"
    )

    def terms(p: float) -> tuple[F.Column, F.Column]:
        r = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        lo = F.floor(r)
        frac = r - lo
        contrib = (
            F.when((F.col("__rk") == lo) & (frac == 0.0), F.col("__v"))
            .when(F.col("__rk") == lo, F.col("__v") * (F.lit(1.0) - frac))
            .when((F.col("__rk") == lo + 1) & (frac > 0.0), F.col("__v") * frac)
        )
        needed = (F.col("__rk") == lo) | ((F.col("__rk") == lo + 1) & (frac > 0.0))
        return contrib, needed

    contribs, neededs = zip(*[terms(p) for p in probs])
    any_needed = neededs[0]
    for nd in neededs[1:]:
        any_needed = any_needed | nd
    return (
        ranked.filter(any_needed)
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            *[F.sum(c).alias(nm) for c, nm in zip(contribs, names)],
            F.max("__n").alias("n"),
        )
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp ``col`` to the group's
    [``lo``, ``hi``] exact percentiles — the robust feature-prep step
    before scaling/training when a long tail would dominate.

    Bounds come from ``grouped_exact_percentiles`` (sort-rank
    relational form, bit-exact vs quantile_cont); they are a tiny
    per-group relation broadcast back onto the rows, so the whole op
    is one group-partitioned window pass + a broadcast join — no
    second data-sized shuffle.  NULL values stay NULL; groups whose
    values are all NULL pass through unchanged (their bounds are
    absent — the clamp coalesces to the value itself, written
    explicitly so no engine's null-skipping GREATEST semantics are
    relied on).  Adds ``<out_col>`` (default ``<col>_winsorized``)
    and ``was_clipped``.
    """
    if not (0.0 <= lo < hi <= 1.0):
        raise ValueError(f"need 0 <= lo < hi <= 1, got lo={lo} hi={hi}")
    out_col = out_col or f"{col}_winsorized"
    bounds = grouped_exact_percentiles(
        df, group_col, col, [lo, hi], names=["__wlo", "__whi"]
    ).select(group_col, "__wlo", "__whi")
    x = F.col(col).cast("double")
    clamped = F.least(
        F.greatest(x, F.coalesce(F.col("__wlo"), x)),
        F.coalesce(F.col("__whi"), x),
    )
    return (
        df.join(F.broadcast(bounds), group_col, "left")
        .withColumn(
            out_col, F.when(x.isNotNull(), clamped)
        )
        .withColumn(
            "was_clipped",
            x.isNotNull() & (F.col(out_col) != x),
        )
        .drop("__wlo", "__whi")
    )


def equidepth_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth (quantile) binning: per-bin count/min/max with
    boundaries at the i/n_bins percentiles — the profiling complement
    of ``histogram`` (equi-width).

    Two passes, no global sort: one aggregation for the n_bins-1
    boundary scalars (collected to the driver like zscore's closed-form
    stats — they are literals thereafter), then bin assignment as a
    chain of codegen comparisons feeding ONE hash aggregate.  A value
    equal to a boundary lands in the lower bin (strict >).

    ``exact=True`` computes exact boundaries by distributed sort-rank
    (``exact_percentiles`` — no single-reducer counts-map buffer, no
    single-partition window; measured 2.5 s → ~1.0 s at sf0.1),
    bit-identical to Spark's ``percentile`` and DuckDB's
    quantile_cont.  At 100 TB pass ``exact=False`` for
    ``approx_percentile`` (t-digest, partial-aggregating) with
    ``accuracy``; bins are then approximate at the boundaries only.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = []
    if qs:
        if exact:
            # Empty/all-null input: no boundaries — there are no rows
            # to bin, so any bin expression works (the groupBy below
            # yields zero rows); n_bins=1 likewise has no boundaries.
            bounds = exact_percentiles(df, col, qs)
        else:
            arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
            bounds = df.agg(
                F.expr(f"approx_percentile({col}, {arr}, {accuracy})").alias("bs")
            ).collect()[0]["bs"]
            bounds = bounds or []
    bin_expr = F.lit(0)
    for b in bounds:
        bin_expr = bin_expr + F.when(F.col(col) > F.lit(float(b)), 1).otherwise(0)
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_expr.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Population Stability Index (PSI) drift screen between a
    REFERENCE snapshot and a CURRENT one — the standard "did this
    column's distribution move since training/last load" data-quality
    check.  Bin boundaries are the reference's equi-depth percentiles
    (the convention: bins are fixed by the baseline, the current
    population is scored against them); per bin,
    ``psi_term = (p − q) · ln(p / q)`` with p/q = ref/cur shares.
    Sum of psi_term is the PSI (rule of thumb: <0.1 stable, >0.25
    shifted); the per-bin relation is returned instead of the scalar
    so consumers see WHERE the mass moved, and so every value is
    bit-exact against a SQL oracle (integer counts; one double
    formula per row — no float summation order anywhere).

    Bins either side never observed score NULL (ln(0) is the
    documented PSI degenerate case; standard practice is an epsilon
    clamp, which would bury the signal — NULL surfaces it).

    Plan: boundary scalars from the reference (``exact_percentiles``
    — distributed sort-rank, or t-digest at ``exact=False`` for
    100 TB), then ONE hash aggregate per side over codegen bin
    comparisons, a static ``range(n_bins)`` frame left-joining both
    count relations (n_bins rows — broadcast), and per-row double
    arithmetic.  Neither input is ever sorted globally.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    spark = ref.sparkSession
    qs = [i / n_bins for i in range(1, n_bins)]
    if exact:
        bounds = exact_percentiles(ref, col, qs)
    else:
        arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
        bounds = (
            ref.agg(
                F.expr(f"approx_percentile({col}, {arr}, {accuracy})").alias("bs")
            ).collect()[0]["bs"]
            or []
        )

    def bin_counts(df: DataFrame, out: str) -> DataFrame:
        bin_expr = F.lit(0)
        for b in bounds:
            bin_expr = bin_expr + F.when(F.col(col) > F.lit(float(b)), 1).otherwise(0)
        return (
            df.filter(F.col(col).isNotNull())
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    rc = bin_counts(ref, "ref_n")
    cc = bin_counts(cur, "cur_n")
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(F.broadcast(rc), "bin", "left")
        .join(F.broadcast(cc), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
        )
    )
    totals = joined.agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    p = F.col("ref_n").cast("double") / F.col("ref_total")
    q = F.col("cur_n").cast("double") / F.col("cur_total")
    term = F.when(
        (F.col("ref_n") > 0) & (F.col("cur_n") > 0), (p - q) * F.log(p / q)
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        "bin", "ref_n", "cur_n", term.alias("psi_term")
    )


def benford_screen(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit screen — the classic anomaly/fraud
    check for naturally-occurring positive magnitudes (prices,
    populations, transaction amounts): observed first-significant-
    digit counts against the expected ``log10(1 + 1/d)`` shares.

    Returns one row per digit 1-9: (digit, n, expected_ppm,
    observed_ppm, dev_ppm = observed − expected) — all integer ppm
    (floor), so the oracle compare is bit-exact with zero float
    summation anywhere.  The first significant digit comes from the
    DECIMAL RENDERING of abs(value) (first char in [1-9] of the
    plain-notation string), which is exact for any magnitude —
    dividing by a computed power of ten would round through doubles.
    Rows that are NULL, zero, or have no nonzero digit are excluded
    from n.  One narrow projection + one 9-key hash aggregate + a
    broadcast total; nothing sorts.
    """
    # format_number/casts render scientific notation for extreme
    # doubles; regexp over the plain string form of a DECIMAL cast is
    # notation-free.  38,6 covers the engine's numeric surfaces.
    s = F.abs(F.col(col)).cast("decimal(38,6)").cast("string")
    digit = F.regexp_extract(s, r"([1-9])", 1)
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(digit.alias("d"))
        .filter(F.col("d") != "")
        .groupBy(F.col("d").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = {d: math.floor(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    exp_expr = F.lit(None).cast("long")
    for d, ppm in expected.items():
        exp_expr = F.when(F.col("digit") == d, F.lit(ppm)).otherwise(exp_expr)
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        exp_expr.alias("expected_ppm"),
        F.floor(F.lit(1_000_000) * F.col("n") / F.col("total"))
        .cast("long")
        .alias("observed_ppm"),
        (
            F.floor(F.lit(1_000_000) * F.col("n") / F.col("total")).cast("long")
            - exp_expr
        ).alias("dev_ppm"),
    )
