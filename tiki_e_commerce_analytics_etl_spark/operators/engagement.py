"""Engagement / marketing analytics over the event stream and order
history: rolling active users (DAU / WAU / MAU), cohort retention,
RFM segmentation, and market-basket co-occurrence.

These are the standard e-commerce mart rollups one layer above the
reference's Golden Join (its BigQuery mart is the input to exactly
these dashboard queries); none needs anything beyond composable
DataFrame ops, but each has a distributed-shape trap this module
avoids:

- **Rolling distinct counts** (WAU/MAU): Spark windows cannot express
  COUNT(DISTINCT) OVER RANGE.  The relational rewrite: dedupe to
  (user, active-day) pairs, explode each pair onto the ≤W report days
  it contributes to (a BOUNDED fan-out of exactly ``window_days``),
  dedupe (user, report-day), count.  Three hash shuffles on uniform
  keys, no window sort, no per-day state.
- **RFM quintiles**: ntile() over the full customer table is a global
  sort on ONE partition.  Instead the 4 quintile boundaries per metric
  are computed as scalars in a single aggregation (the equidepth_bins
  pattern) and scores assigned by codegen comparisons — one narrow
  pass, no global sort.
- **Market-basket pairs**: the per-basket self-join is quadratic in
  basket SIZE but baskets are small and bounded in practice; the join
  is an equi-join on basket id (co-partitioned, no cartesian), and all
  support/lift arithmetic stays in exact integers (parts-per-million
  via floor division) so results are order- and partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rolling_active_users",
    "rolling_active_users_hll",
    "returning_users",
    "cohort_retention",
    "rfm_scores",
    "rfm_score_agreement",
    "ab_conversion",
    "basket_pairs",
    "frequent_triples",
    "item_neighbors",
]


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per observed activity day: distinct users active that day (dau)
    and within the trailing ``window_days`` window (active_{W}d).

    Report days are the days on which at least one event occurred (the
    data-driven reporting set — no calendar densification; a silent
    day has no row).  A user active on day d contributes to report
    days d .. d+W-1, so the fan-out is bounded by W per (user, day)
    pair regardless of user activity volume; the second distinct
    collapses multi-day actives before counting.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.col(ts_col).cast("date")
    pairs = df.select(day.alias("day"), F.col(user_col).alias("usr")).distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = pairs.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("day"),
        "usr",
    ).distinct()
    rolled = contrib.groupBy("day").agg(
        F.count(F.lit(1)).alias(f"active_{window_days}d")
    )
    # inner join = restrict to observed days (rolled also carries up to
    # W-1 days past the last observed day — extrapolation, dropped)
    return dau.join(rolled, "day")


def rolling_active_users_hll(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Sketch-mergeable scale path for ``rolling_active_users``: one
    HLL sketch per day (``hll_sketch_agg``), trailing windows answered
    by UNIONING the ≤W daily sketches (``hll_union_agg``) — state is
    O(days × sketch_size) instead of O(users × days), and the daily
    sketch table is exactly the incrementally-maintainable shape
    (new events fold into their day's sketch; see
    ``merge.incremental_distinct`` for the CDC-fed variant).

    Estimates carry HLL error (~1.6% at the default lgConfigK=12); the
    registered gate asserts ≤10% against the exact path per day.
    Returns (day, approx_{W}d).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.col(ts_col).cast("date")
    daily = (
        df.select(day.alias("d"), F.col(user_col).alias("usr"))
        .groupBy("d")
        .agg(F.expr("hll_sketch_agg(usr)").alias("sk"))
    )
    contrib = daily.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))).alias(
            "day"
        ),
        "sk",
    )
    rolled = contrib.groupBy("day").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias(f"approx_{window_days}d")
    )
    # observed days only, same reporting set as the exact path
    return rolled.join(daily.select(F.col("d").alias("day")), "day")


def returning_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Daily returning-user counts: per observed day, how many of that
    day's actives were ALSO active in the trailing ``window_days``
    window ending the day before (the day-over-window retention
    numerator; rate = n_returning / dau).

    Same bounded-explode machinery as ``rolling_active_users``: a user
    active on day d contributes "prior presence" to report days
    d+1 .. d+W, deduped to (report day, user), then ONE semi-join
    marks each (day, user) active pair as returning — every shuffle on
    uniform (day, user) keys, no window sort, fan-out bounded by W.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.col(ts_col).cast("date")
    pairs = df.select(day.alias("day"), F.col(user_col).alias("usr")).distinct()
    prior = pairs.select(
        F.explode(
            F.sequence(F.date_add(F.col("day"), 1), F.date_add(F.col("day"), window_days))
        ).alias("day"),
        "usr",
    ).distinct()
    returning = pairs.join(prior, ["day", "usr"], "left_semi")
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    ret = returning.groupBy("day").agg(F.count(F.lit(1)).alias("n_returning"))
    return (
        dau.join(ret, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("n_returning", F.lit(0)).alias("n_returning"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    date_col: str,
) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the month of
    their FIRST order (cohort_month, first-of-month date), counted
    distinct in each subsequent month_age = months since cohort.

    Month arithmetic is integer (year*12 + month - 1) — exact, no
    date-interval semantics to disagree on.  Two shuffles: the
    first-order aggregation and the (cohort, age) count; the join back
    is on the user key the first aggregation already partitioned by.
    """
    m = (F.year(date_col) * 12 + F.month(date_col) - 1).cast("long")
    base = df.select(F.col(user_col).alias("usr"), m.alias("m"))
    first = base.groupBy("usr").agg(F.min("m").alias("cm"))
    return (
        base.join(first, "usr")
        .groupBy("cm", (F.col("m") - F.col("cm")).alias("month_age"))
        .agg(F.countDistinct("usr").alias("n_customers"))
        .select(
            F.make_date(
                F.floor(F.col("cm") / 12).cast("int"),
                (F.col("cm") % 12 + 1).cast("int"),
                F.lit(1),
            ).alias("cohort_month"),
            "month_age",
            "n_customers",
        )
    )


def rfm_scores(
    df: DataFrame,
    user_col: str,
    date_col: str,
    amount_col: str,
    n_tiles: int = 5,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation.

    Per customer: days since last order (recency, anchored at the
    global max order date so the result is a pure function of the
    data), order count (frequency), and summed spend (monetary, exact
    decimal sum surfaced as double).  Each metric is scored 1..n_tiles
    by quantile boundaries — score n_tiles = best (most recent /
    most frequent / highest spend).

    No global sort: the 3×(n_tiles-1) boundaries and the anchor date
    come from ONE aggregation over the per-customer table (collected
    scalars, the equidepth_bins pattern), then scores are codegen
    comparisons.  Ties land in the lower score (strict >), so equal
    values always get equal scores — ntile() would split them by
    arbitrary physical order.

    Recency is scored via last-order day directly (monotone in
    recency, no second pass to re-anchor): later last order ⇒ higher
    score.

    ``exact=True`` (default) uses exact ``percentile`` boundaries —
    the per-customer table is customer-sized, so the single final
    buffer is fine far past this scale, and DuckDB's quantile_cont
    reproduces the scores bit-for-bit.  At 100 TB-corpus customer
    counts pass ``exact=False`` for partial-aggregating
    ``approx_percentile`` boundaries with ``accuracy``; scores can
    then differ from exact by at most one tile at the boundaries
    (asserted by the rfm_approx_gate oracle query).
    """
    if n_tiles < 2:
        raise ValueError("n_tiles must be >= 2")
    qs = [i / n_tiles for i in range(1, n_tiles)]
    arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    last_day = F.datediff(
        F.max(F.col(date_col)).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    per = df.groupBy(F.col(user_col).alias("usr")).agg(
        last_day.alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    row = per.agg(
        F.max("last_day").alias("anchor"),
        F.expr(f"{fn}(last_day, {arr}{extra})").alias("rb"),
        F.expr(f"{fn}(frequency, {arr}{extra})").alias("fb"),
        F.expr(f"{fn}(monetary, {arr}{extra})").alias("mb"),
    ).collect()[0]
    # Empty input: the aggregation returns one all-NULL row; keep the
    # output schema by scoring with zero boundaries over zero rows
    # instead of crashing on int(None).
    anchor = int(row["anchor"]) if row["anchor"] is not None else 0
    rb, fb, mb = (row["rb"] or []), (row["fb"] or []), (row["mb"] or [])

    def score(col: str, bounds: list[float]) -> F.Column:
        e = F.lit(1)
        for b in bounds:
            e = e + F.when(F.col(col) > F.lit(float(b)), 1).otherwise(0)
        return e

    return per.select(
        "usr",
        (F.lit(anchor) - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary",
        score("last_day", rb).alias("r_score"),
        score("frequency", fb).alias("f_score"),
        score("monetary", mb).alias("m_score"),
    ).withColumn(
        "rfm_segment",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def rfm_score_agreement(
    df: DataFrame,
    user_col: str,
    date_col: str,
    amount_col: str,
    n_tiles: int = 5,
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass agreement gate between exact- and approx-boundary RFM
    scoring: the per-customer table is built ONCE, both boundary sets
    come from ONE aggregation over it (exact ``percentile`` and
    ``approx_percentile`` side by side), and both score sets are
    codegen comparisons in the same projection — no second
    per-customer shuffle, no self-join (running ``rfm_scores`` twice
    and joining measured ~2× this).

    Returns one row: (n_customers, r_ok, f_ok, m_ok) where the
    booleans assert every customer's approx tile is within ±1 of the
    exact tile per metric.
    """
    if n_tiles < 2:
        raise ValueError("n_tiles must be >= 2")
    qs = [i / n_tiles for i in range(1, n_tiles)]
    arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
    last_day = F.datediff(
        F.max(F.col(date_col)).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    per = df.groupBy(F.col(user_col).alias("usr")).agg(
        last_day.alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    row = per.agg(
        F.expr(f"percentile(last_day, {arr})").alias("rb"),
        F.expr(f"percentile(frequency, {arr})").alias("fb"),
        F.expr(f"percentile(monetary, {arr})").alias("mb"),
        F.expr(f"approx_percentile(last_day, {arr}, {accuracy})").alias("rb2"),
        F.expr(f"approx_percentile(frequency, {arr}, {accuracy})").alias("fb2"),
        F.expr(f"approx_percentile(monetary, {arr}, {accuracy})").alias("mb2"),
    ).collect()[0]

    def score(col: str, bounds) -> F.Column:
        e = F.lit(1)
        for b in bounds or []:
            e = e + F.when(F.col(col) > F.lit(float(b)), 1).otherwise(0)
        return e

    def ok(col: str, exact_b, approx_b, name: str) -> F.Column:
        return (
            F.max(F.abs(score(col, exact_b) - score(col, approx_b))) <= F.lit(1)
        ).alias(name)

    return per.agg(
        F.count(F.lit(1)).alias("n_customers"),
        ok("last_day", row["rb"], row["rb2"], "r_ok"),
        ok("frequency", row["fb"], row["fb2"], "f_ok"),
        ok("monetary", row["mb"], row["mb2"], "m_ok"),
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent 3-itemsets by relational Apriori: one level-wise
    candidate generation over the frequent PAIRS, never an unpruned
    3-way self-join.

    1. frequent pairs (a < b, count >= min_support) — basket_pairs'
       per-basket equi-join;
    2. candidate triples: the per-basket FREQUENT-pair stream
       self-joined on (basket, a) — pairs (a, b) and (a, c) with
       b < c in the same basket yield candidate (a, b, c), so the
       (a, b)-frequent and (a, c)-frequent prunes hold BY
       CONSTRUCTION; the remaining (b, c) downward-closure prune is
       one broadcast-able semi-join against the (small) frequent-pair
       set BEFORE counting;
    3. hash-count the surviving (a, b, c) and filter by support.

    The quadratic/cubic terms stay per-basket (co-partitioned on the
    basket key); cross-basket work only ever touches the pruned
    candidate stream.  Support thresholds make the frequent-pair set
    summary-sized in practice — the classic reason Apriori scales.

    Returns (item_a, item_b, item_c, triple_count), a < b < c.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    # Build the per-basket pair stream ONCE and share the subtree:
    # both the frequent-pair aggregate and the per-basket semi-join
    # then shuffle the IDENTICAL child on (a, b), so ReuseExchange
    # serves the second consumer from the first shuffle's files — the
    # corpus-scale per-basket self-join (the quadratic term) runs
    # once.  (Measured at sf0.1: two separately-built subtrees 2.3 s,
    # shared subtree 1.7 s; an explicit MEMORY_AND_DISK persist is
    # SLOWER than both at 3.2 s — caching the quadratic stream costs
    # more than its exchange reuse saves.)
    all_pairs = (
        items.alias("x")
        .join(items.alias("y"), "basket")
        .filter(F.col("x.item") < F.col("y.item"))
        .select("basket", F.col("x.item").alias("a"), F.col("y.item").alias("b"))
    )
    pairs = (
        all_pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pc"))
        .filter(F.col("pc") >= min_support)
        .select("a", "b")
    )
    # per-basket occurrences of each frequent pair
    pair_in_basket = all_pairs.join(pairs, ["a", "b"], "left_semi")
    cand = (
        pair_in_basket.alias("p")
        .join(pair_in_basket.alias("q"), ["basket", "a"])
        .filter(F.col("p.b") < F.col("q.b"))
        .select("a", F.col("p.b").alias("b"), F.col("q.b").alias("c"))
        # remaining Apriori prune: (b, c) must also be frequent —
        # (a, b) and (a, c) are frequent by construction
        .join(
            pairs.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    return (
        cand.groupBy(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("triple_count"))
        .filter(F.col("triple_count") >= min_support)
    )


def item_neighbors(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_pair_count: int = 2,
) -> DataFrame:
    """Item-item collaborative filtering ("customers who bought X also
    bought Y"): per item, the top-k co-occurring items ranked by
    cosine over basket-membership vectors —

        score(a, b) = pair_count / sqrt(n_a * n_b)

    (binary-vector cosine; a single correctly-rounded sqrt + divide on
    integer-derived values, so scores are bit-exact and partition-
    invariant).  Built on ``basket_pairs``'s per-basket equi-join; the
    unordered pairs are mirrored so every item gets a neighbor list,
    then one window ranks per item with a deterministic (score DESC,
    neighbor ASC) tiebreak.  The window partitions on the item key —
    fine-grained, no global sort.
    """
    base = basket_pairs(
        df, basket_col, item_col, min_pair_count=min_pair_count, with_counts=True
    ).select("item_a", "item_b", "pair_count", "n_a", "n_b")
    # mirror the unordered pairs so every item gets a neighbor list —
    # as a row-level EXPLODE, not a union of two branches: a union
    # duplicates the whole basket_pairs subplan (Catalyst does not
    # share it), re-running the corpus-scale per-basket join twice
    # (A/B at sf0.1, warm: union ~1.6 s, explode ~1.3 s)
    sym = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("item"), F.col("item_b").alias("neighbor")
                ),
                F.struct(
                    F.col("item_b").alias("item"), F.col("item_a").alias("neighbor")
                ),
            )
        ).alias("__p"),
        "pair_count",
        (F.col("n_a") * F.col("n_b")).alias("__nn"),
    ).select("__p.item", "__p.neighbor", "pair_count", "__nn")
    scored = sym.select(
        "item",
        "neighbor",
        "pair_count",
        (F.col("pair_count") / F.sqrt(F.col("__nn").cast("double"))).alias("score"),
    )
    w = Window.partitionBy("item").orderBy(F.desc("score"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ab_conversion(
    df: DataFrame,
    user_col: str,
    variant_col: str,
    event_col: str,
    exposure_event: str,
    conversion_event: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion A/B conversion test: per variant (values 0/1 in
    ``variant_col``), distinct users exposed (saw ``exposure_event``)
    and of those, distinct users who converted (``conversion_event``),
    plus the pooled two-proportion z-statistic and a significance flag
    at ``z_crit``.

    One distinct-user shuffle and one global single-row aggregation —
    the counts are exact integers, and every float in the z arithmetic
    (division, sqrt) is a correctly-rounded IEEE op on integer-derived
    values, so the statistic is bit-identical across engines and
    partitionings (no float SUMS anywhere).

    Degenerate arms are signalled, not NULL-surprised: ``valid_test``
    is false (and ``significant`` an explicit false, never NULL) when
    either arm has zero exposed users or the pooled rate is 0 or 1
    (se = 0 — the z statistic is undefined); rates/z stay NULL in
    that case, which is the honest answer.
    """
    exposed = (
        df.filter(F.col(event_col) == exposure_event)
        .select(F.col(variant_col).alias("variant"), F.col(user_col).alias("usr"))
        .distinct()
    )
    converted = (
        df.filter(F.col(event_col) == conversion_event)
        .select(F.col(user_col).alias("usr"))
        .distinct()
        .withColumn("__conv", F.lit(True))
    )
    flagged = exposed.join(converted, "usr", "left").select(
        "variant", F.coalesce("__conv", F.lit(False)).alias("__conv")
    )
    s = flagged.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when((F.col("variant") == 0) & F.col("__conv"), 1)).alias("c_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.count(F.when((F.col("variant") == 1) & F.col("__conv"), 1)).alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    z = (p_b - p_a) / se
    conv = F.col("c_a") + F.col("c_b")
    total = F.col("n_a") + F.col("n_b")
    valid = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (conv > 0)
        & (conv < total)
    )
    return s.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        p_a.alias("rate_a"),
        p_b.alias("rate_b"),
        z.alias("z_stat"),
        F.when(valid, F.abs(z) > F.lit(z_crit))
        .otherwise(F.lit(False))
        .alias("significant"),
        valid.alias("valid_test"),
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    scale: int = 1_000_000,
    with_counts: bool = False,
) -> DataFrame:
    """Market-basket co-occurrence: for each unordered item pair that
    appears together in >= min_pair_count baskets, the pair count and
    exact-integer support / lift in parts-per-``scale``:

        support_ppm = pair_count * scale          // n_baskets
        lift_ppm    = pair_count * n_baskets * scale // (n_a * n_b)

    (floor division — bit-exact and partition-invariant; lift > scale
    means the pair co-occurs more than independence predicts).

    int64 bound: the lift numerator is pair_count·n_baskets·scale and
    its denominator n_a·n_b — exact up to ~3·10⁹ baskets at the
    default scale (beyond that the products wrap silently under
    non-ANSI Spark; drop ``scale`` a decade per decade of baskets past
    that, the ``rarity_score`` convention).

    Shape: dedupe to (basket, item), self-equi-join on basket with
    item_a < item_b (co-partitioned — the quadratic term is per-basket
    size only, never cross-basket), hash-count pairs, then join the
    per-item basket counts back on the item keys.  The single-row
    basket total rides in via a broadcast cross join.  For degenerate
    giant baskets (a crawler retry storm, not a human cart) cap basket
    size upstream with ``sampling.domain_cap``-style per-key limits.

    ``with_counts=True`` additionally exposes the per-item basket
    counts (n_a, n_b) so downstream scores (e.g. ``item_neighbors``'s
    cosine) reuse this plan instead of re-deriving them.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    item_n = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    total = items.agg(F.countDistinct("basket").alias("n_baskets"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, "basket")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    cols = [
        F.col("item_a"),
        F.col("item_b"),
        F.col("pair_count"),
        F.expr(f"pair_count * CAST({scale} AS BIGINT) div n_baskets").alias(
            "support_ppm"
        ),
        F.expr(
            f"pair_count * n_baskets * CAST({scale} AS BIGINT) div (n_a * n_b)"
        ).alias("lift_ppm"),
    ]
    if with_counts:
        cols += [F.col("n_a"), F.col("n_b")]
    return (
        pairs.join(item_n.withColumnRenamed("item", "item_a").withColumnRenamed("n_item", "n_a"), "item_a")
        .join(item_n.withColumnRenamed("item", "item_b").withColumnRenamed("n_item", "n_b"), "item_b")
        .crossJoin(F.broadcast(total))
        .select(*cols)
    )
