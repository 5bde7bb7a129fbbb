"""Grouped-map operators (``applyInPandas``): per-key pandas logic over
Arrow-batched groups — the third Python-integration shape next to
mapInPandas (multimodal) and applyInPandasWithState (streaming).

``resample_ffill_daily`` is the time-series gap repair a snapshot
pipeline needs: the crawler misses days, but the mart wants one row per
(product, day) with the last known value carried forward (the reference
keeps gaps; training pipelines usually can't).

Scale: one shuffle on the key; each group is a single product's
history (small, bounded by the date range), so group skew is bounded.
The pandas step is O(days) per key with vectorized reindex/ffill.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def resample_ffill_daily(
    df: DataFrame,
    key_col: str = "product_id",
    date_col: str = "snapshot_date",
    value_cols: tuple[str, ...] = ("current_price",),
) -> DataFrame:
    """One row per (key, day) from the key's min to max date; missing
    days take the most recent earlier value.  Adds ``is_observed``
    (False on filled rows).  Duplicate (key, day) rows collapse by MAX
    per value column (deterministic; the pandas variant's keep-last
    was partition-order-dependent) — feed deduped data if another
    policy is wanted.

    Pure-relational: per-key [min, max] span → ``sequence`` date grid
    explode → left join of observations → ``last(value,
    ignorenulls=True)`` over a per-key rows window.  Entirely
    JVM/codegen; the ``applyInPandas`` variant below
    (``resample_ffill_daily_pandas``, kept as the grouped-map API
    example and parity-tested) pays ~0.4 ms of Python per key —
    measured 7.3 s vs ~1 s at sf0.1's ~15k keys, and at 100 TB key
    counts the per-group interpreter cost only grows.  An observed
    NULL value is carried over by the fill exactly like a missing day
    (both variants; pandas ffill cannot tell them apart either).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    obs = df.groupBy(key_col, date_col).agg(
        *[F.max(F.col(c)).cast("double").alias(c) for c in value_cols]
    )
    span = obs.groupBy(key_col).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(date_col)
    )
    j = grid.join(
        obs.withColumn("__obs", F.lit(True)), [key_col, date_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.col(key_col).cast("long").alias(key_col),
        F.col(date_col),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.coalesce(F.col("__obs"), F.lit(False)).alias("is_observed"),
    )


def resample_ffill_daily_pandas(
    df: DataFrame,
    key_col: str = "product_id",
    date_col: str = "snapshot_date",
    value_cols: tuple[str, ...] = ("current_price",),
) -> DataFrame:
    """``applyInPandas`` grouped-map form of ``resample_ffill_daily``
    (kept as the per-key pandas API example; parity-tested against the
    relational default).  Duplicate (key, day) rows keep the last
    value after a stable date sort — feed deduped data for full
    determinism.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(date_col, T.DateType()),
            *[T.StructField(c, T.DoubleType()) for c in value_cols],
            T.StructField("is_observed", T.BooleanType()),
        ]
    )

    cols = [key_col, date_col, *value_cols]

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        s = (
            pdf[[date_col, *value_cols]]
            .assign(**{date_col: pd.to_datetime(pdf[date_col])})
            .sort_values(date_col, kind="stable")
            .drop_duplicates(subset=[date_col], keep="last")
            .set_index(date_col)
        )
        idx = pd.date_range(s.index.min(), s.index.max(), freq="D")
        out = s.reindex(idx).ffill()
        out.index.name = date_col
        out = out.reset_index()
        out[key_col] = key
        out["is_observed"] = out[date_col].isin(s.index)
        out[date_col] = out[date_col].dt.date
        return out[[key_col, date_col, *value_cols, "is_observed"]]

    return df.select(*cols).groupBy(key_col).applyInPandas(fill, out_schema)


def resample_interp_daily(
    df: DataFrame,
    key_col: str = "product_id",
    date_col: str = "snapshot_date",
    value_cols: tuple[str, ...] = ("current_price",),
) -> DataFrame:
    """One row per (key, day) from the key's min to max observed date;
    missing days take the LINEAR INTERPOLATION between the nearest
    earlier and later observations (the gap-repair a numeric series
    wants where ffill would step).  Boundary days are observed by
    construction of the span; a one-sided gap (all-NULL edge values)
    falls back to the nearest observation.  Adds ``is_observed``.

    Same scale shape as ``resample_ffill_daily``: per-key span →
    ``sequence`` grid explode → left join → two frames over ONE
    per-key exchange (last/unbounded-preceding and
    first/unbounded-following share the partitioning and sort).
    Entirely JVM/codegen; the interpolation arithmetic is written as
    ``prev + (next - prev) * (di / dn)`` and the DuckDB oracle mirrors
    that exact parenthesization, so doubles match bit-for-bit.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    obs = df.groupBy(key_col, date_col).agg(
        *[F.max(F.col(c)).cast("double").alias(c) for c in value_cols]
    )
    span = obs.groupBy(key_col).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(date_col)
    )
    j = grid.join(
        obs.withColumn("__obs", F.lit(True)), [key_col, date_col], "left"
    )
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    mid_cols = []
    for c in value_cols:
        obs_d = F.when(F.col(c).isNotNull(), F.col(date_col))
        mid_cols += [
            F.last(F.col(c), ignorenulls=True).over(w_prev).alias(f"__pv_{c}"),
            F.last(obs_d, ignorenulls=True).over(w_prev).alias(f"__pd_{c}"),
            F.first(F.col(c), ignorenulls=True).over(w_next).alias(f"__nv_{c}"),
            F.first(obs_d, ignorenulls=True).over(w_next).alias(f"__nd_{c}"),
        ]
    mid = j.select(
        F.col(key_col).cast("long").alias(key_col),
        F.col(date_col),
        *[F.col(c) for c in value_cols],
        F.coalesce(F.col("__obs"), F.lit(False)).alias("is_observed"),
        *mid_cols,
    )
    out_vals = []
    for c in value_cols:
        pv, pd_, nv, nd = (F.col(f"__{t}_{c}") for t in ("pv", "pd", "nv", "nd"))
        frac = F.datediff(F.col(date_col), pd_).cast("double") / F.datediff(
            nd, pd_
        ).cast("double")
        out_vals.append(
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(
                pv.isNotNull() & nv.isNotNull() & (nd != pd_),
                pv + (nv - pv) * frac,
            )
            .otherwise(F.coalesce(pv, nv))
            .alias(c)
        )
    return mid.select(key_col, date_col, *out_vals, "is_observed")


def time_weighted_avg_daily(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per (key, day) time-weighted average of an irregularly-sampled
    value — piecewise-constant (last-observation-carried-forward)
    between consecutive events; a day's final event carries no weight
    (its interval extends past the grouping boundary).  The TWAP a
    pricing feed wants where a plain AVG over-weights bursts.

    Engine-exact integer formulation: interval weights are whole epoch
    SECONDS (timestamp→long is the floor-epoch both engines share),
    values quantize to cents via the explicit floor(v*100+0.5) grid,
    and the average is emitted in milli-units by integer division —
    every checked column is integer math, no float-sum ordering
    anywhere.  Column expressions only: one window (lead) and one hash
    aggregate, both keyed on (key, day).

    Returns (user, day, total_secs, twap_milli): value≥0 rows only
    (integer div truncation ≡ floor needs non-negative numerators).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    day = F.to_date(F.col(ts_col)).alias("day")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreakers]
    w = Window.partitionBy(F.col(user_col), F.to_date(F.col(ts_col))).orderBy(*order)
    es = F.col(ts_col).cast("long")
    base = (
        df.filter(F.col(value_col) >= 0)
        .select(
            F.col(user_col),
            day,
            es.alias("__es"),
            F.lead(es).over(w).alias("__next_es"),
            F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long").alias("__cents"),
        )
        .filter(F.col("__next_es").isNotNull())
        .withColumn("__dt", F.col("__next_es") - F.col("__es"))
    )
    agg = base.groupBy(user_col, "day").agg(
        F.sum(F.col("__cents") * F.col("__dt")).alias("__num"),
        F.sum("__dt").alias("total_secs"),
    )
    return agg.filter(F.col("total_secs") > 0).select(
        user_col,
        "day",
        "total_secs",
        F.expr("(__num * 1000) div total_secs").alias("twap_milli"),
    )
