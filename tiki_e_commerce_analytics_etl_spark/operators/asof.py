"""Backward as-of join — an operator Spark's join menu lacks,
expressed as a composition of built-ins (union + window), per the
custom-operator policy (SURVEY.md §2.10).

Semantics: for each left row, attach the right row with the greatest
``right_time`` ≤ ``left_time`` within the same ``by`` key (DuckDB/kdb
ASOF JOIN, pandas merge_asof direction='backward').  The natural fit
here is FX enrichment: a late shipment on a day with no fx row takes
the most recent published rate instead of a hard-coded fallback.

Plan shapes:

* **Keyed** (``by`` non-empty): tag and union both inputs on
  (key, time), ONE window pass ordered by (time, side) carrying the
  last seen right values forward, then keep left rows.  Cost is a
  single shuffle+sort on the by-key — same as a sort-merge join —
  versus the naive theta-join (left.time >= right.time) which explodes
  to O(|L|·|R|) pairs per key before aggregation.

* **Keyless** (``by`` empty): the keyed plan would degrade to a
  single-partition sort of the entire left table.  Instead the time
  axis is bucketed into coarse bins and the same union+window runs
  partitioned BY BIN — fully parallel.  Cross-bin carry (a left row
  whose latest right row lives in an earlier bin, possibly across a
  gap of empty bins) is restored by a per-bin running "last non-null
  right value so far", carried PER VALUE COLUMN (matching the keyed
  window's per-column ignorenulls semantics) and computed over the
  *bin summary* (one row per bin — bounded
  by time range / bin width, never by data size) and injected into
  each bin as one synthetic right row that sorts first.  The only
  unpartitioned window in the plan therefore consumes the per-bin
  aggregate, not the data.

Right rows tie-break BEFORE left rows at equal times (≤ semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _time_to_long(col, dtype) -> "F.Column":
    """Monotone integer image of a time-like column (bin arithmetic)."""
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date"))
    if isinstance(dtype, T.TimestampType):
        return col.cast("long")
    return F.floor(col).cast("long")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    by: list[str] | None = None,
    bin_width: int = 32,
) -> DataFrame:
    """Left as-of join: left columns plus ``value_cols`` from the
    latest right row at-or-before the left row's time (nulls when no
    earlier right row exists).

    ``bin_width`` (keyless path only): bin size in the time column's
    integer units — days for dates, seconds for timestamps.  It only
    trades parallelism against bin-summary size; results are identical
    for any value.
    """
    by = by or []
    lt = F.col(left_time)

    l_tagged = left.select(
        *by,
        lt.alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal times
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )

    if by:
        unioned = l_tagged.unionByName(r_tagged)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        unioned, w = _binned_union(
            l_tagged, r_tagged, left.schema[left_time].dataType, value_cols, bin_width
        )

    carried = unioned.select(
        "__side",
        "__lrow",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__cv_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__cv_{c}").alias(c) for c in value_cols],
    )


def _binned_union(
    l_tagged: DataFrame,
    r_tagged: DataFrame,
    time_dtype,
    value_cols: list[str],
    bin_width: int,
):
    """Keyless-path plumbing: (unioned-with-carry-rows, bin window)."""
    binexpr = F.floor(_time_to_long(F.col("__t"), time_dtype) / bin_width)
    l2 = l_tagged.withColumn("__bin", binexpr)
    r2 = r_tagged.withColumn("__bin", binexpr)

    # Per-bin, PER-COLUMN last non-null right value — mirrors the keyed
    # path, where F.last(ignorenulls) carries each value column
    # independently (a latest right row with a NULL in one column must
    # not mask an older non-null value for that column).  The max_by
    # ordering key ignores rows where the column is null (null ordering
    # keys are skipped by max_by) and sorts null-time rows FIRST
    # (matching the window's asc_nulls_first), via the (isNotNull, t)
    # struct.
    ordk = F.struct(F.col("__t").isNotNull().alias("nn"), F.col("__t").alias("t"))
    rb = r2.groupBy("__bin").agg(
        *[
            F.max_by(
                F.col(f"__v_{c}"), F.when(F.col(f"__v_{c}").isNotNull(), ordk)
            ).alias(f"__last_{c}")
            for c in value_cols
        ]
    )

    # Every bin either side touches, with the running last-right-values
    # of all STRICTLY EARLIER bins.  This is the only unpartitioned
    # window in the plan and it consumes one row per bin (bounded by
    # time-range / bin_width), not the data.
    all_bins = l2.select("__bin").distinct().unionByName(rb.select("__bin")).distinct()
    wbins = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    carry_cols = [
        F.last(F.col(f"__last_{c}"), ignorenulls=True).over(wbins).alias(f"__carry_{c}")
        for c in value_cols
    ]
    any_nonnull = F.lit(False)
    for c in value_cols:
        any_nonnull = any_nonnull | F.col(f"__carry_{c}").isNotNull()
    carry = all_bins.join(rb, "__bin", "left").select("__bin", *carry_cols).filter(any_nonnull)

    # One synthetic right row per bin, sorting before every real row
    # (__t null → nulls-first, side -1 breaks the tie with real rows
    # that might also carry null times).
    lrow_type = l_tagged.schema["__lrow"].dataType.simpleString()
    t_type = l_tagged.schema["__t"].dataType.simpleString()
    seeds = carry.select(
        F.lit(None).cast(t_type).alias("__t"),
        F.lit(-1).alias("__side"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        *[F.col(f"__carry_{c}").alias(f"__v_{c}") for c in value_cols],
        "__bin",
    )

    unioned = l2.unionByName(r2).unionByName(seeds)
    w = (
        Window.partitionBy("__bin")
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return unioned, w
