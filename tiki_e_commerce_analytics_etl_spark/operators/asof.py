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


def _time_image(col, dtype) -> "F.Column":
    """EXACT monotone integer/numeric image of a time-like column —
    days for dates, microseconds for timestamps, the raw value for
    numerics (no floor: unlike ``_time_to_long``, which only feeds
    bin ASSIGNMENT, this image is used for ordering and distances, so
    it must not collapse sub-unit differences)."""
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date"))
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    return col


def _image_dtype(dtype) -> "T.DataType":
    """Spark type of ``_time_image``'s output for a given input type."""
    if isinstance(dtype, T.DateType):
        return T.IntegerType()
    if isinstance(dtype, T.TimestampType):
        return T.LongType()
    return dtype


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _common_image_type(a: "T.DataType", b: "T.DataType") -> "T.DataType":
    """Lossless-as-possible common type for the two sides' time images:
    equal types pass through (fractional numerics keep full native
    precision — casting them to long would truncate and pick the wrong
    nearest row), mixed integrals widen to long, anything else falls
    back to double (the caller mixed units anyway, e.g. date vs
    timestamp — distances across such a mix are the caller's bug)."""
    if a == b:
        return a
    if isinstance(a, _INTEGRAL) and isinstance(b, _INTEGRAL):
        return T.LongType()
    return T.DoubleType()


def _tagged_frames(left, right, left_time, right_time, value_cols, by, timefn):
    """Shared tag-and-union inputs: left rows carry their full row
    struct, right rows carry the value columns; ``timefn(col, dtype)``
    renders the ordering axis."""
    l_tagged = left.select(
        *by,
        timefn(F.col(left_time), left.schema[left_time].dataType).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal times
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *by,
        timefn(F.col(right_time), right.schema[right_time].dataType).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    return l_tagged, r_tagged


def _carry_and_project(
    left, l_tagged, r_tagged, by, bin_dtype, value_cols, bin_width
) -> DataFrame:
    """Shared carry pass: one keyed (or binned keyless) window carrying
    the last-seen right values onto left rows."""
    if by:
        unioned = l_tagged.unionByName(r_tagged)
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        unioned, w = _binned_union(
            l_tagged, r_tagged, bin_dtype, value_cols, bin_width
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
    l_tagged, r_tagged = _tagged_frames(
        left, right, left_time, right_time, value_cols, by, lambda c, _dt: c
    )
    return _carry_and_project(
        left,
        l_tagged,
        r_tagged,
        by,
        left.schema[left_time].dataType,
        value_cols,
        bin_width,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    by: list[str] | None = None,
    bin_width: int = 32,
) -> DataFrame:
    """Left as-of join, forward direction: ``value_cols`` from the
    EARLIEST right row at-or-after the left row's time (pandas
    merge_asof direction='forward', nulls when no later right row).

    Implemented as the backward join on the NEGATED exact time image
    (days / microseconds / raw numeric) — the entire carry machinery,
    including the keyless binned path and its cross-bin seeds, is
    reused verbatim: "latest ≤" on the negated axis IS "earliest ≥"
    on the real one, and the right-before-left tie-break keeps the
    at-or-after inclusive semantics.

    ``bin_width`` (keyless path only) is denominated like backward's:
    days for dates, SECONDS for timestamps, raw units for numerics.
    The negated image is microseconds for timestamps, so the effective
    bin on that axis is scaled by 1e6 — without the scaling, a
    seconds-intended width of 32 would put roughly every distinct
    timestamp in its own bin and collapse the binned path's
    parallelism (results stay correct either way; binning only picks
    the partition grain).
    """
    by = by or []
    l_tagged, r_tagged = _tagged_frames(
        left,
        right,
        left_time,
        right_time,
        value_cols,
        by,
        lambda c, dt: -_time_image(c, dt),
    )
    if isinstance(left.schema[left_time].dataType, T.TimestampType):
        bin_width = bin_width * 1_000_000  # seconds -> micros image units
    # post-negation the axis is numeric; _binned_union's bin math uses
    # the numeric branch of _time_to_long
    return _carry_and_project(
        left, l_tagged, r_tagged, by, T.LongType(), value_cols, bin_width
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    by: list[str],
    tolerance: int | float | None = None,
) -> DataFrame:
    """Keyed as-of join, nearest direction: ``value_cols`` from the
    right ROW minimizing |right_time − left_time| within the key
    (ties → the earlier/backward row, matching pandas merge_asof).
    ``tolerance`` (optional) drops matches farther than the given
    distance in exact image units — days for dates, MICROSECONDS for
    timestamps, raw NATIVE units for numerics (fractional numeric time
    axes keep full precision: the image is the column itself, never
    truncated to long, so nearest picks and tolerance cuts are exact —
    see ``_common_image_type`` for the mixed-type widening rule).

    Unlike backward/forward (whose per-column ignorenulls carry treats
    each value column independently), nearest is ROW-semantic: the
    chosen right row supplies every value column, NULLs included —
    "which observation is closest" is a property of the row, not of
    one column.

    One shuffle total: both direction frames (last/unbounded-preceding
    and first/unbounded-following) sit over the SAME (key, time, side)
    sort.  Keyless nearest is deliberately not offered — it would need
    two binned carry passes stitched through a join; bucket a coarse
    time bin into ``by`` yourself, or use backward/forward.
    """
    if not by:
        raise ValueError(
            "asof_join_nearest requires a non-empty `by`; for keyless "
            "data use asof_join_backward/forward or add a coarse time "
            "bin to `by`"
        )
    lt_img = _time_image(F.col(left_time), left.schema[left_time].dataType)
    rt_img = _time_image(F.col(right_time), right.schema[right_time].dataType)
    t_type = _common_image_type(
        _image_dtype(left.schema[left_time].dataType),
        _image_dtype(right.schema[right_time].dataType),
    )

    vt = T.StructType(
        [T.StructField("t", t_type)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        *by,
        lt_img.cast(t_type).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(vt).alias("__vrow"),
    )
    r_tagged = right.select(
        *by,
        rt_img.cast(t_type).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields
            )
            + ">"
        )
        .alias("__lrow"),
        F.struct(
            rt_img.cast(t_type).alias("t"), *[F.col(c) for c in value_cols]
        ).alias("__vrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col("__t").asc(), F.col("__side").asc()]
    w_b = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "__side",
        "__t",
        "__lrow",
        F.last("__vrow", ignorenulls=True).over(w_b).alias("__b"),
        F.first("__vrow", ignorenulls=True).over(w_f).alias("__f"),
    ).filter(F.col("__side") == 1)

    bd = F.col("__t") - F.col("__b.t")
    fd = F.col("__f.t") - F.col("__t")
    b_ok = F.col("__b").isNotNull() & (
        F.lit(True) if tolerance is None else bd <= F.lit(tolerance)
    )
    f_ok = F.col("__f").isNotNull() & (
        F.lit(True) if tolerance is None else fd <= F.lit(tolerance)
    )
    pick_b = b_ok & (~f_ok | (bd <= fd))
    chosen = F.when(pick_b, F.col("__b")).when(f_ok, F.col("__f"))
    return carried.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[chosen[c].alias(c) for c in value_cols],
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
