"""Range (interval) join — point-in-interval matching, another join
shape Spark lacks a native strategy for (Catalyst plans the raw
``t BETWEEN s AND e`` predicate as a broadcast-nested-loop or
cartesian filter).

Scalable formulation: bin the time axis; each interval registers in
every bin it covers (explode), each point maps to exactly one bin, and
the match becomes an equi-join on the bin plus the exact BETWEEN
residual.  Work scales with points + interval-bin registrations +
true matches, not |L|·|R|.  Pick ``bin_days`` near the typical
interval length: wider bins → fewer registrations but more residual
filtering; narrower → the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _day_bin(col: F.Column, bin_days: int) -> F.Column:
    return F.floor(F.datediff(col, F.lit(_EPOCH).cast("date")) / bin_days).cast("long")


def _require_disjoint_columns(left: DataFrame, right: DataFrame, op: str) -> None:
    """Both join formulations keep every column from both sides, so a
    shared name would make the residual predicates ambiguous — fail at
    plan time with the offending names rather than at analysis."""
    shared = sorted(set(left.columns) & set(right.columns))
    if shared:
        raise ValueError(
            f"{op}: column name(s) {shared} appear on both sides; "
            "rename/prefix one side before joining"
        )


def _span_bins(start: F.Column, end: F.Column, bin_days: int) -> F.Column:
    """Bin sequence an interval registers in.  An inverted interval
    (start > end) would silently yield a DESCENDING bin sequence (and
    wrong matches) — assert instead.  Null-bounded intervals keep the
    established semantics: sequence(null, ·) is null and explode drops
    the row."""
    ok = start.isNull() | end.isNull() | (start <= end)
    chk = F.assert_true(ok, F.lit("inverted interval: start > end"))
    return F.when(chk.isNull(), F.sequence(_day_bin(start, bin_days), _day_bin(end, bin_days)))


def interval_overlap_join(
    left: DataFrame,
    l_start: str,
    l_end: str,
    right: DataFrame,
    r_start: str,
    r_end: str,
    bin_days: int = 30,
) -> DataFrame:
    """Inner join of overlapping interval pairs (closed bounds:
    ``l_start <= r_end AND r_start <= l_end``) — the interval×interval
    sibling of ``range_join_points``.

    Both sides register in every bin they span; the match is an
    equi-join on the bin plus the exact overlap residual.  A pair
    spanning several shared bins would match in each — instead of a
    costly DISTINCT over the (wide) output, each pair is EMITTED
    EXACTLY ONCE, from the bin containing the overlap's start
    (``greatest(l_start, r_start)``): that bin is shared by
    construction, so no duplicates and no dedup shuffle.  Work scales
    with bin registrations + true matches, not |L|·|R|.
    """
    _require_disjoint_columns(left, right, "interval_overlap_join")
    lb = left.withColumn(
        "__bin", F.explode(_span_bins(F.col(l_start), F.col(l_end), bin_days))
    )
    rb = right.withColumn(
        "__bin", F.explode(_span_bins(F.col(r_start), F.col(r_end), bin_days))
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    emit_here = (
        _day_bin(F.greatest(F.col(l_start), F.col(r_start)), bin_days) == F.col("__bin")
    )
    return lb.join(rb, "__bin").filter(overlap & emit_here).drop("__bin")


def range_join_points(
    left: DataFrame,
    point_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bin_days: int = 30,
) -> DataFrame:
    """Inner join of left points to right intervals containing them
    (inclusive bounds).  Returns all left columns + all right columns."""
    _require_disjoint_columns(left, right, "range_join_points")
    lb = left.withColumn("__bin", _day_bin(F.col(point_col), bin_days))
    rb = right.withColumn(
        "__bin", F.explode(_span_bins(F.col(start_col), F.col(end_col), bin_days))
    )
    return (
        lb.join(rb, "__bin")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )
