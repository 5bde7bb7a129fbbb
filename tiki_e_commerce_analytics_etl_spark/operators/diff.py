"""Table diff — migration/backfill validation: given two snapshots of
a keyed table, classify every key as added / removed / changed /
equal and roll the classification up to counts.  This is the check a
team runs when moving a pipeline between engines (exactly this repo's
situation) or validating an idempotent re-load: "same keys, same
values, show me what moved".

Scale shape: ONE full-outer sort-merge join on the key (both sides
data-sized — SMJ is the correct strategy, same as the MERGE upserts),
column comparisons via null-safe equality (``<=>``) so NULL↔NULL is
"equal" and NULL↔value is "changed", and the summary is a tiny hash
agg on the 4-value status.  No hashing of rows into engine-specific
digests — the comparison is column-wise and therefore portable to any
SQL oracle via IS NOT DISTINCT FROM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of ``right`` (new) vs ``left`` (old): returns
    (*keys, status) with status in added | removed | changed | equal.

    ``compare_cols`` defaults to the non-key columns present on BOTH
    sides — and in that default mode any SCHEMA drift (a column present
    on one side only) raises instead of silently shrinking the
    comparison: a migration that dropped or renamed a column would
    otherwise diff as a perfect 'equal' run, which is precisely the
    failure this tool exists to catch.  Pass ``compare_cols``
    explicitly to diff a deliberate column subset."""
    if compare_cols is None:
        l_only = [c for c in left.columns if c not in set(right.columns)]
        r_only = [c for c in right.columns if c not in set(left.columns)]
        if l_only or r_only:
            raise ValueError(
                f"table_diff: schema drift — left-only columns {l_only}, "
                f"right-only columns {r_only}; pass compare_cols explicitly "
                "to diff a column subset"
            )
        compare_cols = [c for c in left.columns if c not in keys]
        if not compare_cols:
            raise ValueError(
                "table_diff: no non-key columns to compare — every key "
                "would classify as 'equal'; pass compare_cols or add value "
                "columns"
            )

    l = left.select(
        *[F.col(k).alias(f"__lk_{k}") for k in keys],
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
        F.lit(1).alias("__l_present"),
    )
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
        F.lit(1).alias("__r_present"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__lk_{k}") == F.col(f"__rk_{k}")
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond, "full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))

    status = (
        F.when(F.col("__l_present").isNull(), F.lit("added"))
        .when(F.col("__r_present").isNull(), F.lit("removed"))
        .when(same, F.lit("equal"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__lk_{k}"), F.col(f"__rk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of a ``table_diff`` result."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
