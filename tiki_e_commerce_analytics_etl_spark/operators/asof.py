"""Backward as-of join — an operator Spark's join menu lacks,
expressed as a composition of built-ins (union + window), per the
custom-operator policy (SURVEY.md §2.10).

Semantics: for each left row, attach the right row with the greatest
``right_time`` ≤ ``left_time`` within the same ``by`` key (DuckDB/kdb
ASOF JOIN, pandas merge_asof direction='backward').  The natural fit
here is FX enrichment: a late shipment on a day with no fx row takes
the most recent published rate instead of a hard-coded fallback.

Plan shape (the scalable formulation): tag and union both inputs on
(key, time), ONE window pass ordered by (time, side) carrying the last
seen right values forward, then keep left rows.  Cost is a single
shuffle+sort on the by-key — same as a sort-merge join — versus the
naive theta-join (left.time >= right.time) which explodes to
O(|L|·|R|) pairs per key before aggregation.  Right rows tie-break
BEFORE left rows at equal times (≤ semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: left columns plus ``value_cols`` from the
    latest right row at-or-before the left row's time (nulls when no
    earlier right row exists)."""
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

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*(by or [F.lit(1)]))
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
