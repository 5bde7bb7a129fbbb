"""Hypertable-style continuous-aggregate rollup: one pass producing
pre-aggregated rows at several time granularities (the
TimescaleDB/Druid rollup shape; Spark has date_trunc but no
multi-granularity operator).

Formulation: explode each row into one (granularity, bucket) pair per
requested granularity, then a single hash aggregate on
(granularity, bucket, *keys).  One shuffle for all granularities —
versus running G separate aggregations (G scans, G shuffles).  Rows
inflate ×G before the map-side partial combine collapses them, so the
exchange still carries only group cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUPPORTED = ("hour", "day", "month", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: list[Column],
    granularities: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Aggregate ``aggs`` per (granularity, bucket, *keys) for every
    granularity in one job.  Buckets are date_trunc timestamps."""
    for g in granularities:
        if g not in SUPPORTED:
            raise ValueError(f"unsupported granularity {g!r}")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("gran"),
                    F.date_trunc(g, F.col(ts_col)).alias("bucket"),
                )
                for g in granularities
            ]
        )
    ).alias("gb")
    exploded = df.select(pairs, *keys, *[c for c in df.columns if c not in keys]).select(
        F.col("gb.gran").alias("gran"), F.col("gb.bucket").alias("bucket"), "*"
    ).drop("gb")
    return exploded.groupBy("gran", "bucket", *keys).agg(*aggs)
