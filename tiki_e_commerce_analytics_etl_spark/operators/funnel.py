"""Ordered funnel analysis over an event stream.

The classic product-analytics question the reference's mart feeds
("how many users viewed → clicked → purchased, in that order?"),
expressed as the chained conditional-aggregation formulation every
SQL warehouse uses — which makes it both ORACLE-portable and the
right distributed shape:

step 0:  per-user MIN(ts) of the first event type            (one agg)
step i:  per-user MIN(ts) of event type i occurring AFTER the
         user's step-(i-1) completion time                    (join + agg)

Every aggregation and join is keyed on the user column, so AQE reuses
the same hash partitioning down the chain; per-step state is one row
per surviving user (monotonically shrinking).  No per-user event
arrays are collected — a power user with millions of events costs
map-side partial MIN, not memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_times", "funnel_counts"]


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> list[DataFrame]:
    """Per-step DataFrames of (user, t_i): the user's FIRST completion
    time of step i given steps 0..i-1 were completed in order (strictly
    increasing timestamps).  Without a window, greedy-earliest anchoring
    is provably equivalent to "does ANY in-order chain exist" (an
    earlier anchor only widens later steps' candidate sets).

    ``within_seconds`` bounds each step's delay after the previous
    step's ANCHORED time — the first-touch conversion-window semantics
    (product-analytics funnels measure from the user's first qualifying
    touch).  Note this is NOT any-chain existence: a user whose first
    'view' is stale but who views again later and converts in-window
    counts as NOT converted, by design — re-engagement shows up by
    running the funnel on a sliding analysis period instead."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        df.filter(F.col(event_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    outs = [cur]
    for i, step in enumerate(steps[1:], 1):
        prev_t = F.col(f"t{i - 1}")
        cond = F.col(ts_col) > prev_t
        if within_seconds is not None:
            cond = cond & (
                F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_t)
                <= F.lit(within_seconds)
            )
        cur = (
            df.filter(F.col(event_col) == step)
            .join(cur.select(user_col, prev_t), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        outs.append(cur)
    return outs

def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per funnel step: (step_index, step, users) where
    ``users`` counts users who completed steps 0..i in order (first-
    touch anchored when ``within_seconds`` is set — see
    :func:`funnel_times`)."""
    stages = funnel_times(df, steps, user_col, event_col, ts_col, within_seconds)
    out = None
    for i, (step, stage) in enumerate(zip(steps, stages)):
        row = stage.agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("users"),
        )
        out = row if out is None else out.unionByName(row)
    return out
