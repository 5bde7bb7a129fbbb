"""Stream-stream event-time joins (§2.9 extension).

The reference's enrichment joins are all batch (stream-shaped inputs
land as daily files first); a continuously-ingesting deployment of the
same platform needs the streaming form: attribute one event stream to
another within an event-time window, with BOUNDED state.

Spark's stream-stream join keeps every row in state until the
watermark proves no future match can arrive; an unbounded join
condition therefore means unbounded state.  Both helpers here force
the two ingredients that bound it:

- a watermark on BOTH sides (late rows beyond it are dropped from
  state and, for outer joins, trigger the null-padded emission), and
- an event-time RANGE predicate in the join condition (right_ts within
  [left_ts, left_ts + max_delay]), which lets the engine evict a row
  as soon as the other side's watermark passes its match window.

State per key is therefore O(rows inside the watermark horizon) — the
same bound a 1000-executor deployment relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_stream", "attribute_events"]


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + max_delay]``.

    ``how='left_outer'`` emits unmatched left rows (null right columns)
    once the right watermark passes their match window — the
    "impression that never converted" record.

    Output columns: every left column, plus the right side's non-key
    columns suffixed ``_r`` when they would collide.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    # Disambiguate colliding right-side names (incl. the key and ts).
    renames = {c: f"{c}_r" for c in r.columns if c in set(l.columns)}
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_key = renames.get(key, key)
    r_ts = renames.get(right_ts, right_ts)
    cond = (
        (F.col(key) == F.col(r_key))
        & (F.col(r_ts) >= F.col(left_ts))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"interval {max_delay}"))
    )
    return l.join(r, cond, how)


def attribute_events(
    impressions: DataFrame,
    conversions: DataFrame,
    key: str = "event_key",
    imp_ts: str = "ts",
    conv_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    include_unconverted: bool = False,
) -> DataFrame:
    """Attribution view over :func:`interval_join_stream`: one row per
    (impression, conversion-in-window) with the conversion delay in
    seconds; ``include_unconverted=True`` switches to the left-outer
    form so never-converted impressions emit with null delay after the
    watermark closes their window."""
    how = "left_outer" if include_unconverted else "inner"
    joined = interval_join_stream(
        impressions, conversions, key, imp_ts, conv_ts, max_delay, watermark, how
    )
    r_ts = f"{conv_ts}_r" if conv_ts in impressions.columns else conv_ts
    return joined.withColumn(
        "delay_seconds",
        (F.unix_timestamp(F.col(r_ts)) - F.unix_timestamp(F.col(imp_ts))).cast("long"),
    )
