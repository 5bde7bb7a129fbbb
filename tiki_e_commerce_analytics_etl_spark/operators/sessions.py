"""Gap-based sessionization — the batch formulation of the stateful
session-window operator (Structured Streaming's session_window /
applyInPandasWithState analogue, SURVEY.md §2.9).

A new session starts when the gap to the previous event of the same
user exceeds ``gap``.  Classic two-window construction:

    new_session = (ts - lag(ts) > gap)            -- one sort per user
    session_seq = sum(new_session) over (... rows unbounded preceding)

Both windows share the same (partition, order), so Catalyst evaluates
them in ONE Window physical node — a single shuffle + sort on the user
key, no second exchange.  At 100 TB the shuffle is unavoidable (session
identity is a per-user global property); skewed power-users are handled
by AQE.  The streaming engine gets the same semantics incrementally via
``F.session_window`` (streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Append ``session_seq`` (1-based per-user session number)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_tiebreakers or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col).cast("long") - prev_ts.cast("long")
    new_session = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_seq, start, end, n_events).

    The groupBy shuffles on (user, session_seq) — same key prefix as
    the sessionize window, so with matching partitioning the exchange
    is local (Spark reuses the hash partitioning when numbers align).
    """
    s = sessionize(df, user_col, ts_col, gap_seconds, order_tiebreakers)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
