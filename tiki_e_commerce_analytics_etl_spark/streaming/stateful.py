"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 — the streaming twin of
operators/sessions.py).

Per user key, state holds (current session start, last event ts,
event count).  An incoming micro-batch extends the open session or
closes it and emits the finished row; timed-out state (watermark-based
ProcessingTime/EventTime timeout) flushes the final open session, so
every session is emitted exactly once.

Scale: state is O(active users), not O(events) — each key stores three
scalars.  The state store shuffles on user_id once; skew is bounded
because per-key state size is constant.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def make_session_fn(gap_seconds: int = 1800, timeout_ms: int = 60_000):
    """Build the (key, batches, state) → rows function for
    ``applyInPandasWithState``.  Exposed separately so unit tests can
    drive it with a fake GroupState."""

    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((user_id, start_us, last_us, n, "timeout"))
                state.remove()
            yield _emit(closed)
            return

        ts_list: list[int] = []
        for pdf in batches:
            ts_list.extend(_us(t) for t in pdf["ts"])
        ts_list.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        for t in ts_list:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, "gap"))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1

        if start_us is not None:
            state.update((start_us, last_us, n))
            state.setTimeoutDuration(timeout_ms)
        yield _emit(closed)

    return fn


def _emit(rows: list[tuple]) -> pd.DataFrame:
    if not rows:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "session_start": pd.Series(dtype="datetime64[us]"),
             "session_end": pd.Series(dtype="datetime64[us]"),
             "n_events": pd.Series(dtype="int64"),
             "closed_by": pd.Series(dtype="object")}
        )
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
            "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
            "n_events": [r[3] for r in rows],
            "closed_by": [r[4] for r in rows],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events (user_id, ts, …) stream → closed-session rows."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds, timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
