"""Stateful streaming sessionization — applyInPandasWithState.

The batch twin lives in plans/driver_queries.events_sessionization
(gap-based sessions via lag + running sum, oracle-checked against
DuckDB).  This is the STREAMING form the north_star asks for
("applyInPandasWithState for custom stateful operators"): per-user
session state survives across micro-batches, sessions close either
when a gap appears inside a batch or when the event-time watermark
passes last_ts + gap (EventTimeTimeout).

Semantics (same as the batch twin): events of one user belong to one
session while consecutive gaps are < ``gap``; a closed session emits
(user_id, session_start, session_end, n_events, total_value).

State per user: (session_start_ms, last_ts_ms, n_events, total_value)
— four scalars, so state size is O(active users), not O(events); the
state store shuffles on user_id exactly like a batch groupBy.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def _row(user, start_ms, last_ms, n, total) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(last_ms, unit="ms")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream (user_id, ts, value) → closed-session stream.

    Append-mode output: a session row is emitted when its closing gap is
    OBSERVED (a later in-gap event arrives) or when the watermark times
    the state out — the standard stateful-streaming trade-off between
    latency and late-data tolerance."""
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    def fn(
        key: Tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n, total = state.get
            state.remove()
            yield _row(user, start_ms, last_ms, n, total)
            return
        if state.exists:
            start_ms, last_ms, n, total = state.get
        else:
            start_ms = None
            last_ms = n = 0
            total = 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = _ms(ts)
                if start_ms is None:
                    start_ms, last_ms, n, total = t, t, 1, float(val)
                elif t - last_ms >= gap_ms:
                    out.append((start_ms, last_ms, n, total))
                    start_ms, last_ms, n, total = t, t, 1, float(val)
                else:
                    last_ms = max(last_ms, t)
                    n += 1
                    total += float(val)
        if start_ms is not None:
            state.update((start_ms, last_ms, int(n), float(total)))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        for start, last, cnt, tot in out:
            yield _row(user, start, last, cnt, tot)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
