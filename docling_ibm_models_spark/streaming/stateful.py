"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.7 / build-brief "custom stateful
operators" item).

Per user_id, events are folded into sessions separated by >30-minute gaps.
State = (current session ordinal, last event time, running count). Closed
sessions are emitted as rows; the still-open session stays in the state
store and closes when a later micro-batch brings a gap-exceeding event
(long-running streams) — with a bounded AvailableNow drain it simply never
emits, which the test asserts explicitly. The
batch twin is the oracle-checked ``events_sessionize`` query
(plans/queries.py), and the test drives both paths on the same input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GAP_S = 1800

OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_no", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("session_start", StringType(), False),
    ]
)

STATE = StructType(
    [
        StructField("session_no", LongType(), False),
        StructField("last_ts", LongType(), False),
        StructField("start_ts", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _fmt(epoch_s: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(epoch_s, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        session_no, last_ts, start_ts, n = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_no": session_no,
                    "n_events": n,
                    "session_start": _fmt(start_ts),
                }
            ]
        )
        return

    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
    ts_all.sort()

    if state.exists:
        session_no, last_ts, start_ts, n = state.get
    else:
        session_no, last_ts, start_ts, n = 0, None, None, 0

    closed = []
    for t in ts_all:
        if last_ts is None:
            session_no, start_ts, n = 1, t, 1
        elif t - last_ts > GAP_S:
            closed.append(
                {
                    "user_id": user_id,
                    "session_no": session_no,
                    "n_events": n,
                    "session_start": _fmt(start_ts),
                }
            )
            session_no += 1
            start_ts, n = t, 1
        else:
            n += 1
        last_ts = t

    state.update((session_no, last_ts, start_ts, n))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """event stream → closed sessions (open ones close on the next
    gap-exceeding event; see module docstring)."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
