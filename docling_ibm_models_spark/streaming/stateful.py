"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.7 / build-brief "custom stateful
operators" item).

Per user_id, events are folded into sessions separated by >30-minute gaps.
State = (current session ordinal, last event time, running count), all event
times at MICROSECOND precision, matching the batch twin
(``events_sessionize`` in plans/queries.py) and the DuckDB oracle's
``epoch_us`` semantics exactly.

Closed sessions are emitted as rows. Open sessions flush through a real
**event-time timeout**: the stream carries a watermark, each group arms
``setTimeoutTimestamp(last_ts + gap)``, and once the watermark passes that
point Spark fires ``hasTimedOut`` and the session emits. This is the correct
streaming semantics — a session within 30 minutes of the stream frontier is
genuinely still open. Under a bounded AvailableNow drain the frontier stops
at the max event time, so the tail sessions flush only if the drain ends
with a watermark-advancing fence (the test appends one); a long-running
stream flushes them naturally as the watermark advances.

(Round-1 note: ProcessingTimeTimeout hung under availableNow in this
environment; EventTimeTimeout does not.)
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
)

GAP_US = 1800 * 1_000_000  # 30 min in microseconds (batch twin: gap > 1800s)

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
        StructField("last_ts", LongType(), False),  # µs epoch
        StructField("start_ts", LongType(), False),  # µs epoch
        StructField("n_events", LongType(), False),
    ]
)


def _fmt(epoch_us: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(
        epoch_us // 1_000_000, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")


def _row(user_id, session_no, n, start_us):
    return {
        "user_id": user_id,
        "session_no": session_no,
        "n_events": n,
        "session_start": _fmt(start_us),
    }


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        # Watermark passed last_ts + GAP: the open session is now closed by
        # time, not by a successor event. Emit and clear.
        session_no, last_ts, start_ts, n = state.get
        state.remove()
        yield pd.DataFrame([_row(user_id, session_no, n, start_ts)])
        return

    ts_all = []
    for pdf in pdfs:
        # pandas Timestamp .value is ns since epoch -> µs (exact; events.ts
        # is timestamp[us]); int(t.timestamp()) would truncate fractional
        # seconds and diverge from the batch twin on gaps in (1800, 1801)s.
        ts_all.extend(int(t.value) // 1000 for t in pdf["ts"])
    ts_all.sort()

    if state.exists:
        session_no, last_ts, start_ts, n = state.get
    else:
        session_no, last_ts, start_ts, n = 0, None, None, 0

    closed = []
    for t in ts_all:
        if last_ts is None:
            session_no, start_ts, n = 1, t, 1
        elif t - last_ts > GAP_US:
            closed.append(_row(user_id, session_no, n, start_ts))
            session_no += 1
            start_ts, n = t, 1
        else:
            n += 1
        last_ts = t

    state.update((session_no, last_ts, start_ts, n))
    # Arm the event-time timeout: fire when the watermark passes the gap
    # horizon of the open session. Timestamps here are in MILLISECONDS (the
    # GroupState API unit); +1 ms so "watermark == horizon" doesn't fire
    # (batch closes only on strictly-greater gaps). Must stay above the
    # current watermark or Spark rejects it.
    horizon_ms = (last_ts + GAP_US) // 1000 + 1
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(
    events_stream: DataFrame, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """event stream → sessions; closed sessions emit immediately, open ones
    emit when the event-time watermark passes their 30-minute gap horizon
    (see module docstring)."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = ev.withWatermark("ts", watermark_delay)
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
