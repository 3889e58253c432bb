"""Streaming AS-OF enrichment: each click is joined to the most recent
purchase at-or-before its event time, per user — the streaming twin of the
batch ``events_asof_join`` query (plans/queries.py), with event-time-correct
buffering.

Why buffering is required: an as-of answer for a click at time t is only
final once no purchase with ts <= t can still arrive, i.e. once the
watermark passes t. So the operator (``applyInPandasWithState`` keyed by
user_id) keeps two pieces of state per user:

* purchases inside the watermark horizon, collapsed to one (ts, max value)
  entry per timestamp — the same tie rule the batch twin's ``max(p.value)``
  re-join applies — PLUS the single most recent purchase at-or-below the
  watermark (the "floor"): any future click can as-of to the floor but
  never to anything older, so everything below it is evicted and state
  stays O(watermark window), not O(stream);
* pending clicks not yet passed by the watermark, flushed either by a
  later batch of the same key or by an event-time timeout armed at the
  earliest pending click's timestamp.

Emission uses strict ``ts < watermark`` (a purchase with ts == click ts is
still admissible at equality); a bounded AvailableNow drain therefore ends
with a far-future fence row to push the watermark past every pending click,
exactly like the sessionizer test's fence. Output rows carry the batch
twin's sentinel convention (-1 / -1.0 when the user has no prior purchase),
so a drained stream compares EQUAL to the batch query, row for row.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT = StructType(
    [
        StructField("click_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("asof_ts_us", LongType(), False),
        StructField("asof_val", DoubleType(), False),
    ]
)

STATE = StructType(
    [
        StructField("p_ts", ArrayType(LongType()), False),
        StructField("p_val", ArrayType(DoubleType()), False),
        StructField("c_ts", ArrayType(LongType()), False),
        StructField("c_id", ArrayType(LongType()), False),
    ]
)


def _round2_half_up(v: float) -> float:
    """Spark's F.round semantics for doubles (BigDecimal HALF_UP over the
    shortest decimal representation) — Python's builtin round() is
    banker's rounding and would diverge from the batch twin on exact .005
    binary ties (e.g. 0.125 → 0.12 vs Spark's 0.13)."""
    return float(Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _merge_purchases(p_ts: list, p_val: list, arrivals) -> None:
    """Insert (ts, val) arrivals keeping p_ts sorted and one entry per ts
    with the max value (the batch twin's tie rule)."""
    for ts, val in arrivals:
        i = bisect.bisect_left(p_ts, ts)
        if i < len(p_ts) and p_ts[i] == ts:
            if val > p_val[i]:
                p_val[i] = val
        else:
            p_ts.insert(i, ts)
            p_val.insert(i, val)


def _emit_ready(p_ts, p_val, c_ts, c_id, wm_us: int):
    """Pop clicks strictly below the watermark; answer each from the
    purchase floor at its timestamp."""
    rows, keep_ts, keep_id = [], [], []
    for ts, cid in zip(c_ts, c_id):
        if ts < wm_us:
            i = bisect.bisect_right(p_ts, ts) - 1
            rows.append(
                {
                    "click_id": cid,
                    "user_id": None,  # filled by caller
                    "asof_ts_us": p_ts[i] if i >= 0 else -1,
                    "asof_val": _round2_half_up(p_val[i]) if i >= 0 else -1.0,
                }
            )
        else:
            keep_ts.append(ts)
            keep_id.append(cid)
    return rows, keep_ts, keep_id


def _evict_purchases(p_ts, p_val, wm_us: int):
    """Drop everything strictly below the floor (= most recent purchase
    with ts <= watermark); the floor itself stays reachable for future
    clicks."""
    floor_i = bisect.bisect_right(p_ts, wm_us) - 1
    if floor_i > 0:
        del p_ts[:floor_i]
        del p_val[:floor_i]


def _asof(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key

    if state.exists:
        p_ts, p_val, c_ts, c_id = (list(x) for x in state.get)
    else:
        p_ts, p_val, c_ts, c_id = [], [], [], []

    if not state.hasTimedOut:
        purchases, clicks = [], []
        for pdf in pdfs:
            for t, et, val, eid in zip(
                pdf["ts"], pdf["event_type"], pdf["value"], pdf["event_id"]
            ):
                us = int(t.value) // 1000  # exact µs, like the sessionizer
                if et == "purchase":
                    purchases.append((us, float(val)))
                else:
                    clicks.append((us, int(eid)))
        _merge_purchases(p_ts, p_val, purchases)
        for ts, cid in sorted(clicks):
            c_ts.append(ts)
            c_id.append(cid)
        # keep pending clicks sorted across batches
        order = sorted(range(len(c_ts)), key=lambda i: (c_ts[i], c_id[i]))
        c_ts = [c_ts[i] for i in order]
        c_id = [c_id[i] for i in order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    rows, c_ts, c_id = _emit_ready(p_ts, p_val, c_ts, c_id, wm_us)
    _evict_purchases(p_ts, p_val, wm_us)

    if not p_ts and not c_ts:
        # nothing left to answer from or flush: drop the state row so
        # state stays O(watermark window), not O(total user cardinality)
        # (a later event for this user simply recreates it)
        state.remove()
    else:
        state.update((p_ts, p_val, c_ts, c_id))
        if c_ts:
            # flush the earliest pending click as soon as the watermark
            # passes it (ms-unit API; +1 so strict `<` holds at the edge)
            horizon_ms = c_ts[0] // 1000 + 1
            state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1))

    if rows:
        for r in rows:
            r["user_id"] = user_id
        yield pd.DataFrame(rows)


def asof_stream(events_stream: DataFrame, watermark_delay: str = "0 seconds") -> DataFrame:
    """click/purchase event stream → as-of-enriched clicks (see module
    docstring). Watermark/filter ordering (pinned by
    tests/test_stream_asof.py::test_fence_semantics_any_type_advances):
    the type filter stays ABOVE the EventTimeWatermark node in the
    analyzed plan (Catalyst does not reorder across it), so EVERY event
    row — any event_type — advances the watermark. The drain protocol
    still fences with a far-future 'purchase' for a sentinel user: it
    works under either plan shape (a filtered-out type would stop
    advancing the watermark if a future Spark version pushed the filter
    below the node), and it is inert in state (nothing ever emits for a
    user with no clicks)."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = ev.withWatermark("ts", watermark_delay)
    ev = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _asof,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
