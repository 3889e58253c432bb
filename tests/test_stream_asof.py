"""Streaming as-of enrichment vs its batch twin (events_asof_join, oracle
query): after a bounded AvailableNow drain plus a watermark fence, every
click must carry exactly the batch answer — same purchase timestamp, same
tie-broken value, same -1 sentinels for purchase-less users."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_ibm_models_spark.plans.queries import QUERIES
from docling_ibm_models_spark.streaming.stream_asof import asof_stream

from .conftest import SF_SMALL

FENCE_USER = -1


def _drain(spark, schema, ev_dir, out_dir, ckpt):
    stream = spark.readStream.schema(schema).parquet(ev_dir)
    q = (
        asof_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_asof_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)

    out_dir = str(tmp_path / "asof")
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    # Fence: a far-future 'purchase' for a sentinel user. The type filter
    # is pushed below the watermark node, so only click/purchase rows
    # advance the watermark; a click-less sentinel user's purchase sits in
    # state but never emits anything.
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    fence = (
        batch.limit(1)
        .withColumn("user_id", F.lit(FENCE_USER).cast("long"))
        .withColumn("event_type", F.lit("purchase"))
        .withColumn("ts", F.lit(max_ts) + F.expr("INTERVAL 2 HOURS"))
        .select(*batch.columns)
    )
    fence.write.mode("append").parquet(ev_dir)
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    got = {
        r.click_id: (r.user_id, r.asof_ts_us, r.asof_val)
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        r.click_id: (r.user_id, r.asof_ts_us, r.asof_val)
        for r in QUERIES["events_asof_join"](spark, SF_SMALL).collect()
    }
    assert got == expected, (
        f"stream/batch as-of divergence: {len(got)} vs {len(expected)} clicks; "
        f"missing={sorted(set(expected) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(expected))[:5]} "
        f"diff={[k for k in (set(got) & set(expected)) if got[k] != expected[k]][:5]}"
    )


def test_stream_asof_state_is_bounded(spark, tmp_path):
    """After the drain, per-user purchase state must have been evicted down
    to the watermark floor — asserted indirectly: a THIRD drain with one
    more late-window click still answers from the retained floor purchase."""
    batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)
    out_dir = str(tmp_path / "asof")
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    # pick a user with at least one purchase; append a click AFTER max_ts
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    user = (
        batch.where(F.col("event_type") == "purchase")
        .groupBy("user_id").count().orderBy("user_id").limit(1)
        .collect()[0].user_id
    )
    late_click = (
        batch.limit(1)
        .withColumn("user_id", F.lit(user).cast("long"))
        .withColumn("event_type", F.lit("click"))
        .withColumn("event_id", F.lit(10_000_000).cast("long"))
        .withColumn("ts", F.lit(max_ts) + F.expr("INTERVAL 1 HOUR"))
        .select(*batch.columns)
    )
    late_click.write.mode("append").parquet(ev_dir)
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)
    fence = (
        batch.limit(1)
        .withColumn("user_id", F.lit(FENCE_USER).cast("long"))
        .withColumn("event_type", F.lit("purchase"))
        .withColumn("ts", F.lit(max_ts) + F.expr("INTERVAL 3 HOURS"))
        .select(*batch.columns)
    )
    fence.write.mode("append").parquet(ev_dir)
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    rows = [
        r for r in spark.read.parquet(out_dir).collect() if r.click_id == 10_000_000
    ]
    assert len(rows) == 1
    # the late click's answer must be that user's LAST purchase overall
    last_p = (
        batch.where(
            (F.col("event_type") == "purchase") & (F.col("user_id") == user)
        )
        .select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .agg(F.max("us"))
        .collect()[0][0]
    )
    assert rows[0].asof_ts_us == last_p


def test_asof_helpers_match_bruteforce():
    """Property check of the pure state helpers against a brute-force
    as-of over random event sets (including duplicate timestamps)."""
    import random

    from docling_ibm_models_spark.streaming.stream_asof import (
        _emit_ready,
        _merge_purchases,
    )

    rng = random.Random(7)
    for _ in range(200):
        purchases = [
            (rng.randrange(0, 50), round(rng.uniform(0, 9), 2))
            for _ in range(rng.randrange(0, 12))
        ]
        clicks = sorted(
            (rng.randrange(0, 60), i) for i in range(rng.randrange(0, 8))
        )
        wm = rng.randrange(0, 70)
        p_ts, p_val = [], []
        # insert in random arrival order, possibly over several "batches"
        arr = purchases[:]
        rng.shuffle(arr)
        half = len(arr) // 2
        _merge_purchases(p_ts, p_val, arr[:half])
        _merge_purchases(p_ts, p_val, arr[half:])
        assert p_ts == sorted(set(t for t, _ in purchases))
        rows, keep_ts, keep_id = _emit_ready(
            p_ts, p_val, [t for t, _ in clicks], [i for _, i in clicks], wm
        )
        for r in rows:
            ts = next(t for t, i in clicks if i == r["click_id"])
            elig = [(t, v) for t, v in purchases if t <= ts]
            if elig:
                best_t = max(t for t, _ in elig)
                best_v = max(v for t, v in elig if t == best_t)
                assert r["asof_ts_us"] == best_t
                assert r["asof_val"] == round(best_v, 2)
            else:
                assert r["asof_ts_us"] == -1 and r["asof_val"] == -1.0
        assert keep_ts == [t for t, _ in clicks if t >= wm]


def test_fence_semantics_any_type_advances(spark, tmp_path):
    """Watermark-fence semantics pin (round-3 ADVICE sharp edge, settled
    empirically + by the analyzed plan): the event-type filter sits ABOVE
    the EventTimeWatermark node, so EVERY row — even a filtered-out type —
    advances the watermark. Two assertions: (a) the plan shape itself
    (Filter above EventTimeWatermark), (b) the behavior (a far-future
    'view' fence flushes all pending clicks). If Spark ever starts pushing
    the filter below the watermark node, BOTH fail loudly — the drain
    protocol (which fences with 'purchase', safe under either shape) needs
    no change, but the documented semantics would."""
    from docling_ibm_models_spark.streaming.stream_asof import asof_stream

    batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)
    out_dir = str(tmp_path / "asof")
    ckpt = str(tmp_path / "ckpt")

    # (a) plan shape: Filter above EventTimeWatermark in the analyzed plan
    plan = (
        asof_stream(spark.readStream.schema(batch.schema).parquet(ev_dir))
        ._jdf.queryExecution().analyzed().toString()
    )
    assert plan.index("Filter") < plan.index("EventTimeWatermark"), plan[:800]

    # (b) behavior: a filtered-out fence type still flushes everything
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    view_fence = (
        batch.limit(1)
        .withColumn("user_id", F.lit(FENCE_USER).cast("long"))
        .withColumn("event_type", F.lit("view"))  # filtered out upstream
        .withColumn("ts", F.lit(max_ts) + F.expr("INTERVAL 2 HOURS"))
        .select(*batch.columns)
    )
    view_fence.write.mode("append").parquet(ev_dir)
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)
    n_batch = QUERIES["events_asof_join"](spark, SF_SMALL).count()
    assert spark.read.parquet(out_dir).count() == n_batch


def test_round_half_up_matches_spark_round():
    """The stream emits F.round-compatible half-up values even on exact
    binary .005 ties where Python's round() banks to even."""
    from docling_ibm_models_spark.streaming.stream_asof import _round2_half_up

    assert _round2_half_up(0.125) == 0.13  # round() gives 0.12
    assert _round2_half_up(0.375) == 0.38  # round() gives 0.38 too, but...
    assert _round2_half_up(2.675) == 2.68  # repr-based: Spark semantics
    assert _round2_half_up(-0.125) == -0.13
    assert _round2_half_up(1.0) == 1.0
