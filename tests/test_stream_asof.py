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
