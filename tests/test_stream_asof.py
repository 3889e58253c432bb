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
