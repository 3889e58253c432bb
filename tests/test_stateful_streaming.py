"""applyInPandasWithState sessionizer vs its batch twin (events_sessionize
oracle query). Closed sessions must match the batch result exactly; open
sessions flush via the EventTimeTimeout once the watermark passes their
30-minute gap horizon — the test appends a far-future fence event so the
bounded AvailableNow drain advances the watermark past every horizon, then
asserts FULL equality with the batch twin (fence user excluded)."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_ibm_models_spark.plans.queries import QUERIES
from docling_ibm_models_spark.streaming.stateful import sessionize_stream

from .conftest import SF_SMALL

FENCE_USER = -1


def _drain(spark, schema, ev_dir, out_dir, ckpt):
    stream = spark.readStream.schema(schema).parquet(ev_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)

    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    # Fence: one far-future event for a sentinel user pushes the watermark
    # past every open session's gap horizon; the next drain flushes them.
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    fence = (
        batch.limit(1)
        .withColumn("user_id", F.lit(FENCE_USER).cast("long"))
        .withColumn("ts", F.lit(max_ts) + F.expr("INTERVAL 2 HOURS"))
        .select(*batch.columns)
    )
    fence.write.mode("append").parquet(ev_dir)
    _drain(spark, batch.schema, ev_dir, out_dir, ckpt)

    got = {
        (r.user_id, r.session_no): (r.n_events, r.session_start)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != FENCE_USER
    }
    expected = {
        (r.user_id, r.session_no): (r.n_events, r.session_start)
        for r in QUERIES["events_sessionize"](spark, SF_SMALL).collect()
    }

    assert got == expected, (
        f"stream/batch divergence: {len(got)} vs {len(expected)} sessions; "
        f"missing={sorted(set(expected) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(expected))[:5]}"
    )
