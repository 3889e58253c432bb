"""applyInPandasWithState sessionizer vs its batch twin (events_sessionize
oracle query): every closed streaming session must match the batch result;
only each user's final (still-open) session may be missing, since
AvailableNow stops before the processing-time timeout can flush it."""

from __future__ import annotations

from docling_ibm_models_spark.plans.queries import QUERIES
from docling_ibm_models_spark.streaming.stateful import sessionize_stream

from .conftest import SF_SMALL


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)
    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)

    out_dir = str(tmp_path / "sessions")
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_no): (r.n_events, r.session_start)
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r.user_id, r.session_no): (r.n_events, r.session_start)
        for r in QUERIES["events_sessionize"](spark, SF_SMALL).collect()
    }

    assert got, "no closed sessions emitted"
    for k, v in got.items():
        assert expected[k] == v, f"session {k}: stream {v} vs batch {expected[k]}"
    # missing keys are exactly each user's last (open) session
    missing = set(expected) - set(got)
    last_per_user = {}
    for uid, sno in expected:
        last_per_user[uid] = max(last_per_user.get(uid, 0), sno)
    assert all(sno == last_per_user[uid] for uid, sno in missing)
