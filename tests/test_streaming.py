"""Structured-Streaming extraction: AvailableNow drain + checkpointed
incremental re-run; watermarked windowed agg matches its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_ibm_models_spark.sources.pages_source import pages_from_documents
from docling_ibm_models_spark.streaming.stream_extract import (
    stream_events_windowed,
    stream_extract,
)

from .conftest import SF_SMALL


def test_stream_extract_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_stream")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(spark, SF_SMALL, parallelism=4).cache()
    first_half = pages.limit(200)
    first_half.write.mode("append").parquet(pages_dir)

    stream_extract(spark, pages_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 200

    # new files arrive; re-run processes ONLY them (checkpoint file log)
    pages.subtract(first_half).write.mode("append").parquet(pages_dir)
    stream_extract(spark, pages_dir, out_dir, ckpt)
    result = spark.read.parquet(out_dir)
    assert result.count() == 500
    assert result.select("url").distinct().count() == 500

    # byte-identity holds through the streaming path too
    joined = result.join(pages.select("url", F.col("text").alias("expected")), "url")
    assert joined.filter(F.col("extracted_text") != F.col("expected")).count() == 0


def test_stream_events_windowed_matches_batch(spark, tmp_path):
    events_path = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(events_path)
    stream = spark.readStream.schema(batch.schema).parquet(
        "/root/testdata/sf0.001"
    )  # dir contains only parquet files; filter to events columns
    # simpler: restage events into an isolated dir
    ev_dir = str(tmp_path / "events")
    batch.write.parquet(ev_dir)
    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)

    out_dir = str(tmp_path / "agg_out")
    q = (
        stream_events_windowed(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "agg_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in (
            batch.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .collect()
        )
    }
    # append mode emits only windows closed by the watermark; everything
    # emitted must match the batch result, and most windows should close
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 3


def test_stream_dedup_pages(spark, tmp_path):
    """Watermarked streaming dedup: duplicated pages collapse to one row
    per content hash; a second drain adds nothing for re-crawled content
    still inside the watermark horizon."""
    from docling_ibm_models_spark import schemas
    from docling_ibm_models_spark.streaming.stream_extract import stream_dedup_pages

    pages_dir = str(tmp_path / "pages_dd")
    out_dir = str(tmp_path / "out_dd")
    ckpt = str(tmp_path / "ckpt_dd")

    pages = pages_from_documents(spark, SF_SMALL, parallelism=4, max_doc_id=100)
    pages.write.mode("append").parquet(pages_dir)

    def drain():
        stream = spark.readStream.schema(schemas.PAGES).parquet(pages_dir)
        q = (
            stream_dedup_pages(stream)
            .select("url", "content_hash")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_hashes = pages.select(
        F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    ).distinct().count()
    got = spark.read.parquet(out_dir)
    assert got.count() == n_hashes  # exact one-row-per-content collapse
    assert got.select("content_hash").distinct().count() == n_hashes

    # re-crawl: same content arrives again inside the watermark -> no new rows
    pages.write.mode("append").parquet(pages_dir)
    drain()
    assert spark.read.parquet(out_dir).count() == n_hashes


def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked stream-stream join equals its oracle-checked batch twin
    on a bounded drain (both sides watermarked; the time-range condition
    bounds the state store)."""
    from docling_ibm_models_spark.plans.queries import QUERIES
    from docling_ibm_models_spark.streaming.stream_join import attribute_purchases

    ev_batch = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_dir = str(tmp_path / "events_ss")
    ev_batch.write.parquet(ev_dir)
    stream = spark.readStream.schema(ev_batch.schema).parquet(ev_dir)

    out_dir = str(tmp_path / "attr")
    q = (
        attribute_purchases(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_s)
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_s)
        for r in QUERIES["events_click_purchase_join"](spark, SF_SMALL).collect()
    }
    assert got == expected and got, f"{len(got)} vs {len(expected)} attributed pairs"


def test_stream_extract_exactly_once_redrain(spark, tmp_path):
    """Exactly-once sink semantics: (a) a re-drain with no new input emits
    nothing; (b) an uncommitted orphan part file (a crash-torn task write)
    is invisible to readers — the parquet sink's _spark_metadata commit log,
    not the directory listing, defines the table; (c) the next real drain
    still lands exactly once."""
    import os
    import shutil

    pages_dir = str(tmp_path / "pages_stream")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(spark, SF_SMALL, parallelism=4).cache()
    first = pages.limit(200)
    first.write.mode("append").parquet(pages_dir)
    stream_extract(spark, pages_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 200
    files1 = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))

    # (a) idempotent re-drain: checkpoint says everything is processed
    stream_extract(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1
    assert sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet")) == files1

    # (b) an orphan data file not in the commit log must not be read
    orphan = os.path.join(out_dir, "part-99999-orphan.parquet")
    shutil.copy(os.path.join(out_dir, files1[0]), orphan)
    assert spark.read.parquet(out_dir).count() == n1

    # (c) new input lands exactly once despite the orphan
    pages.subtract(first).write.mode("append").parquet(pages_dir)
    stream_extract(spark, pages_dir, out_dir, ckpt)
    result = spark.read.parquet(out_dir)
    assert result.count() == 500
    assert result.select("url").distinct().count() == 500


def test_stream_layout_matches_batch_stage(spark, tmp_path):
    """Model inference under streaming: the layout stage driven by a
    file-source stream must produce EXACTLY the batch stage's clusters
    (model singleton + broadcast weights work identically in micro-batch
    tasks), and a re-drain adds nothing (file-log exactly-once)."""
    from docling_ibm_models_spark.models import harness
    from docling_ibm_models_spark.models.layout_stub import default_weights
    from docling_ibm_models_spark.pipeline.stages import (
        layout_stage,
        page_records_stage,
    )
    from docling_ibm_models_spark.sources.pages_source import pages_from_documents
    from docling_ibm_models_spark.streaming.stream_extract import stream_layout

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "clusters")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_from_documents(spark, SF_SMALL, parallelism=4)
    pages.write.parquet(pages_dir)
    bc = harness.broadcast_weights(spark, default_weights())

    stream_layout(spark, pages_dir, out_dir, ckpt, bc)
    got = spark.read.parquet(out_dir)

    batch = layout_stage(page_records_stage(spark.read.parquet(pages_dir)), bc)
    cols = sorted(batch.columns)

    def key_set(df):
        return {tuple(r) for r in df.select(*cols).collect()}

    assert key_set(got) == key_set(batch)

    # re-drain: no duplicates
    stream_layout(spark, pages_dir, out_dir, ckpt, bc)
    assert spark.read.parquet(out_dir).count() == batch.count()
