"""Streaming exact dedup: first-seen emission, cross-restart exactly-once,
and row-level equality with the batch keep-min twin when fed in doc_id
order."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_ibm_models_spark.streaming.stream_dedup import content_hash, dedup_stream

from .conftest import SF_SMALL


def _drain(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(
        in_dir
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_dedup_matches_batch_and_never_reemits(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
    )
    # duplicate half the corpus under new doc_ids so there is real dup mass
    base = docs.limit(300)
    dups = base.limit(150).withColumn("doc_id", F.col("doc_id") + 100000)
    in1 = str(tmp_path / "in1")
    in2 = str(tmp_path / "in2")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # drain 1: originals (doc_id order => min-id keeper arrives first)
    base.coalesce(1).orderBy("doc_id").write.parquet(in1)
    _drain(spark, in1, out, ckpt)
    emitted1 = spark.read.parquet(out).collect()

    # batch twin over the same input
    batch = (
        base.groupBy(content_hash(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"))
        .collect()
    )
    assert {(r.content_hash, r.keep_doc_id) for r in emitted1} == {
        (r.content_hash, r.keep_doc_id) for r in batch
    }

    # drain 2 (same checkpoint): duplicates plus ONE genuinely new doc —
    # the new doc must be emitted (proves the drain processed data, i.e.
    # the no-re-emission claim is not vacuous), the dups must not.
    novel = spark.createDataFrame(
        [(999999, "a brand new never seen document body", "en")],
        "doc_id long, text string, lang string",
    )
    dups.unionByName(novel).coalesce(1).write.parquet(in2)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).parquet(str(tmp_path / "in*"))
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted2 = spark.read.parquet(out).collect()
    # exactly one new row: the novel doc; none of the 150 dups re-emitted
    assert len(emitted2) == len(emitted1) + 1
    new_rows = [r for r in emitted2 if r.keep_doc_id == 999999]
    assert len(new_rows) == 1
    # no hash ever emitted twice across the two drains
    hashes = [r.content_hash for r in emitted2]
    assert len(hashes) == len(set(hashes))
