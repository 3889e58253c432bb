"""Streaming CMS delta emission: drained deltas must sum counter-wise to
EXACTLY the sketch a batch build produces over the same domains — the
mergeability property that makes the append-mode emission sound."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from docling_ibm_models_spark.streaming.stream_sketch import (
    CMS_D,
    CMS_W,
    N_SHARDS,
    cms_coords,
    h32,
    sketch_stream,
)

from .conftest import SF_SMALL


def _domains(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id")
    return [f"site{h32(str(r.doc_id), seed='dom|') % 50}" for r in docs.collect()]


def _drain(spark, dom_dir, out_dir, ckpt):
    stream = spark.readStream.schema("domain string").parquet(dom_dir)
    q = (
        sketch_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_sketch_deltas_sum_to_batch_sketch(spark, tmp_path):
    domains = _domains(spark)
    dom_dir = str(tmp_path / "domains")
    out_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")

    half = len(domains) // 2
    spark.createDataFrame([(d,) for d in domains[:half]], "domain string").write.parquet(
        dom_dir
    )
    _drain(spark, dom_dir, out_dir, ckpt)
    spark.createDataFrame(
        [(d,) for d in domains[half:]], "domain string"
    ).write.mode("append").parquet(dom_dir)
    _drain(spark, dom_dir, out_dir, ckpt)

    # reconstruct the global sketch: counter-wise sum of ALL deltas
    got = Counter()
    for row in spark.read.parquet(out_dir).collect():
        got[(row.r, row.bucket)] += row.delta

    expected = Counter()
    for d in domains:
        for r, b in cms_coords(d):
            expected[(r, b)] += 1
    assert got == expected

    # the CMS estimate (min over rows) from the reconstructed sketch
    # matches the oracle-checked batch query's estimates
    from docling_ibm_models_spark.plans.queries import QUERIES

    top = QUERIES["corpus_cms_heavy_hitters"](spark, SF_SMALL).collect()
    assert top, "batch twin returned nothing"
    for row in top:
        est = min(got[(r, b)] for r, b in cms_coords(row.domain))
        assert est == row.cms_est, row.domain

    # per-shard state stays fixed-size: every shard emitted <= d*w buckets
    per_shard = (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(F.countDistinct("r", "bucket").alias("nb"))
        .collect()
    )
    assert all(r.nb <= CMS_D * CMS_W for r in per_shard)
    assert len(per_shard) <= N_SHARDS
