"""Resumable, lineage-tracked extraction runs (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Protocol (Iceberg-style, implemented over partitioned parquet since the
sandbox has no Iceberg catalog; the layout maps 1:1 onto
``df.writeTo(...).append()`` + a lineage table on a real cluster):

* a **snapshot_id** pins the input (deterministic hash of the input path +
  generation params — the stand-in for an Iceberg ``VERSION AS OF``),
* work is split into **chunks of salt partitions**; each chunk is one Spark
  write job: doc_text appended under ``out/doc_text/partition_id=…`` with
  dynamic partition overwrite (idempotent per partition), then the chunk's
  lineage rows appended under ``out/lineage/``. A chunk's lineage commits
  only after its data commits, so lineage is always an under-approximation
  of durable work — safe to resume from.
* **resume** = read lineage, select committed partition_ids for this
  snapshot, and process only the complement (predicate on
  ``pmod(xxhash64(url), P)`` — evaluated JVM-side during the scan).

Reference parity note: the reference has no incremental machinery at all
(SURVEY.md §2.7); this module is the Spark-native capability the north rule
adds.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_ibm_models_spark.pipeline.extract import (
    doc_text_clean,
    extract_doc_text,
    lineage_rows,
)


def snapshot_id_for(input_desc: str) -> int:
    """Deterministic 63-bit snapshot id from an input descriptor string."""
    return zlib.crc32(input_desc.encode()) * 2654435761 % (1 << 62)


@dataclass
class RunReport:
    snapshot_id: int
    partitions_total: int
    partitions_done_before: int
    partitions_processed: int
    docs_processed: int
    chunks: int


def committed_partitions(spark: SparkSession, out_dir: str, snapshot_id: int) -> set[int]:
    try:
        lin = spark.read.parquet(f"{out_dir}/lineage")
    except Exception:
        return set()
    rows = (
        lin.filter(
            (F.col("snapshot_id") == snapshot_id) & (F.col("status") == "committed")
        )
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    snapshot_id: int,
    num_partitions: int = 32,
    chunk_partitions: int | None = None,
    max_chunks: int | None = None,
) -> RunReport:
    """Run (or resume) the extraction of ``pages`` into ``out_dir``.

    ``chunk_partitions`` controls checkpoint granularity (partitions per
    commit). ``max_chunks`` lets tests simulate a mid-run kill: the run
    stops after N committed chunks; a later call resumes exactly there.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    chunk_partitions = chunk_partitions or num_partitions
    done = committed_partitions(spark, out_dir, snapshot_id)
    todo = [p for p in range(num_partitions) if p not in done]
    chunks = [
        todo[i : i + chunk_partitions] for i in range(0, len(todo), chunk_partitions)
    ]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]

    docs_processed = 0
    processed_parts = 0
    for chunk in chunks:
        chunk_set = set(chunk)
        chunk_pages = pages.filter(
            F.pmod(F.xxhash64(F.col("url")), F.lit(num_partitions))
            .cast("int")
            .isin(chunk_set)
        )
        extracted = extract_doc_text(chunk_pages, num_partitions=num_partitions)
        # one pass: cache the chunk's output, write data, then commit lineage
        extracted = extracted.persist()
        try:
            (
                doc_text_clean(extracted)
                .write.mode("overwrite")
                .partitionBy("partition_id")
                .parquet(f"{out_dir}/doc_text")
            )
            lin = lineage_rows(extracted, snapshot_id)
            n = lin.agg(F.sum("doc_count")).collect()[0][0] or 0
            lin.write.mode("append").parquet(f"{out_dir}/lineage")
            docs_processed += int(n)
            processed_parts += len(chunk)
        finally:
            extracted.unpersist()

    return RunReport(
        snapshot_id=snapshot_id,
        partitions_total=num_partitions,
        partitions_done_before=len(done),
        partitions_processed=processed_parts,
        docs_processed=docs_processed,
        chunks=len(chunks),
    )
