"""End-to-end extraction stage: pages → doc_text, Spark-first.

Shape (SURVEY.md §3, "Spark lifecycle of our engine"):

    pages scan → salt-repartition on pmod(xxhash64(url), P)   [explicit skew
    neutralization — heavy-page skew is per-row cost, so a url-hash salt
    spreads hot hosts uniformly; north rule "partitioning/shuffle/skew
    handled explicitly"] → one Arrow-batched ``mapInPandas`` stage running
    the pure-Python extraction kernel per batch (no per-row Python UDFs at
    the JVM boundary) → doc_text rows carrying their partition_id + a
    cumulative per-partition wall clock for lineage accounting.

The analogous reference flow is single-process Python
(/root/reference/docling_ibm_models/tableformer/data_management/tf_predictor.py:698-836);
here the only process boundaries are the salt shuffle and the JVM↔Python
Arrow exchange, exactly as planned in SURVEY.md §3.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from docling_ibm_models_spark import schemas
from docling_ibm_models_spark.functions.html_extract import extract_main_content

# doc_text + a per-partition cumulative wall clock (consumed by lineage agg)
_EXTRACT_SCHEMA = StructType(
    list(schemas.DOC_TEXT.fields) + [StructField("wall_s", DoubleType(), False)]
)


def salt_partition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Add ``partition_id = pmod(xxhash64(url), P)`` and co-locate rows by it.

    xxhash64 is JVM-side (whole-stage codegen); the repartition is the single
    shuffle of the pipeline. At cluster scale P ≈ 2–4 × total cores.
    """
    return df.withColumn(
        "partition_id",
        F.pmod(F.xxhash64(F.col("url")), F.lit(num_partitions)).cast("int"),
    ).repartition(num_partitions, F.col("partition_id"))


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched extraction kernel. Runs once per task (= per salt
    partition); tracks cumulative wall time so lineage can report per
    partition without a second pass."""
    t0 = time.monotonic()
    for pdf in batches:
        if not len(pdf):
            continue
        urls = pdf["url"].tolist()
        langs = pdf["lang"].tolist()
        pids = pdf["partition_id"].tolist()
        out = {
            "url": urls,
            "lang": langs,
            "extracted_text": [],
            "n_blocks": [],
            "n_chars": [],
            "spans": [],
            "partition_id": pids,
        }
        for html in pdf["html"]:
            text, spans = extract_main_content(html)
            out["extracted_text"].append(text)
            out["n_blocks"].append(len(spans))
            out["n_chars"].append(len(text))
            out["spans"].append(
                [
                    {"start": s, "end": e, "label": lbl, "block_idx": i}
                    for s, e, lbl, i in spans
                ]
            )
        wall = time.monotonic() - t0
        res = pd.DataFrame(out)
        res["wall_s"] = wall
        yield res


def extract_doc_text(pages: DataFrame, num_partitions: int = 32) -> DataFrame:
    """pages (input_hint shape) → doc_text rows (+wall_s helper column)."""
    salted = salt_partition(pages, num_partitions)
    return salted.mapInPandas(_extract_batches, schema=_EXTRACT_SCHEMA)


def doc_text_clean(extracted: DataFrame) -> DataFrame:
    """User-facing doc_text (drops the lineage helper column)."""
    return extracted.drop("wall_s")


def lineage_rows(extracted: DataFrame, snapshot_id: int) -> DataFrame:
    """Aggregate per-partition lineage: (snapshot_id, partition_id,
    doc_count, wall_s, status). Map-side-combinable hash agg — no extra
    pass over the pages."""
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.max("wall_s").alias("wall_s"),
        )
        .select(
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            F.col("partition_id"),
            F.col("doc_count").cast("long"),
            F.col("wall_s"),
            F.lit("committed").alias("status"),
        )
    )
