"""Resumable, lineage-tracked extraction runs (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Protocol (Iceberg-style, implemented over partitioned parquet since the
sandbox has no Iceberg catalog; the layout maps 1:1 onto Iceberg file scan
tasks + ``df.writeTo(...).append()`` + a lineage table on a real cluster):

* a **snapshot_id** pins the input (deterministic hash of the input path +
  generation params — the stand-in for an Iceberg ``VERSION AS OF``),
* the input's data files are deterministically bucketed into **file
  groups** (= lineage partitions) by sorted order; each chunk of groups is
  one Spark write job that reads ONLY its own files (scan pruning — resume
  never rescans committed work, unlike a row-level url-hash filter which
  would re-read everything), extracts, appends doc_text under
  ``out/doc_text/partition_id=…`` with dynamic partition overwrite
  (idempotent per partition), then appends the chunk's lineage rows under
  ``out/lineage/``. A chunk's lineage commits only after its data commits,
  so lineage is always an under-approximation of durable work — safe to
  resume from.
* **resume** = read lineage, select committed partition_ids for this
  snapshot, process only the complement's files.

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


def list_file_groups(
    spark: SparkSession,
    input_path: str,
    num_groups: int,
    suffix: str | tuple[str, ...] = ".parquet",
) -> list[list[str]]:
    """Deterministically bucket the input's data files into lineage groups.

    Local stand-in for planning Iceberg file scan tasks: sorted file list,
    round-robin into ``num_groups`` buckets (files are size-balanced by the
    writer, so round-robin keeps groups even). ``suffix`` selects the data
    files (``.parquet`` for lake tables, ``.warc``/``.warc.gz`` for raw
    crawl archives)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(input_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    files = sorted(
        str(f.getPath())
        for f in fs.listStatus(jvm_path)
        if f.isFile() and f.getPath().getName().endswith(suffix)
    )
    groups: list[list[str]] = [[] for _ in range(min(num_groups, max(1, len(files))))]
    for i, f in enumerate(files):
        groups[i % len(groups)].append(f)
    return groups


def _check_snapshot_manifest(
    spark: SparkSession, out_dir: str, snapshot_id: int, groups: list[list[str]]
) -> None:
    """Snapshot pinning safety (the ``VERSION AS OF`` analogue): a
    snapshot_id is a claim that (input file set, group partitioning) is
    frozen. Record the SORTED-file-list fingerprint plus the group count on
    first run; refuse to resume if either drifted under the same
    snapshot_id — a changed file set would silently mix inputs, a changed
    ``num_groups`` would remap partition_ids onto different file groups
    and corrupt the resume bookkeeping. The two failure modes get distinct
    messages."""
    files = sorted(f for g in groups for f in g)
    fingerprint = zlib.crc32("\n".join(files).encode())
    num_groups = len(groups)
    # v2: sorted-file fingerprint + explicit num_groups. The v1 manifest
    # (round-robin-flattened fingerprint, no num_groups column) is
    # schema- AND value-incompatible, so v2 lives at its own path — a v1
    # out_dir re-pins on the next run instead of silently mixing schemas
    # in one directory or false-alarming on the changed fingerprint basis.
    path = f"{out_dir}/_manifest_v2"
    try:
        prev = {
            r.snapshot_id: (r.fingerprint, r.num_groups)
            for r in spark.read.parquet(path).collect()
        }
    except Exception:
        prev = {}
    if snapshot_id in prev:
        prev_fp, prev_ng = prev[snapshot_id]
        if prev_fp != fingerprint:
            raise ValueError(
                f"input file set drifted under pinned snapshot {snapshot_id}: "
                "refusing to resume (use a new snapshot_id for new input)"
            )
        if prev_ng != num_groups:
            raise ValueError(
                f"partitioning changed under pinned snapshot {snapshot_id}: "
                f"{prev_ng} file groups at first run vs {num_groups} now — "
                "resume with the original num_partitions/chunk size, or use "
                "a new snapshot_id + output dir to re-partition"
            )
        return
    spark.createDataFrame(
        [(snapshot_id, fingerprint, num_groups)],
        "snapshot_id long, fingerprint long, num_groups int",
    ).write.mode("append").parquet(path)


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
    pages_path: str,
    out_dir: str,
    snapshot_id: int,
    num_partitions: int = 32,
    chunk_partitions: int | None = None,
    max_chunks: int | None = None,
    input_format: str = "parquet",
) -> RunReport:
    """Run (or resume) the extraction of the pages table at ``pages_path``.

    ``chunk_partitions`` controls checkpoint granularity (file groups per
    commit). ``max_chunks`` lets tests simulate a mid-run kill: the run
    stops after N committed chunks; a later call resumes exactly there.
    ``input_format='warc'`` runs the same lineage/resume machinery directly
    over raw crawl archives (sources/warc_source.py) — group = set of
    archives, scan = binaryFile + parse, everything downstream identical.
    """
    suffix: str | tuple[str, ...]
    if input_format == "warc":
        from docling_ibm_models_spark.sources.warc_source import pages_from_warc

        suffix = (".warc", ".warc.gz")

        def read_group(files: list[str]) -> DataFrame:
            return pages_from_warc(spark, files)

    elif input_format == "parquet":
        suffix = ".parquet"

        def read_group(files: list[str]) -> DataFrame:
            return spark.read.parquet(*files)

    else:
        raise ValueError(f"unknown input_format {input_format!r}")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    groups = list_file_groups(spark, pages_path, num_partitions, suffix=suffix)
    _check_snapshot_manifest(spark, out_dir, snapshot_id, groups)
    num_groups = len(groups)
    chunk_partitions = chunk_partitions or num_groups
    done = committed_partitions(spark, out_dir, snapshot_id)
    todo = [g for g in range(num_groups) if g not in done]
    chunks = [
        todo[i : i + chunk_partitions] for i in range(0, len(todo), chunk_partitions)
    ]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]

    docs_processed = 0
    processed_parts = 0
    for chunk in chunks:
        # one scan per group (narrow, file-pruned), unioned into one job
        extracted: DataFrame | None = None
        for gid in chunk:
            part = extract_doc_text(read_group(groups[gid]), partition_id=gid)
            extracted = part if extracted is None else extracted.unionByName(part)
        assert extracted is not None
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
        partitions_total=num_groups,
        partitions_done_before=len(done),
        partitions_processed=processed_parts,
        docs_processed=docs_processed,
        chunks=len(chunks),
    )


def read_incremental(
    spark: SparkSession,
    out_dir: str,
    snapshot_id: int,
    seen_partitions: set[int] | None = None,
) -> tuple[DataFrame, set[int]]:
    """Incremental consumption — the Iceberg incremental-append-scan
    analogue for downstream training-data consumers ("give me everything
    extracted since my last read").

    The consumer keeps its own tiny checkpoint: the set of (committed)
    partition_ids it has already ingested. Each call returns (a) a
    DataFrame of ONLY the newly committed partitions — a partition-pruned
    scan over ``doc_text/partition_id=…``, so at 10^12 docs an
    incremental read touches just the new files, never the table — and
    (b) the updated checkpoint set to persist for the next call. Because
    lineage commits strictly after data (module protocol), every
    partition this returns is durably complete; a producer still running
    simply yields its remaining partitions on later calls."""
    seen = set(seen_partitions or ())
    committed = committed_partitions(spark, out_dir, snapshot_id)
    new = sorted(committed - seen)
    df = spark.read.parquet(f"{out_dir}/doc_text")
    if new:
        out = df.where(F.col("partition_id").isin([int(p) for p in new]))
    else:
        out = df.where(F.lit(False))
    return out, committed
