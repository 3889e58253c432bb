"""Small-file compaction — the Iceberg ``rewrite_data_files`` analogue for
the plain-parquet lake this sandbox stands in for.

Long-running ingestion (per-chunk lineage commits, streaming sinks) leaves
directories with many small files; at 10^12-doc scale the scan-planning and
open() overhead of millions of tiny files dominates. ``compact_parquet_dir``
bin-packs the existing data files into groups of ~``target_bytes`` (first-fit
over the size-sorted listing — same planning shape as lineage file groups),
rewrites each group with ``coalesce(1)`` (narrow — no shuffle, a group's
files stream through one task), and commits via the shared
:mod:`atomic_dir` snapshot swap — in-process failures roll back to the
original, hard crashes are repaired by the ``recover()`` every run
performs on entry. Non-parquet sidecar entries (lineage ``_manifest_v2``,
``_metadata`` …) are carried into the new snapshot by hardlink.

Files already ≥ target_bytes are carried over untouched (copied by group
membership of exactly one file — no rewrite cost beyond the copy, which a
real table format would avoid via manifest pointers; documented trade-off
of the format-less stand-in).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionReport:
    files_before: int
    files_after: int
    bytes_total: int
    groups: int


def _plan_groups(files: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing bin pack of (path, size) into ~target_bytes
    groups; a file ≥ target gets its own group."""
    groups: list[tuple[int, list[str]]] = []
    for path, size in sorted(files, key=lambda fs: -fs[1]):
        if size >= target_bytes:
            groups.append((size, [path]))
            continue
        for i, (gsize, paths) in enumerate(groups):
            if gsize + size <= target_bytes:
                groups[i] = (gsize + size, paths + [path])
                break
        else:
            groups.append((size, [path]))
    return [paths for _, paths in groups]


def compact_parquet_dir(
    spark: SparkSession, data_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> CompactionReport:
    from docling_ibm_models_spark.pipeline import atomic_dir

    atomic_dir.recover(data_dir, "compact")  # repair any interrupted run

    entries = os.listdir(data_dir)
    files = [
        (os.path.join(data_dir, f), os.path.getsize(os.path.join(data_dir, f)))
        for f in entries
        if f.endswith(".parquet")
    ]
    if not files:
        return CompactionReport(0, 0, 0, 0)
    groups = _plan_groups(files, target_bytes)
    tmp = data_dir.rstrip("/") + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    for i, group in enumerate(groups):
        out = os.path.join(tmp, f"group-{i:05d}")
        spark.read.parquet(*group).coalesce(1).write.mode("overwrite").parquet(out)
        # hoist the single part file up; keep deterministic names
        for f in os.listdir(out):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(out, f), os.path.join(tmp, f"part-{i:05d}.parquet")
                )
        shutil.rmtree(out)
    # carry over every sidecar entry (lineage _manifest_v2, _metadata, …)
    # by hardlink — only the data files are rewritten. _SUCCESS is
    # recreated fresh for downstream marker checks.
    for entry in entries:
        if entry.endswith(".parquet") or entry == "_SUCCESS":
            continue
        atomic_dir.link_tree(os.path.join(data_dir, entry), os.path.join(tmp, entry))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()

    atomic_dir.swap(data_dir, tmp, "compact")

    n_after = len([f for f in os.listdir(data_dir) if f.endswith(".parquet")])
    return CompactionReport(
        files_before=len(files),
        files_after=n_after,
        bytes_total=sum(s for _, s in files),
        groups=len(groups),
    )
