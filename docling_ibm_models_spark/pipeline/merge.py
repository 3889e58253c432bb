"""MERGE/upsert into a hash-partitioned parquet table — the Iceberg
``MERGE INTO`` analogue over the same layout the extraction pipeline
writes (``<dir>/part_bucket=…``).

The scale-defining property is PARTITION PRUNING on both sides of the
read-modify-write: updates are bucketed by the same ``pmod(xxhash64(key),
P)`` the table is partitioned by, only the buckets that actually receive
updates are read back, merged (updates win on key collision, new keys
insert), staged, and committed by atomic snapshot swap. Buckets without
updates are never read, never rewritten — at 10^12 rows a MERGE touching
0.1% of keys costs ~0.1% of a full rewrite. Matches Iceberg's
copy-on-write MERGE at partition granularity (real Iceberg prunes to file
granularity via manifests; partition granularity is the honest plain-
parquet equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "part_bucket"


def bucket_of(key_col, num_buckets: int):
    return F.pmod(F.xxhash64(key_col), F.lit(num_buckets)).cast("int")


def write_merge_table(df: DataFrame, path: str, key: str, num_buckets: int) -> None:
    """Initial load: hash-bucket by key and partition the parquet dir."""
    (
        df.withColumn(PART_COL, bucket_of(F.col(key), num_buckets))
        .write.mode("overwrite")
        .partitionBy(PART_COL)
        .parquet(path)
    )


@dataclass
class MergeReport:
    buckets_touched: int
    rows_updated: int
    rows_inserted: int


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    num_buckets: int,
) -> MergeReport:
    """Upsert ``updates`` into the table at ``path`` (same schema, keyed by
    ``key``): matched keys take the update row, unmatched insert.

    Crash-atomic: touched buckets are staged to a tmp dir, untouched
    buckets hardlinked (bit-identical, zero copy), and the whole table
    committed by :mod:`atomic_dir` snapshot swap — a crash at any point
    leaves the table readable with either the old or the new snapshot,
    never a mix and never a missing bucket. Duplicate keys in ``updates``
    raise (Iceberg MERGE INTO errors on multiple matching source rows).
    """
    import os
    import shutil

    from docling_ibm_models_spark.pipeline import atomic_dir

    atomic_dir.recover(path, "merge")  # repair any interrupted prior merge

    up = updates.withColumn(PART_COL, bucket_of(F.col(key), num_buckets))
    touched = {int(r[PART_COL]) for r in up.select(PART_COL).distinct().collect()}
    if not touched:
        return MergeReport(0, 0, 0)

    # partition-pruned read: only the buckets receiving updates
    current = spark.read.parquet(path).where(F.col(PART_COL).isin(list(touched)))
    # report counts in ONE action (vs a count() per side): n_up = update
    # rows, n_keys guards source-duplicate keys, matched = keys that hit
    stats = (
        up.select(key)
        .join(current.select(key).distinct().withColumn("__matched", F.lit(1)), key, "left")
        .agg(
            F.count(F.lit(1)).alias("n_up"),
            F.countDistinct(key).alias("n_keys"),
            F.coalesce(F.sum("__matched"), F.lit(0)).alias("matched"),
        )
        .collect()[0]
    )
    if stats.n_up != stats.n_keys:
        raise ValueError(
            f"merge_upsert: updates contain duplicate '{key}' values "
            f"({stats.n_up} rows, {stats.n_keys} distinct keys) — MERGE "
            "requires at most one source row per key (Iceberg MERGE INTO "
            "errors on multiple matches); deduplicate first"
        )

    survivors = current.join(up.select(key), key, "left_anti")
    merged = survivors.unionByName(up)

    # stage the rewritten buckets, then assemble the full new snapshot
    stage = path.rstrip("/") + ".merge_stage"
    tmp = path.rstrip("/") + ".merge_tmp"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        merged.write.mode("overwrite").partitionBy(PART_COL).parquet(stage)
        os.makedirs(tmp)
        for entry in os.listdir(path):
            if entry.startswith(f"{PART_COL}=") and int(entry.split("=", 1)[1]) in touched:
                continue  # replaced below
            atomic_dir.link_tree(os.path.join(path, entry), os.path.join(tmp, entry))
        for entry in os.listdir(stage):
            if entry.startswith(f"{PART_COL}="):
                os.rename(os.path.join(stage, entry), os.path.join(tmp, entry))
        atomic_dir.swap(path, tmp, "merge")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    return MergeReport(
        buckets_touched=len(touched),
        rows_updated=int(stats.matched),
        rows_inserted=int(stats.n_up - stats.matched),
    )
