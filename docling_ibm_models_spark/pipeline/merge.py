"""MERGE/upsert into a hash-partitioned parquet table — the Iceberg
``MERGE INTO`` analogue over the same layout the extraction pipeline
writes (``<dir>/part_bucket=…``).

The scale-defining property is PARTITION PRUNING on both sides of the
read-modify-write: updates are bucketed by the same ``pmod(xxhash64(key),
P)`` the table is partitioned by, only the buckets that actually receive
updates are read back, merged (updates win on key collision, new keys
insert), and rewritten via dynamic partition overwrite. Buckets without
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
    ``key``): matched keys take the update row, unmatched insert."""
    up = updates.withColumn(PART_COL, bucket_of(F.col(key), num_buckets))
    touched = [r[PART_COL] for r in up.select(PART_COL).distinct().collect()]
    if not touched:
        return MergeReport(0, 0, 0)

    # partition-pruned read: only the buckets receiving updates
    current = spark.read.parquet(path).where(F.col(PART_COL).isin(touched))
    n_before = current.count()
    n_updates = up.count()
    survivors = current.join(up.select(key), key, "left_anti")
    merged = survivors.unionByName(up)
    # dynamic overwrite replaces ONLY the touched part_bucket= partitions;
    # scope the mode switch to this write (restore the caller's setting)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, None)
    spark.conf.set(mode_key, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(PART_COL).parquet(path)
    finally:
        if prev is not None:
            spark.conf.set(mode_key, prev)
        else:
            spark.conf.unset(mode_key)

    n_after = spark.read.parquet(path).where(F.col(PART_COL).isin(touched)).count()
    updated = n_before - (n_after - n_updates)
    return MergeReport(
        buckets_touched=len(touched),
        rows_updated=updated,
        rows_inserted=n_updates - updated,
    )
