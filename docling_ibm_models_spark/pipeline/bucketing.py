"""Bucketed co-located joins — the shuffle-elimination tool for repeated
big-table⋈big-table joins (build-brief "Partitioning & shuffle: bucketing
for co-located joins").

A fact⋈fact join on a key neither side is partitioned by costs TWO
shuffles every time it runs. Writing both sides bucketed (and sorted)
by the join key with the SAME bucket count makes every later join
shuffle-free AND sort-free: each task merge-joins bucket i of A with
bucket i of B straight off the scan. At 10^12 rows this converts the
dominant repeated cost of a curation pipeline (url-keyed joins between
page-level tables: extraction output ⋈ dedup verdicts ⋈ quality scores)
into pure narrow scans — the local analogue of Iceberg's bucket
partition transform (``bucket(N, url)``).

Mechanics (Spark-specific, documented because they are easy to get wrong):

* bucketing metadata lives in the session catalog, so the write is
  ``bucketBy(...).sortBy(...).option("path", ...).saveAsTable(name)`` —
  an EXTERNAL table at an explicit path; ``spark.table(name)`` restores
  the bucketed scan. Reading the bare parquet path forgets bucketing.
* both sides must have the same bucket count on the join key, and
  ``spark.sql.sources.bucketing.enabled`` must be on (default).
* the bucket function is Murmur3 on the key — the same family the
  engine's ``salt_partition`` uses, so bucket layouts are stable across
  writes and sessions.
* AQE leaves bucketed joins alone (no runtime re-partitioning to undo).

The demo/test pair (tests/test_bucketing.py) asserts the physical plan:
bucketed⋈bucketed has a SortMergeJoin with ZERO Exchange AND zero
per-side Sort (the sortBy makes scans pre-sorted within buckets), while
the identical un-bucketed join carries two Exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``.

    ``buckets`` should be sized so one bucket of the LARGER table fits an
    executor's scan partition budget (at 10^12 rows: thousands of buckets;
    here 8 keeps the local demo readable). Joins between tables bucketed
    with the same (key, buckets) are shuffle-free.

    Guards (overwrite is destructive): refuses to silently repoint an
    EXISTING catalog table of the same name at a different location, and
    refuses an output path that is also an input path of ``df`` (a
    self-overwrite would destroy the data mid-scan)."""
    spark = df.sparkSession
    import os

    norm_out = os.path.abspath(path)
    in_paths = df.inputFiles()
    if any(os.path.abspath(p.replace("file:", "")).startswith(norm_out + os.sep)
           or os.path.abspath(p.replace("file:", "")) == norm_out
           for p in in_paths):
        raise ValueError(f"write_bucketed: output path {path} overlaps an input path of df")
    if spark.catalog.tableExists(name):
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
            .where(F.col("col_name") == "Location")
            .select("data_type")
            .collect()
        )
        if loc and loc[0][0].replace("file:", "") != norm_out:
            raise ValueError(
                f"write_bucketed: table {name} already exists at {loc[0][0]}, "
                f"refusing to repoint it to {path}; drop it explicitly first"
            )
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode(mode)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — REQUIRED to keep the bucketed-scan property (a plain
    ``spark.read.parquet(path)`` of the same files loses it)."""
    return spark.table(name)


def cocluster_join(
    spark: SparkSession, left_name: str, right_name: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The plan this
    produces (and the test asserts) is scan → SortMergeJoin with no
    Exchange and no Sort on either side."""
    left = read_bucketed(spark, left_name)
    right = read_bucketed(spark, right_name)
    return left.join(right, key)
