"""Bucketed (co-located) table helpers — SURVEY.md §4 shuffle avoidance.

At 100 TB, repeated joins on the same key (e.g. url joins between doc_text
snapshots, or dedup candidate tables) should not re-shuffle both sides
every run. Writing both sides bucketed+sorted on the join key lets Spark
plan a shuffle-free sort-merge join (asserted in
tests/test_bucketing.py by the absence of Exchange in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed managed table (spark warehouse)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
