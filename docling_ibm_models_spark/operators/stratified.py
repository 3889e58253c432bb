"""Exact stratified top-k selection without per-group single-task windows.

The standard SQL answer to "exactly k docs per language, deterministically"
is ``row_number() OVER (PARTITION BY lang ORDER BY hash)`` — but Spark
executes each window partition in ONE task, so a 10^12-row corpus with five
languages becomes five world-sized sorts. This module is the scale path: the
classic distributed order-statistics selection, expressed as one query plan.

1. Hash every row's key (md5 — deterministic, collision-free over unique
   keys for selection purposes) and bucket it by the hash's first
   ``bucket_chars`` hex digits (16^c buckets; hex order == hash order).
2. Per-(group, bucket) counts via one map-side-combined aggregation —
   a bounded frame (groups × 16^c rows), the only full-data shuffle-free
   statistic needed.
3. Rows-before-each-bucket per group via a broadcast theta self-join over
   that tiny frame (same recombination pattern as
   :mod:`~docling_ibm_models_spark.operators.ordered_scan`).
4. Classify buckets by arithmetic alone: buckets entirely inside the top-k
   pass through with NO sort; buckets entirely outside are filtered at scan
   speed; only the single BOUNDARY bucket per group (≈ group_size / 16^c
   rows) pays a window — partitioned by (group, bucket), so its task is
   bounded at any corpus size.

Engine addition (no reference counterpart — the reference processes single
documents): exact per-stratum quotas are the data-mixture primitive of a
training-data pipeline (balancing languages/domains before tokenization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_hash_topk(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: str = "",
    bucket_chars: int = 3,
) -> DataFrame:
    """Return exactly ``min(k, group size)`` rows per ``group_col`` value —
    the k smallest by ``md5(seed || key_col)`` — with only the boundary
    bucket of each group ever entering a window. ``key_col`` must be unique
    per row (the hash is then a total order within every group); output
    columns are the input columns, order not guaranteed."""
    if k <= 0:
        return df.limit(0)
    hx = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    d = df.withColumn("_hx", hx).withColumn(
        "_hb", F.substring("_hx", 1, bucket_chars)
    )

    stats = d.groupBy(group_col, "_hb").agg(F.count(F.lit(1)).alias("_bcnt"))

    # rows before each bucket inside its group: broadcast theta self-join
    # over the bounded stats frame (groups x 16^bucket_chars tiny rows)
    a, b = stats.alias("a"), stats.alias("b")
    before = (
        a.join(
            F.broadcast(b),
            (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
            & (F.col("b._hb") < F.col("a._hb")),
            "left",
        )
        .groupBy(F.col(f"a.{group_col}").alias(group_col), F.col("a._hb"))
        .agg(
            F.first("a._bcnt").alias("_bcnt"),
            F.coalesce(F.sum("b._bcnt"), F.lit(0)).alias("_before"),
        )
    )

    j = d.join(F.broadcast(before), [group_col, "_hb"])
    full = j.filter(F.col("_before") + F.col("_bcnt") <= k)

    # at most one boundary bucket per group; its window partition holds
    # ~group_size / 16^bucket_chars rows — bounded at any scale
    wb = Window.partitionBy(group_col, "_hb").orderBy("_hx")
    boundary = (
        j.filter((F.col("_before") < k) & (F.col("_before") + F.col("_bcnt") > k))
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= k - F.col("_before"))
        .drop("_rn")
    )

    return full.unionByName(boundary).select(*df.columns)
