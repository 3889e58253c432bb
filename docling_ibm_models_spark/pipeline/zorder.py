"""Z-order clustered rewrite — the sort-order half of Iceberg's
``rewrite_data_files`` (compaction.py is the bin-packing half).

Parquet scans skip row groups / files whose footer min-max ranges exclude
the query predicate. That only helps if values are CLUSTERED: after a
random-order write, every file's [min, max] for every column spans the
whole domain and nothing is ever skipped. Sorting by one column fixes
that column only; interleaving the bits of TWO columns (the z-value /
Morton code) gives every file a narrow range on BOTH — the standard
multi-dimensional clustering trick (Iceberg ``sort_order(zorder(a, b))``,
Databricks OPTIMIZE ZORDER BY).

The z-value here is a pure codegen expression (bit interleave via
shift-and-or over 16-bit normalized ranks), the clustering is one
``repartitionByRange`` on it (a range shuffle — the rewrite's one-time
cost) plus an in-partition sort, and the evidence is read straight from
the parquet footers: tests assert per-file min-max spans of BOTH columns
shrink by >2× vs the unclustered write while the row content stays
byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16


def _norm16(col: Column, lo: Column, hi: Column) -> Column:
    """Normalize a numeric column to a 16-bit integer rank position.
    NULL placement is EXPLICIT: NULLs rank 0 (clustered with the minimum,
    like SQL NULLS FIRST) rather than falling through F.least's
    NULL-skipping to rank 65535 — otherwise NULL-heavy columns silently
    degrade min-max skipping on the top-of-range files."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(F.lit(0.0))
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit((1 << _BITS) - 1),
            F.floor(frac * ((1 << _BITS) - 1)).cast("long"),
        )
    )


def zvalue(a16: Column, b16: Column) -> Column:
    """Interleave two 16-bit values into a 32-bit Morton code (a takes the
    even bit positions) — a fold of shifts and ORs, pure codegen."""
    z = F.lit(0).cast("long")
    for i in range(_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a16, i) % 2, 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b16, i) % 2, 2 * i + 1))
    return z


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, files: int = 8
) -> None:
    """Rewrite ``df`` clustered by zorder(col_a, col_b) into ``files``
    parquet files. The min/max per column used for rank normalization are
    computed in one tiny agg and joined back as a broadcast 1-row frame
    (no driver collect of data rows — the two scalars ARE driver-visible,
    as Iceberg's sort-order planning metadata would be). Refuses an
    output path that overlaps an input path of ``df`` (an overwrite into
    a path being scanned destroys the data mid-job)."""
    import os

    norm_out = os.path.abspath(path)
    for p in df.inputFiles():
        ap = os.path.abspath(p.replace("file:", ""))
        if ap == norm_out or ap.startswith(norm_out + os.sep):
            raise ValueError(
                f"write_zordered: output path {path} overlaps an input path of df"
            )
    bounds = df.agg(
        F.min(col_a).alias("_alo"), F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"), F.max(col_b).alias("_bhi"),
    )
    z = zvalue(
        _norm16(F.col(col_a), F.col("_alo"), F.col("_ahi")),
        _norm16(F.col(col_b), F.col("_blo"), F.col("_bhi")),
    ).alias("_z")
    out = (
        df.crossJoin(F.broadcast(bounds))
        .select("*", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
    )
    out.write.mode("overwrite").parquet(path)
