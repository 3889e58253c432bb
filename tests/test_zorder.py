"""Z-order clustered rewrite: parquet-footer evidence that per-file
min-max spans shrink on BOTH clustering columns (the property file/row-
group skipping depends on), with row content unchanged."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from docling_ibm_models_spark.pipeline.zorder import write_zordered

from .conftest import SF_MED


def _file_spans(path: str, cols: list[str]) -> dict[str, list[float]]:
    """Per-column mean (max-min) footer span across the dir's files."""
    spans: dict[str, list[float]] = {c: [] for c in cols}
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, fn))
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        for c in cols:
            spans[c].append(float(hi[c] - lo[c]))
    return spans


def test_zorder_shrinks_file_spans_and_preserves_content(spark, tmp_path):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    cols = ["l_partkey", "l_extendedprice"]

    shuffled = str(tmp_path / "shuffled")
    # control: hash-random order, same file count
    li.repartition(16, F.col("l_orderkey")).write.parquet(shuffled)
    zordered = str(tmp_path / "zordered")
    write_zordered(li, zordered, *cols, files=16)

    base = _file_spans(shuffled, cols)
    z = _file_spans(zordered, cols)
    for c in cols:
        mean_base = sum(base[c]) / len(base[c])
        mean_z = sum(z[c]) / len(z[c])
        assert mean_z < mean_base / 2, (
            f"{c}: z-order span {mean_z} not <2x better than {mean_base}"
        )

    # content identical (order-insensitive)
    a = spark.read.parquet(shuffled)
    b = spark.read.parquet(zordered)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_null_rank_and_self_overwrite_guard(spark, tmp_path):
    """NULLs rank 0 (NULLS-FIRST clustering, explicit) and writing back
    into an input path is refused."""
    import pytest
    from pyspark.sql import functions as F

    from docling_ibm_models_spark.pipeline.zorder import _norm16, write_zordered

    df = spark.createDataFrame(
        [(None, 1.0), (0.0, 2.0), (100.0, 3.0)], "a double, b double"
    )
    ranks = df.select(
        _norm16(F.col("a"), F.lit(0.0), F.lit(100.0)).alias("r")
    ).collect()
    assert [r.r for r in ranks] == [0, 0, 65535]

    src = str(tmp_path / "zsrc")
    df.write.parquet(src)
    loaded = spark.read.parquet(src)
    with pytest.raises(ValueError, match="overlaps an input path"):
        write_zordered(loaded, src, "a", "b")
