"""MERGE/upsert: updates win on key collision, new keys insert, and —
the scale property — buckets without updates are neither read nor
rewritten (their files stay bit-for-bit untouched on disk)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from docling_ibm_models_spark.pipeline.merge import (
    PART_COL,
    merge_upsert,
    write_merge_table,
)

from .conftest import SF_SMALL

N_BUCKETS = 8


def _file_state(path):
    return {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/{PART_COL}=*/*.parquet")
    }


def test_merge_upsert_semantics_and_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    write_merge_table(docs, path, key="doc_id", num_buckets=N_BUCKETS)
    before_files = _file_state(path)
    n0 = spark.read.parquet(path).count()

    # updates: rewrite text for 10 existing docs, insert 5 new ones
    updates = spark.createDataFrame(
        [(i, f"UPDATED-{i}", "en") for i in range(10)]
        + [(100000 + i, f"NEW-{i}", "de") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    report = merge_upsert(spark, path, updates, key="doc_id", num_buckets=N_BUCKETS)
    assert report.rows_updated == 10
    assert report.rows_inserted == 5

    after = spark.read.parquet(path)
    assert after.count() == n0 + 5
    got = {r.doc_id: r.text for r in after.where(F.col("doc_id") < 10).collect()}
    assert got == {i: f"UPDATED-{i}" for i in range(10)}
    assert after.where(F.col("doc_id") >= 100000).count() == 5
    # no duplicate keys after the merge
    assert after.select("doc_id").distinct().count() == after.count()

    # partition pruning: buckets that received no updates kept their
    # ORIGINAL files (same path, size, mtime — never rewritten)
    touched = {
        r[PART_COL]
        for r in updates.withColumn(
            PART_COL,
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_BUCKETS)).cast("int"),
        )
        .select(PART_COL)
        .distinct()
        .collect()
    }
    assert len(touched) < N_BUCKETS, "fixture must leave some buckets untouched"
    after_files = _file_state(path)
    for f, state in before_files.items():
        bucket = int(f.split(f"{PART_COL}=")[1].split("/")[0])
        if bucket not in touched:
            assert after_files.get(f) == state, f"untouched bucket rewritten: {f}"


def test_merge_empty_updates_is_noop(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    write_merge_table(docs, path, key="doc_id", num_buckets=4)
    empty = docs.where(F.lit(False))
    report = merge_upsert(spark, path, empty, key="doc_id", num_buckets=4)
    assert (report.buckets_touched, report.rows_updated, report.rows_inserted) == (0, 0, 0)


def test_merge_duplicate_update_keys_raise(spark, tmp_path):
    import pytest

    path = str(tmp_path / "tbl")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    write_merge_table(docs, path, key="doc_id", num_buckets=N_BUCKETS)
    dup = spark.createDataFrame(
        [(1, "A", "en"), (1, "B", "en")], "doc_id long, text string, lang string"
    )
    before = _file_state(path)
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(spark, path, dup, key="doc_id", num_buckets=N_BUCKETS)
    # the failed merge must not have touched the table
    assert _file_state(path) == before


def test_merge_crash_mid_commit_leaves_table_readable(spark, tmp_path, monkeypatch):
    """Kill the commit between the two snapshot renames: the in-process
    rollback restores the original; a hard crash (no rollback) is repaired
    by the recover() the next merge performs on entry. Either way the
    table is always readable with a complete snapshot."""
    import pytest

    from docling_ibm_models_spark.pipeline import atomic_dir

    path = str(tmp_path / "tbl")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    write_merge_table(docs, path, key="doc_id", num_buckets=N_BUCKETS)
    n0 = spark.read.parquet(path).count()
    updates = spark.createDataFrame(
        [(i, f"UPDATED-{i}", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )

    # in-process failure of the second rename → rollback to the original
    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        if dst == path and src.endswith(".merge_tmp"):
            raise OSError("simulated crash at commit")
        return real_rename(src, dst)

    monkeypatch.setattr(atomic_dir.os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        merge_upsert(spark, path, updates, key="doc_id", num_buckets=N_BUCKETS)
    monkeypatch.setattr(atomic_dir.os, "rename", real_rename)
    tbl = spark.read.parquet(path)
    assert tbl.count() == n0  # old snapshot intact
    assert tbl.where("doc_id = 0").collect()[0].text != "UPDATED-0"

    # hard crash between the renames: dir absent, bak complete → recover
    bak = path + ".merge_bak"
    real_rename(path, bak)
    assert not os.path.exists(path)
    report = merge_upsert(spark, path, updates, key="doc_id", num_buckets=N_BUCKETS)
    assert report.rows_updated == 5
    tbl = spark.read.parquet(path)
    assert tbl.count() == n0
    assert tbl.where("doc_id = 0").collect()[0].text == "UPDATED-0"
