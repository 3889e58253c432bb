"""Exact stratified top-k (operators/stratified.py): must equal the naive
per-group row_number window byte-for-byte while the plan's only window is
partitioned by (group, hash-bucket) — never a whole-group single task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from docling_ibm_models_spark.operators.stratified import stratified_hash_topk

from .conftest import SF_SMALL


def _naive(df, group_col, key_col, k, seed):
    hx = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(hx)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_naive_window_on_documents(spark):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    got = _rows(stratified_hash_topk(d, "lang", "doc_id", 40, seed="strat|"))
    exp = _rows(_naive(d, "lang", "doc_id", 40, "strat|"))
    assert got == exp
    # exactly 40 per lang (every lang has >40 docs at sf0.001)
    per = {}
    for _, lang, _ in got:
        per[lang] = per.get(lang, 0) + 1
    assert set(per.values()) == {40}


def test_k_exceeding_group_size_returns_whole_group(spark):
    rows = [(i, "a" if i < 7 else "b") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, g string").repartition(5)
    got = _rows(stratified_hash_topk(df, "g", "id", 10))
    exp = _rows(_naive(df, "g", "id", 10, ""))
    assert got == exp
    assert sum(1 for _, g in got if g == "a") == 7  # whole small group
    assert sum(1 for _, g in got if g == "b") == 10


def test_k_zero_and_k_negative_empty(spark):
    df = spark.createDataFrame([(1, "a")], "id long, g string")
    assert stratified_hash_topk(df, "g", "id", 0).count() == 0
    assert stratified_hash_topk(df, "g", "id", -3).count() == 0


def test_boundary_bucket_exercised_with_coarse_buckets(spark):
    """bucket_chars=1 (16 buckets) over 400 rows x 3 groups forces a real
    boundary bucket in every group; selection must stay exact."""
    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string").repartition(7)
    got = _rows(stratified_hash_topk(df, "g", "id", 25, bucket_chars=1))
    exp = _rows(_naive(df, "g", "id", 25, ""))
    assert got == exp


def test_deterministic_across_partitioning(spark):
    rows = [(i, "g%d" % (i % 4)) for i in range(500)]
    a = spark.createDataFrame(rows, "id long, g string").repartition(3)
    b = spark.createDataFrame(rows, "id long, g string").repartition(17, "g")
    ra = _rows(stratified_hash_topk(a, "g", "id", 50, seed="s|"))
    rb = _rows(stratified_hash_topk(b, "g", "id", 50, seed="s|"))
    assert ra == rb and len(ra) == 200


def test_only_window_is_bucket_partitioned(spark):
    """The plan's window must be partitioned by (group, _hb) — the bounded
    boundary bucket — never the bare group (a whole-language single task
    at corpus scale)."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang"
    )
    plan = (
        stratified_hash_topk(d, "lang", "doc_id", 40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    saw_window = False
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            saw_window = True
            assert "_hb" in line, f"window not bucket-partitioned: {line[:160]}"
    assert saw_window, "expected the boundary-bucket window in the plan"


def test_registered_query_matches_oracle_shape(spark):
    from docling_ibm_models_spark.plans.queries import QUERIES

    out = QUERIES["corpus_stratified_sample"](spark, SF_SMALL)
    assert out.columns == ["doc_id", "lang", "n_chars"]
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.lang] = per.get(r.lang, 0) + 1
    # sf0.001: every lang has fewer than 100 docs except en (193) —
    # min(k, group) semantics visible in one result
    assert per["en"] == 100
    assert all(v < 100 for k_, v in per.items() if k_ != "en")
