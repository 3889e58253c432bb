"""Bucketed co-located join: plan-level proof that bucketing removes the
join shuffle (and the sort), plus content equality with the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from docling_ibm_models_spark.pipeline.bucketing import (
    cocluster_join,
    write_bucketed,
)

from .conftest import SF_MED
from .test_plan_quality import plan_of


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    td = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_MED}/orders.parquet")
    customer = spark.read.parquet(f"{SF_MED}/customer.parquet")
    write_bucketed(orders, "orders_b", str(td / "orders_b"), "o_custkey", 8)
    # same key domain, same bucket count -> co-located
    customer = customer.withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(customer, "customer_b", str(td / "customer_b"), "o_custkey", 8)
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_is_shuffle_and_sort_free(spark, bucketed_tables):
    left, right = bucketed_tables
    # the bucketing win is for big⋈big joins; at sf0.01 customer fits the
    # broadcast threshold, so disable it to surface the at-scale plan shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cocluster_join(spark, left, right, "o_custkey")
        plan = plan_of(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan, plan[:600]
    assert "Exchange" not in plan, "bucketed join still shuffles"
    # sortBy makes each bucket pre-sorted; no per-side Sort needed
    assert plan.count("Sort ") == 0 or "Sort (" not in plan.split("SortMergeJoin")[0], plan[:600]
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, (
        "scan did not report a bucketed read"
    )


def test_unbucketed_twin_shuffles_twice(spark):
    orders = spark.read.parquet(f"{SF_MED}/orders.parquet")
    customer = spark.read.parquet(f"{SF_MED}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    # disable auto-broadcast so the control shows the un-bucketed
    # SortMergeJoin shape (customer is small enough to broadcast here;
    # at 10^12 rows it would not be)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(orders.join(customer, "o_custkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert plan.count("Exchange") >= 2, plan[:600]


def test_bucketed_join_content_equal(spark, bucketed_tables):
    left, right = bucketed_tables
    j = cocluster_join(spark, left, right, "o_custkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s"),
    )
    orders = spark.read.parquet(f"{SF_MED}/orders.parquet")
    customer = spark.read.parquet(f"{SF_MED}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s"),
    )
    assert j.collect() == plain.collect()


def test_write_bucketed_guards(spark, tmp_path):
    """Destructive-overwrite guards: an existing same-name table at a
    DIFFERENT location is never silently repointed, and an output path
    overlapping df's input paths is refused."""
    import pytest

    from docling_ibm_models_spark.pipeline.bucketing import write_bucketed

    df = spark.range(10).withColumnRenamed("id", "k")
    p1 = str(tmp_path / "t1")
    write_bucketed(df, "guard_tbl", p1, "k", buckets=2)
    with pytest.raises(ValueError, match="already exists at"):
        write_bucketed(df, "guard_tbl", str(tmp_path / "t2"), "k", buckets=2)
    # same location is allowed (a legitimate refresh)
    write_bucketed(df, "guard_tbl", p1, "k", buckets=2)

    src = str(tmp_path / "bsrc")
    df.write.parquet(src)
    loaded = spark.read.parquet(src)
    with pytest.raises(ValueError, match="overlaps an input path"):
        write_bucketed(loaded, "guard_tbl2", src, "k", buckets=2)
    spark.sql("DROP TABLE IF EXISTS guard_tbl")
