"""Bucketed co-located join: both sides pre-bucketed on the key → the
join plans with ZERO Exchange operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_ibm_models_spark.sources.bucketing import bucketed_join, write_bucketed

from .conftest import SF_SMALL
from .test_plan_quality import plan_of


def test_bucketed_join_is_shuffle_free(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", buckets=8
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = plan_of(joined)
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # sanity: result correct vs plain join
        plain = li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
