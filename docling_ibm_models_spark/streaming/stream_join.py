"""Watermarked stream-stream join (SURVEY.md §2.7 / Structured Streaming
capability set): attribute each `purchase` to the same user's preceding
`click` within a bounded event-time window.

At crawl/event scale this is THE pattern for sessionless attribution:
both sides carry watermarks, the join condition bounds the event-time
distance, and Spark evicts state once the watermark passes the bound —
state stays O(events within the window), never O(stream). The batch twin
(`events_click_purchase_join` in plans/queries.py) is DuckDB-oracle-checked
and the streaming test asserts equality against it on a bounded drain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"


def attribute_purchases(events_stream: DataFrame) -> DataFrame:
    """event stream → (user_id, click_id, purchase_id, gap_s) inner
    stream-stream join: purchase joins the same user's clicks that happened
    in the preceding 30 minutes (inclusive bounds, µs precision)."""
    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
        "inner",
    )
    gap_us = F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
    return joined.select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.round(gap_us / 1_000_000.0, 6).alias("gap_s"),
    )
