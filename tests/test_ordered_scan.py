"""Distributed global-order ranking scan (operators/ordered_scan.py):
must equal the single-partition SQL global window byte-for-byte while
keeping every WindowExec partitioned (no 'No Partition Defined' plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from docling_ibm_models_spark.operators.ordered_scan import global_value_rank_scan


def _reference(df, n_tiles=4):
    w = Window.orderBy(F.col("total").desc(), "user_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        "user_id",
        "total",
        F.rank().over(w).cast("long").alias("rnk"),
        F.ntile(n_tiles).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.coalesce(F.col("total") - F.lag("total").over(w), F.lit(0.0)).alias(
            "gap_to_prev"
        ),
        F.sum("total").over(wrun).alias("running_total"),
    )


def _norm(rows):
    return sorted(
        (
            r.user_id,
            round(r.total, 6),
            int(r.rnk),
            int(r.quartile),
            round(r.pct_rank, 9),
            round(r.gap_to_prev, 6),
            round(r.running_total, 6),
        )
        for r in rows
    )


@pytest.mark.parametrize("n", [1, 3, 5, 97, 400])
def test_matches_global_window_reference(spark, n):
    """All five function outputs equal the single-partition reference,
    including N < n_tiles (every tile one row) and N == 1 (pct_rank 0)."""
    rows = [(i, float((i * 37) % 101) + (i % 7) * 0.25) for i in range(n)]
    df = spark.createDataFrame(rows, "user_id long, total double").repartition(8)
    got = _norm(global_value_rank_scan(df, "total", "user_id").collect())
    exp = _norm(_reference(df).collect())
    assert got == exp


def test_ties_in_value_are_broken_by_tiebreak(spark):
    """Equal totals (the pair stays a total order via user_id): rank is
    still row_number and lag/running follow the tiebreak order."""
    rows = [(i, 10.0 if i < 6 else 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "user_id long, total double").repartition(5)
    got = _norm(global_value_rank_scan(df, "total", "user_id").collect())
    exp = _norm(_reference(df).collect())
    assert got == exp


def test_no_unpartitioned_window_in_plan(spark):
    """Every Window operator in the executed plan must carry a partition
    spec — the whole point of the operator (a single-partition WindowExec
    is a one-task sort of the world at 10^12 rows)."""
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(100)], "user_id long, total double"
    )
    plan = (
        global_value_rank_scan(df, "total", "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, f"unpartitioned window: {line.strip()[:160]}"


def test_query_plans_are_window_free_or_partitioned(spark):
    """The two formerly-global-window queries: no 'No Partition Defined'
    WindowExec reachable — dense_rank_compaction is window-free,
    events_user_value_windows windows only by _pid."""
    from docling_ibm_models_spark.plans.queries import QUERIES

    from .conftest import SF_SMALL

    for name in ("dense_rank_compaction", "events_user_value_windows"):
        plan = (
            QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "_pid" in line, f"{name}: {line.strip()[:160]}"
