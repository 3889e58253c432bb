#!/usr/bin/env python
"""Round-6 measurement harness (guide §1): per-query noop-sink walls and
``explain("formatted")`` capture for the declared query registry.

This file is SEPARATE from the frozen ``bench.py`` (driver contract): it
exists so optimization work can isolate one query at a time, run it with a
labelled job, and persist the physical plan next to the timing evidence.

Usage:
    python bench_extra.py time  [query ...]      # walls (min of N passes)
    python bench_extra.py plan  [query ...]      # plans/r06/<q>_{tag}.txt
    python bench_extra.py both  [query ...]
Env:
    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)
    BENCH_EXTRA_PASSES  (default 2)
    BENCH_EXTRA_TAG     (default "before") — plan filename suffix
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("BENCH_EXTRA_PASSES", "2"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _spark():
    from docling_ibm_models_spark.session import get_spark

    return get_spark(app_name="bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    from docling_ibm_models_spark.plans.queries import QUERIES

    names = sys.argv[2:] or list(QUERIES)
    spark = _spark()
    sc = spark.sparkContext
    walls: dict[str, float] = {}
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in names:
        fn = QUERIES[name]
        if mode in ("plan", "both"):
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(plan)
        if mode in ("time", "both"):
            best = None
            for i in range(PASSES):
                sc.setJobDescription(f"{name} pass {i}")
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                w = time.monotonic() - t0
                best = w if best is None else min(best, w)
            sc.setJobDescription(None)
            walls[name] = round(best, 3)
            print(f"[wall] {name}: {walls[name]}", file=sys.stderr, flush=True)
    spark.stop()
    if walls:
        print(json.dumps({"sf": SF_DIR, "passes": PASSES, "walls": walls}))


if __name__ == "__main__":
    main()
