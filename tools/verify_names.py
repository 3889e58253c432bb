"""Targeted strict oracle check for NAMED queries (round-6 optimization
workflow): same dtype-family + exact-raw-value comparison as
tools/driver_sim.py, but over an explicit query-name list and a selectable
SF dir, so each optimized query is re-proven against its (frozen) oracle
before moving on.

Run: python tools/verify_names.py [--sf /root/testdata/sf0.01] name [name...]
"""
from __future__ import annotations

import sys

import duckdb

from docling_ibm_models_spark.plans.queries import ORACLES, QUERIES
from docling_ibm_models_spark.session import get_spark

sys.path.insert(0, "tools")
from driver_sim import TABLES, dtype_family  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        sdf = QUERIES[name](spark, sf).toPandas()
        if name not in ORACLES:
            print(f"WARN {name}: no oracle; rows={len(sdf)}")
            continue
        ddf = con.execute(ORACLES[name]).df()
        issues = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            issues.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        elif len(sdf) != len(ddf):
            issues.append(f"rows {len(sdf)} vs {len(ddf)}")
        else:
            for c in sdf.columns:
                fs, fd = dtype_family(sdf[c]), dtype_family(ddf[c])
                if fs != fd:
                    issues.append(f"dtype[{c}]: spark={fs} duck={fd}")
            if not issues:
                s = sdf[sorted(sdf.columns)]
                d = ddf[sorted(ddf.columns)]
                srows = sorted(map(tuple, s.itertuples(index=False)))
                drows = sorted(map(tuple, d.itertuples(index=False)))
                if srows != drows:
                    diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
                    issues.append(f"raw values differ, e.g. {diff}")
        if issues:
            print(f"RED  {name}: " + "; ".join(issues))
            bad += 1
        else:
            print(f"ok   {name} rows={len(sdf)} sf={sf}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
