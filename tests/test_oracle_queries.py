"""Driver-style correctness harness: every queries() entry vs its DuckDB
oracle at sf0.01 — row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

from docling_ibm_models_spark.plans.queries import ORACLES, QUERIES

from .conftest import SF_MED

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_MED}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, int):
        return v
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 4)
    except Exception:
        pass
    return str(v)


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_MED)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, like the driver
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset = _rows_to_set(scols, srows)
    dset = _rows_to_set(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in dset][:5]
        diff_d = [r for r in dset if r not in sset][:5]
        raise AssertionError(f"{name}: value mismatch\nspark-only={diff_s}\nduck-only={diff_d}")


def test_shingle_tokenization_matches_oracle_on_hostile_whitespace(spark, duck):
    """The Arrow shingling UDF must mirror regexp_split_to_array(trim(
    lower(text)), '\\s+') even for leading \\n/\\t (trim strips SPACES
    only, so a leading non-space whitespace yields an empty first token —
    a plain str.split() drops it and diverges)."""
    from docling_ibm_models_spark.plans import queries as Q

    rows = [
        (0, "\nalpha beta gamma delta"),
        (1, "\talpha beta gamma delta"),
        (2, "  alpha beta gamma delta  "),
        (3, "alpha\nbeta gamma\tdelta epsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: sorted(r.shingles)
        for r in Q._shingles_spark(docs).collect()
    }
    con = duck.cursor()
    con.execute("CREATE OR REPLACE TABLE _adv(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO _adv VALUES (?, ?)", rows)
    sql = Q._SHINGLES_SQL.replace("FROM documents", "FROM _adv")
    exp = {
        d: sorted(s)
        for d, s in con.execute(f"SELECT doc_id, shingles FROM ({sql})").fetchall()
    }
    assert got == exp


def test_corpus_whitespace_invariant():
    """ADVICE r5: Java regex \\s (Spark) matches U+000B vertical tab while
    DuckDB's RE2 \\s does not, so every pinned '\\s+' tokenizer pair agrees
    only while the corpus carries no whitespace outside [ \\t\\n\\r\\f].
    The oracle SQL text is frozen; assert the corpus invariant instead —
    at every local SF, no document may contain \\x0B or any other
    non-ASCII whitespace the two engines would split differently."""
    import re

    import pyarrow.parquet as pq

    hostile = re.compile(r"[^\S \t\n\r\f]")  # whitespace NOT in the safe set
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        texts = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["text"]
        )["text"].to_pylist()
        bad = [t[:40] for t in texts if t and hostile.search(t)]
        assert not bad, f"{sf}: {len(bad)} docs with engine-divergent whitespace"
