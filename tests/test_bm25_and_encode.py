"""corpus_bm25_topk / corpus_bpe_encode vs sequential pure-Python
reference implementations over the same parquet — independent of the
DuckDB oracles (which tests/test_oracle_queries.py already runs)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from docling_ibm_models_spark.plans.queries import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BPE_ENCODE_MERGES,
    QUERIES,
)

from .conftest import SF_SMALL


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/documents.parquet")


def _tokens(text: str) -> list[str]:
    return [w for w in str(text).lower().split() if w]


def test_bm25_matches_sequential_reference(spark):
    docs = _docs()
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter(
        term
        for t in toks.values()
        for term in set(t) & set(_BM25_TERMS)
    )
    exp = []
    for doc_id, t in toks.items():
        tf = Counter(w for w in t if w in _BM25_TERMS)
        if not tf:
            continue
        dl = len(t)
        s = sum(
            math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            * c
            * (_BM25_K1 + 1)
            / (c + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl))
            for term, c in tf.items()
        )
        exp.append((doc_id, len(tf), dl, round(s, 6)))
    exp.sort(key=lambda r: (-r[3], r[0]))
    got = [tuple(r) for r in QUERIES["corpus_bm25_topk"](spark, SF_SMALL).collect()]
    assert got == exp[:20]


def _ref_encode(word: str) -> int:
    syms = list(word)
    for bl, br in _BPE_ENCODE_MERGES:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == bl and s == br:
                out[-1] = bl + br
            else:
                out.append(s)
        syms = out
    return len(syms)


def test_bpe_encode_cascaded_priorities():
    """The rule chain s→sp→spa→spar→spark and j+o/i+n/jo+in must fuse
    'spark' and 'join' to single tokens — later rules consume symbols
    earlier rules created."""
    assert _ref_encode("spark") == 1
    assert _ref_encode("join") == 1
    assert _ref_encode("spa") == 1  # stops mid-chain
    assert _ref_encode("jon") == 2  # jo + n (i+n never fires without i)
    assert _ref_encode("tata") == 2  # repeated-pair greedy scan


def test_bpe_encode_matches_sequential_reference(spark):
    docs = _docs()
    exp = {}
    for r in docs.itertuples():
        t = _tokens(r.text)
        if not t:
            continue
        exp[r.doc_id] = (
            len(t),
            sum(len(w) for w in t),
            sum(_ref_encode(w) for w in t),
        )
    got = {
        r.doc_id: (r.n_words, r.n_chars_tok, r.n_tokens_bpe)
        for r in QUERIES["corpus_bpe_encode"](spark, SF_SMALL).collect()
    }
    assert got == exp


def test_dsir_importance_matches_sequential_reference(spark):
    """DSIR hashed-LM log-ratio weights vs a pure-Python reference
    (bucket hash = the repo's cross-dialect md5 h32)."""
    import hashlib
    from collections import defaultdict

    from docling_ibm_models_spark.plans.queries import (
        _DSIR_BUCKETS,
        _DSIR_TARGET,
    )

    def bucket(w: str) -> int:
        h = int(hashlib.md5(("dsir|" + w).encode()).hexdigest()[:8], 16)
        return h % _DSIR_BUCKETS

    docs = _docs()
    ct: dict[int, int] = defaultdict(int)
    cr: dict[int, int] = defaultdict(int)
    per_doc: dict[int, Counter] = {}
    for r in docs.itertuples():
        bs = Counter(bucket(w) for w in _tokens(r.text))
        if bs:
            per_doc[r.doc_id] = bs
        tgt = r.source == _DSIR_TARGET
        for b, c in bs.items():
            (ct if tgt else cr)[b] += c
    nt, nr = sum(ct.values()), sum(cr.values())

    def lw(b: int) -> float:
        return math.log((ct[b] + 1) / (nt + _DSIR_BUCKETS)) - math.log(
            (cr[b] + 1) / (nr + _DSIR_BUCKETS)
        )

    exp = {
        doc_id: (
            sum(bs.values()),
            round(sum(c * lw(b) for b, c in bs.items()), 6),
        )
        for doc_id, bs in per_doc.items()
    }
    got = {
        r.doc_id: (r.n_tokens, r.log_importance)
        for r in QUERIES["corpus_dsir_importance"](spark, SF_SMALL).collect()
    }
    assert got == exp


def test_phrase_search_matches_sequential_reference(spark):
    """Positional posting intersection vs a naive per-doc scan, including
    the overlapping-occurrence semantics substring counting misses."""
    from docling_ibm_models_spark.plans.queries import _PHRASES

    docs = _docs()
    exp = {}
    for r in docs.itertuples():
        t = _tokens(r.text)
        for p in _PHRASES:
            ws = p.split()
            hits = [
                i for i in range(len(t) - len(ws) + 1)
                if t[i : i + len(ws)] == ws
            ]
            if hits:
                exp[(p, r.doc_id)] = (len(hits), hits[0] + 1)
    got = {
        (r.phrase, r.doc_id): (r.n_occurrences, r.first_pos)
        for r in QUERIES["corpus_phrase_search"](spark, SF_SMALL).collect()
    }
    assert got == exp


def test_bpe_fuse_randomized_against_reference(spark):
    """One Spark job folds a random rule chain over 400 random words;
    every resulting symbol sequence must equal the sequential reference
    encoder — including pathological repeated-pair runs."""
    import random

    from pyspark.sql import functions as F

    from docling_ibm_models_spark.plans.queries import _bpe_fuse

    rng = random.Random(20260819)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 12)))
             for _ in range(400)]
    words += ["abababab", "aaaa" "bbbb", "abcabcabc", "a", "dcba" * 3]
    # bl == br is fine for the FOLD itself (strict greedy left-to-right);
    # only the two-pass-replace ORACLE requires bl != br (guarded at
    # import in queries.py) — so include one to pin the fold's semantics.
    rules = [("a", "b"), ("ab", "c"), ("d", "a"), ("ab", "ab"), ("c", "d")]

    def ref(word):
        syms = list(word)
        for bl, br in rules:
            out = []
            for s in syms:
                if out and out[-1] == bl and s == br:
                    out[-1] = bl + br
                else:
                    out.append(s)
            syms = out
        return syms

    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    df = spark.createDataFrame([(w,) for w in set(words)], "w string").select(
        "w", chars.alias("syms")
    )
    for bl, br in rules:
        df = df.select("w", _bpe_fuse("syms", bl, br).alias("syms"))
    got = {r.w: list(r.syms) for r in df.collect()}
    assert got == {w: ref(w) for w in set(words)}


def test_phrase_search_overlapping_occurrences(spark, tmp_path, monkeypatch):
    """Self-overlapping phrases on a synthetic corpus: 'a a a' occurs 3
    times in 'a a a a a' (positions 1, 2, 3 — overlapping), which is the
    semantics the position-chain join claims and substring counting
    cannot produce."""
    import pandas as pd

    import docling_ibm_models_spark.plans.queries as q

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a a a a a",          # 3 overlapping occurrences of 'a a a'
                "a a b a a a",        # 1 (positions 4..6)
                "x y z",              # 0
                "a b a b a b a",      # 'a b a' overlapping at 1, 3, 5
            ],
            "lang": ["en"] * 4,
            "source": ["src0"] * 4,
            "n_chars": [9, 11, 5, 13],
        }
    )
    sf = tmp_path / "sfsyn"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet")
    monkeypatch.setattr(q, "_PHRASES", ("a a a", "a b a"))
    got = {
        (r.phrase, r.doc_id): (r.n_occurrences, r.first_pos)
        for r in q.corpus_phrase_search(spark, str(sf)).collect()
    }
    assert got == {
        ("a a a", 1): (3, 1),
        ("a a a", 2): (1, 4),
        ("a b a", 2): (1, 2),
        ("a b a", 4): (3, 1),
    }
