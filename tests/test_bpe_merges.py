"""Distributed BPE merge training (plans/queries.py corpus_bpe_merges
helpers): pair counting and greedy left-to-right merge application must
match a sequential reference implementation exactly."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from docling_ibm_models_spark.plans.queries import (
    _bpe_apply_merge,
    _bpe_pair_counts,
)


def _ref_counts(word_freqs):
    c = Counter()
    for syms, f in word_freqs:
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += f
    return c


def _ref_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _wf_df(spark, word_freqs):
    return spark.createDataFrame(
        [(list(s), f) for s, f in word_freqs], "syms array<string>, f long"
    ).repartition(4)


WORDS = [
    (list("abab"), 3),
    (list("aaa"), 5),
    (list("aaaa"), 2),
    (list("banana"), 4),
    (list("x"), 7),  # no pairs
    (list("xabx"), 1),
]


def test_pair_counts_match_reference(spark):
    got = {
        (r.l, r.r): r.cnt
        for r in _bpe_pair_counts(_wf_df(spark, WORDS)).collect()
    }
    assert got == dict(_ref_counts(WORDS))


def test_greedy_merge_matches_reference_including_overlap_runs(spark):
    """'aaa'->[aa,a], 'aaaa'->[aa,aa]: the fold must be non-overlapping
    greedy left-to-right, exactly like sequential BPE."""
    best = spark.createDataFrame([("a", "a")], "bl string, br string")
    got = sorted(
        (tuple(r.syms), r.f)
        for r in _bpe_apply_merge(_wf_df(spark, WORDS), best).collect()
    )
    exp = sorted((tuple(_ref_merge(s, "a", "a")), f) for s, f in WORDS)
    assert got == exp


def test_two_iterations_match_sequential_bpe(spark):
    """Run the full registered query's logic shape on a tiny controlled
    corpus: the chosen merges and resulting counts at every iteration
    equal sequential BPE with (count desc, l, r) tie-break."""
    wf = _wf_df(spark, WORDS)
    state = [(list(s), f) for s, f in WORDS]
    for _ in range(2):
        cnts = _ref_counts(state)
        best = min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        got_best = (
            _bpe_pair_counts(wf)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()[0]
        )
        assert (got_best.l, got_best.r) == best
        bdf = spark.createDataFrame([best], "bl string, br string")
        wf = _bpe_apply_merge(wf, bdf)
        state = [(_ref_merge(s, *best), f) for s, f in state]
    got = {(r.l, r.r): r.cnt for r in _bpe_pair_counts(wf).collect()}
    assert got == dict(_ref_counts(state))


def test_registered_query_deterministic_and_shaped(spark):
    from docling_ibm_models_spark.plans.queries import QUERIES

    from .conftest import SF_SMALL

    out = QUERIES["corpus_bpe_merges"](spark, SF_SMALL)
    assert out.columns == ["it", "l", "r", "cnt"]
    rows = [tuple(r) for r in out.collect()]
    assert [tuple(r) for r in out.collect()] == rows  # stable re-run
    assert {r[0] for r in rows} == {0, 1, 2}
    for it in (0, 1, 2):
        grp = [r for r in rows if r[0] == it]
        assert len(grp) == 10
        assert grp == sorted(grp, key=lambda t: (-t[3], t[1], t[2]))


def test_python_fold_matches_catalyst_fuse_on_random_rules(spark):
    """Round-6 encode kernel equivalence: the Python greedy fold
    (_bpe_fold_py, the Arrow-batched encode path) must agree with the
    Catalyst _bpe_fuse fold chain on randomized symbol strings AND
    randomized rule tables (bl != br per the module invariant)."""
    import random

    from pyspark.sql import functions as F

    from docling_ibm_models_spark.plans.queries import _bpe_fold_py, _bpe_fuse

    rng = random.Random(20260822)
    alphabet = ["a", "b", "c", "d"]
    for trial in range(6):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            for _ in range(40)
        ]
        rules = []
        pool = list(alphabet)
        for _ in range(rng.randint(1, 4)):
            bl, br = rng.sample(pool, 2)  # sample -> bl != br
            rules.append((bl, br))
            pool.append(bl + br)
        df = spark.createDataFrame([(w,) for w in words], "w string")
        chars = F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
        enc = df.select("w", chars.alias("syms"))
        for bl, br in rules:
            enc = enc.select("w", _bpe_fuse("syms", bl, br).alias("syms"))
        got = {r["w"]: r["syms"] for r in enc.collect()}
        for w in words:
            assert got[w] == _bpe_fold_py(list(w), rules), (w, rules)
