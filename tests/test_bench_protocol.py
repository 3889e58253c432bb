"""Unit tests for the bench scaling protocol's estimator (no Spark):
median-of-clean-pairs, steal discard, degenerate all-noisy fallback, and
the compact-line length budget."""

from __future__ import annotations

import importlib.util
import json
import os

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _pair(k, eff, clean, thr_s=5000.0):
    return {
        "pair": k,
        "efficiency": eff,
        "clean": clean,
        "thr_small": thr_s,
        "thr_big": round(thr_s * 4 * eff, 1),
        "wall_small": 13.0,
        "wall_big": 4.0,
        "walls_small": [13.0],
        "walls_big": [4.0],
        "steal_small": [0.0],
        "steal_big": [0.0],
        "steal_at_min": 0.0 if clean else 0.08,
        "chars": [1, 1],
    }


def test_median_over_clean_pairs_only():
    pairs = [
        _pair(0, 0.90, True),
        _pair(1, 0.55, False),  # discarded on steal
        _pair(2, 0.88, True),
        _pair(3, 0.92, True),
    ]
    summary, detail = bench.finalize_scaling(pairs, 2, 8)
    assert summary["efficiency"] == 0.90
    assert summary["clean_pairs"] == 3
    assert detail["discarded"] == [1]


def test_one_bad_window_absorbed_by_two_phase_median():
    # phase A entirely inside a depressed window (clean, low), phase B clean
    pairs = [
        _pair(0, 0.72, True),
        _pair(1, 0.65, True),
        _pair(2, 0.73, True),
        _pair(3, 0.89, True),
        _pair(4, 0.91, True),
    ]
    summary, _ = bench.finalize_scaling(pairs, 2, 8)
    assert summary["efficiency"] == 0.73  # median is honest: 3 of 5 low
    # ...and with one more good sample the median crosses the window
    pairs.append(_pair(5, 0.90, True))
    summary, _ = bench.finalize_scaling(pairs, 2, 8)
    assert summary["efficiency"] == 0.81


def test_all_noisy_falls_back_to_all_pairs():
    pairs = [_pair(0, 0.8, False), _pair(1, 0.9, False), _pair(2, 0.7, False)]
    summary, _ = bench.finalize_scaling(pairs, 2, 8)
    assert summary["efficiency"] == 0.8
    assert summary["clean_pairs"] == 0


def test_representative_throughputs_come_from_median_pair():
    pairs = [_pair(0, 0.80, True, 5000.0), _pair(1, 0.90, True, 6000.0),
             _pair(2, 0.99, True, 7000.0)]
    summary, _ = bench.finalize_scaling(pairs, 2, 8)
    assert summary["pages_per_sec_small"] == 6000.0
    assert summary["efficiency"] == 0.90


def test_compact_line_budget_shape():
    """A result with the current query registry must serialize well under
    the 1900-char budget (driver keeps the last 2000 chars of stdout)."""
    from docling_ibm_models_spark.plans.queries import QUERIES

    queries = {"extract_local_small": 13.42, "extract_local_big": 3.79,
               "extract_local_full": 3.44}
    queries.update({k: 9.9 for k in QUERIES})
    result = {
        "metric": "pages_per_sec_extraction",
        "value": 23270.74,
        "unit": "pages/sec",
        "queries": queries,
        "sf": "/root/testdata/sf0.1",
        "pages": 80000,
        "scaling": {
            "cores_small": 2, "cores_big": 8,
            "pages_per_sec_small": 5955.2, "pages_per_sec_big": 21117.1,
            "efficiency": 0.89, "pairs": 8, "clean_pairs": 6,
            "pair_effs": [0.8931, 0.9249, 0.744, 0.7309, 0.9063, 0.8865,
                          0.9, 0.91],
            "cores_full": 32, "pages_per_sec_full": 23270.7,
            "identical": True,
        },
    }
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) < 1900, len(line)


def test_probe_criterion_discards_contended_pairs():
    """Bandwidth-probe discard: pairs measured while the in-VM probe ran
    >1.3x the run's best are contended even at zero steal."""
    pairs = [
        {**_pair(0, 0.88, True), "probe_s": [0.35, 0.36]},
        {**_pair(1, 0.44, True), "probe_s": [0.36, 1.9]},   # window started
        {**_pair(2, 0.43, True), "probe_s": [2.1, 2.0]},    # fully inside
        {**_pair(3, 0.90, True), "probe_s": [0.37, 0.35]},
        {**_pair(4, 0.86, True), "probe_s": [0.38, 0.36]},
    ]
    summary, detail = bench.finalize_scaling(pairs, 2, 8)
    assert [p["pair"] for p in pairs if p.get("probe_contended")] == [1, 2]
    assert summary["clean_pairs"] == 3
    assert summary["efficiency"] == 0.88


def test_probe_all_contended_degrades_honestly():
    """A fully-contended run cannot self-certify: the global best probe is
    itself contended, ratios stay ~1, nothing is discarded."""
    pairs = [
        {**_pair(0, 0.45, True), "probe_s": [2.0, 2.1]},
        {**_pair(1, 0.48, True), "probe_s": [2.2, 2.0]},
        {**_pair(2, 0.43, True), "probe_s": [1.9, 2.1]},
    ]
    summary, _ = bench.finalize_scaling(pairs, 2, 8)
    assert summary["clean_pairs"] == 3
    assert summary["efficiency"] == 0.45
