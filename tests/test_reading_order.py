"""Behavioral tests for the reading-order predictor, mirroring the
reference's own protocol (/root/reference/tests/test_reading_order.py:
Spearman rank correlation of recovered vs ground-truth order ≥ 0.9 per
page, mean ≥ 0.95; caption-link accuracy > 0.85, footnote > 0.90)."""

from __future__ import annotations

from docling_ibm_models_spark.operators.reading_order import (
    CAPTION,
    FOOTNOTE,
    PICTURE,
    TABLE,
    TEXT,
    Element,
    find_to_captions,
    find_to_footnotes,
    predict_merges,
    predict_reading_order,
)
from docling_ibm_models_spark.sources.elements_source import (
    shuffled,
    synth_page_elements,
)

N_DOCS = 40


def spearman(pred_order: list[int], true_order: list[int]) -> float:
    n = len(true_order)
    if n <= 1:
        return 1.0
    rank_pred = {cid: i for i, cid in enumerate(pred_order)}
    rank_true = {cid: i for i, cid in enumerate(true_order)}
    d2 = sum((rank_pred[c] - rank_true[c]) ** 2 for c in true_order)
    return 1 - 6 * d2 / (n * (n * n - 1))


def test_reading_order_spearman():
    scores = []
    for seed in range(N_DOCS):
        truth = synth_page_elements(seed)
        got = predict_reading_order(shuffled(truth, seed * 7 + 1))
        rho = spearman([e.cid for e in got], [e.cid for e in truth])
        assert rho >= 0.90, f"doc {seed}: spearman {rho:.3f}\n" + "\n".join(
            f"{e.cid} {e.label} l={e.l} t={e.t}" for e in got
        )
        scores.append(rho)
    assert sum(scores) / len(scores) >= 0.95


def test_caption_links():
    hits = total = 0
    for seed in range(N_DOCS):
        truth = synth_page_elements(seed)
        got = predict_reading_order(shuffled(truth, seed * 13 + 5))
        links = find_to_captions(got)
        # ground truth: each picture's caption is the next cid with CAPTION
        for i, e in enumerate(truth):
            if e.label == PICTURE and i + 1 < len(truth) and truth[i + 1].label == CAPTION:
                total += 1
                if links.get(e.cid) == [truth[i + 1].cid]:
                    hits += 1
    assert total > 10
    assert hits / total > 0.85, f"caption accuracy {hits}/{total}"


def test_footnote_links():
    hits = total = 0
    for seed in range(N_DOCS):
        truth = synth_page_elements(seed)
        got = predict_reading_order(shuffled(truth, seed * 17 + 3))
        links = find_to_footnotes(got)
        for i, e in enumerate(truth):
            if e.label == TABLE and i + 1 < len(truth) and truth[i + 1].label == FOOTNOTE:
                total += 1
                if links.get(e.cid) == [truth[i + 1].cid]:
                    hits += 1
    assert total > 10
    assert hits / total > 0.90, f"footnote accuracy {hits}/{total}"


def test_header_body_footer_partition():
    truth = synth_page_elements(3)
    got = predict_reading_order(shuffled(truth, 99))
    labels = [e.label for e in got]
    if "page_header" in labels:
        assert labels[0] == "page_header"
    if "page_footer" in labels:
        assert labels[-1] == "page_footer"


def test_multi_page_order():
    truth = synth_page_elements(11, page_no=0) + [
        Element(
            cid=1000 + e.cid, text=e.text, label=e.label, l=e.l, r=e.r,
            t=e.t, b=e.b, page_no=1, page_width=e.page_width, page_height=e.page_height,
        )
        for e in synth_page_elements(12, page_no=1)
    ]
    got = predict_reading_order(shuffled(truth, 5))
    pages = [e.page_no for e in got]
    assert pages == sorted(pages)


def test_hyphenation_merges():
    elems = [
        Element(cid=0, text="this line ends with a hyphen-", label=TEXT,
                l=50, r=290, t=700, b=680, page_no=0),
        Element(cid=1, text="ated word continues here", label=TEXT,
                l=50, r=290, t=675, b=655, page_no=0),
        Element(cid=2, text="Unrelated Next Paragraph", label=TEXT,
                l=50, r=290, t=650, b=630, page_no=0),
    ]
    merges = predict_merges(elems)
    assert merges == {0: [1]}


# ---------------------------------------------------------------------------
# TRUE parity vs the reference ReadingOrderPredictor (docling_core faked
# with the shared geometry vocabulary — validates the 300-line graph
# algorithm: DAG build, dilation, head sort, DFS, caption/footnote passes)
# ---------------------------------------------------------------------------

def _ref_module():
    import sys

    from .fake_docling_core import DocItemLabel, RefItem, Size, install

    install()
    sys.path.insert(0, "/root/reference")
    import docling_ibm_models.reading_order.reading_order_rb as ro

    return ro, DocItemLabel, Size


def _to_ref_elems(elems):
    ro, DocItemLabel, Size = _ref_module()
    out = []
    for e in elems:
        out.append(
            ro.PageElement(
                cid=e.cid, text=e.text, page_no=e.page_no,
                page_size=Size(width=e.page_width, height=e.page_height),
                label=DocItemLabel(e.label), l=e.l, r=e.r, t=e.t, b=e.b,
            )
        )
    return out


def test_reference_reading_order_parity():
    ro, _, _ = _ref_module()
    pred = ro.ReadingOrderPredictor()
    for seed in range(25):
        truth = synth_page_elements(seed)
        shuf = shuffled(truth, seed * 31 + 7)
        ref_sorted = pred.predict_reading_order(_to_ref_elems(shuf))
        got = predict_reading_order(list(shuf))
        assert [e.cid for e in got] == [e.cid for e in ref_sorted], f"seed {seed}"


def test_reference_caption_footnote_parity():
    ro, _, _ = _ref_module()
    pred = ro.ReadingOrderPredictor()
    for seed in range(25):
        truth = synth_page_elements(seed)
        shuf = shuffled(truth, seed * 11 + 3)
        ref_sorted = pred.predict_reading_order(_to_ref_elems(shuf))
        got = predict_reading_order(list(shuf))
        ref_caps = pred.predict_to_captions(ref_sorted)
        got_caps = find_to_captions(got)
        assert got_caps == ref_caps, f"captions seed {seed}"
        ref_fn = pred.predict_to_footnotes(ref_sorted)
        got_fn = find_to_footnotes(got)
        assert got_fn == ref_fn, f"footnotes seed {seed}"


def test_reference_merges_parity():
    ro, DocItemLabel, Size = _ref_module()
    pred = ro.ReadingOrderPredictor()
    import random as _random

    rng = _random.Random(5)
    texts = ["ends with hyphen-", "a continuation text", "Normal Sentence.",
             "lower start tail,", "x" * 30, "another lower case run"]
    for _ in range(20):
        elems = []
        y = 700.0
        for i in range(rng.randint(2, 6)):
            elems.append(
                Element(cid=i, text=rng.choice(texts), label=TEXT,
                        l=50, r=290, t=y, b=y - 20, page_no=0,
                        page_width=612, page_height=792)
            )
            y -= 30
        ref = pred.predict_merges(_to_ref_elems(elems))
        got = predict_merges(list(elems))
        assert got == ref
