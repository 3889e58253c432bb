"""Parity: decoder_semantics.decode_postfix/merge_spans vs the REFERENCE
TableFormer decode loop (tablemodel04_rs.py:167-319) executed for real via
the computing fake-torch harness (tests/fake_torch_rs.py).

Covers the in-loop grammar corrections (xcel→lcel always — line_num never
increments; ucel-then-lcel→fcel), bbox-slot emission bookkeeping
(skip_next_tag / first_lcel), and the horizontal-span merge registry
including the unclosed-span → merge-with-last-bbox (-1 index) quirk."""

from __future__ import annotations

import random

import pytest

from docling_ibm_models_spark.models import decoder_semantics as ds

from .fake_torch_rs import run_reference_decode

TAGS = ["fcel", "ecel", "ched", "rhed", "srow", "nl", "lcel", "ucel", "xcel"]


def _coords_for(n):
    # deterministic, irregular cxcywh boxes so merge math is exercised
    return [
        [
            round(0.05 + 0.11 * ((i * 7) % 9), 4),
            round(0.07 + 0.09 * ((i * 5) % 11), 4),
            round(0.02 + 0.01 * (i % 5), 4),
            round(0.03 + 0.01 * (i % 7), 4),
        ]
        for i in range(n)
    ]


def _classes_for(n):
    return [i % 3 for i in range(n)]


def _assert_parity(proposed, max_pred_len=512):
    if "<end>" not in proposed:
        # the real loop never runs out of proposals (argmax always yields a
        # tag); a finite <end>-less fixture is only comparable up to its
        # own length
        max_pred_len = min(max_pred_len, len(proposed))
    res = ds.decode_postfix(proposed, max_pred_len=max_pred_len)
    n = res.n_slots
    coords = _coords_for(max(n, 1))
    classes = _classes_for(max(n, 1))
    ref_tags, ref_slots, ref_cls, ref_coord = run_reference_decode(
        proposed, coords, classes, max_pred_len=max_pred_len
    )
    assert ref_tags == res.tags, f"tag stream diverged for {proposed}"
    assert ref_slots == n, f"slot count diverged for {proposed}"
    my_cls, my_coord = ds.merge_spans(classes[:n], coords[:n], res.bboxes_to_merge)
    assert ref_cls == my_cls, f"merged classes diverged for {proposed}"
    assert ref_coord == my_coord, f"merged coords diverged for {proposed}"
    return res


CASES = [
    # plain grid
    ["fcel", "fcel", "nl", "fcel", "fcel", "nl", "<end>"],
    # xcel proposed anywhere -> lcel (line_num==0 forever quirk)
    ["xcel", "fcel", "nl", "xcel", "xcel", "nl", "<end>"],
    # ucel then lcel -> fcel correction
    ["fcel", "ucel", "lcel", "nl", "<end>"],
    # horizontal span: fcel lcel lcel fcel closes the span
    ["fcel", "lcel", "lcel", "fcel", "nl", "<end>"],
    # span closed by nl (nl emits a slot)
    ["fcel", "lcel", "lcel", "nl", "fcel", "fcel", "nl", "<end>"],
    # unclosed span at stream end -> merges with LAST bbox (-1 quirk)
    ["fcel", "fcel", "lcel", "lcel", "<end>"],
    # lcel as the very first tag
    ["lcel", "lcel", "fcel", "nl", "<end>"],
    # ucel emits a slot but suppresses the next tag's slot
    ["fcel", "ucel", "fcel", "nl", "ucel", "ucel", "nl", "<end>"],
    # headers and sparse rows
    ["ched", "ched", "nl", "rhed", "srow", "nl", "ecel", "fcel", "nl", "<end>"],
    # no <end>: loop runs to max_pred_len
    ["fcel", "lcel", "nl", "fcel"],
    # <end> immediately
    ["<end>"],
    # back-to-back spans
    ["fcel", "lcel", "fcel", "lcel", "lcel", "ched", "nl", "<end>"],
]


@pytest.mark.parametrize("proposed", CASES, ids=lambda c: ",".join(c)[:40])
def test_directed_cases(proposed):
    _assert_parity(proposed)


def test_randomized_streams():
    rng = random.Random(0xD0C)
    for trial in range(200):
        n = rng.randint(1, 40)
        proposed = [rng.choice(TAGS) for _ in range(n)]
        if rng.random() < 0.7:
            proposed.append("<end>")
        _assert_parity(proposed)


def test_max_pred_len_truncation():
    res = _assert_parity(["fcel"] * 30, max_pred_len=10)
    assert len(res.tags) == 10


def test_merge_with_last_quirk_values():
    # unclosed span: bboxes_to_merge[start] stays -1 and the reference
    # merges the span-start box with outputs_coord[-1]
    res = ds.decode_postfix(["fcel", "fcel", "lcel", "lcel", "<end>"])
    # first fcel emits no slot (skip_next_tag starts True): slots are the
    # 2nd fcel (0) and the span-start lcel (1); the span never closes
    assert res.bboxes_to_merge == {1: -1}
    coords = _coords_for(res.n_slots)
    classes = _classes_for(res.n_slots)
    _, merged = ds.merge_spans(classes, coords, res.bboxes_to_merge)
    assert merged[-1] == ds.merge_bboxes(coords[1], coords[-1])


# -- property-based parity (hypothesis) ---------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.sampled_from(TAGS + ["<end>"]), min_size=1, max_size=60),
        st.integers(min_value=1, max_value=64),
    )
    def test_property_parity_any_stream(proposed, max_len):
        if "<end>" not in proposed:
            max_len = min(max_len, len(proposed))
        res = ds.decode_postfix(proposed, max_pred_len=max_len)
        coords = _coords_for(max(res.n_slots, 1))
        classes = _classes_for(max(res.n_slots, 1))
        ref_tags, ref_slots, ref_cls, ref_coord = run_reference_decode(
            proposed, coords, classes, max_pred_len=max_len
        )
        assert ref_tags == res.tags
        assert ref_slots == res.n_slots
        my_cls, my_coord = ds.merge_spans(
            classes[: res.n_slots], coords[: res.n_slots], res.bboxes_to_merge
        )
        assert (ref_cls, ref_coord) == (my_cls, my_coord)

except ImportError:  # pragma: no cover
    pass
