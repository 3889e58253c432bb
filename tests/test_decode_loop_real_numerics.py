"""End-to-end integration parity: the REFERENCE predict() loop
(tablemodel04_rs.py:110-328) executed under the computing fake-torch with
the repo's REAL numpy bbox forward as its `_bbox_decoder`, vs the repo's
own composition decode_postfix → bbox_inference → merge_spans.

This closes the loop between the two parity layers that round 2 kept
separate: the CONTROL-FLOW parity (prescribed streams, fake numbers —
test_decoder_semantics_parity) and the NUMERIC parity (reference
BBoxDecoder under torch_np — test_bbox_decoder_np). Here the reference
loop emits real slot vectors, calls the real forward, and runs its
mergebboxes over real floats; the composition must match to 1e-10.
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_ibm_models_spark.models import bbox_decoder_np as bnp
from docling_ibm_models_spark.models import decoder_semantics

from .fake_torch_rs import run_reference_decode_real_bbox

DIM = 128
SPATIAL = 5

WEIGHTS = bnp.synthetic_weights(
    seed=7, encoder_dim=DIM, in_ch=64, attention_dim=32,
    tag_decoder_dim=DIM, decoder_dim=DIM, num_classes=2,
)


def _vec(step):
    return np.random.default_rng(9000 + step).normal(0.0, 0.5, (1, DIM))


def _enc(seed):
    return np.random.default_rng(seed).normal(0.0, 0.3, (1, SPATIAL, SPATIAL, 64))


STREAMS = [
    ["fcel", "fcel", "nl", "fcel", "fcel", "nl", "<end>"],
    ["ched", "ched", "nl", "fcel", "lcel", "nl", "<end>"],
    ["fcel", "lcel", "lcel", "nl", "fcel", "fcel", "fcel", "nl", "<end>"],
    ["fcel", "ucel", "lcel", "nl", "fcel", "xcel", "nl", "<end>"],  # corrections fire
    ["fcel", "lcel", "<end>"],  # unclosed span -> -1 merge quirk
    ["ecel", "srow", "rhed", "nl", "<end>"],
]


@pytest.mark.parametrize("i,stream", list(enumerate(STREAMS)))
def test_decode_loop_real_numerics_parity(i, stream):
    enc = _enc(500 + i)
    ref_tags, ref_slots, ref_cls, ref_coord = run_reference_decode_real_bbox(
        stream, WEIGHTS, enc, _vec
    )

    res = decoder_semantics.decode_postfix(stream)
    my_tags = [t for t in res.tags if t != "<end>"]
    assert my_tags == ref_tags[: len(my_tags)]
    assert res.n_slots == ref_slots

    tag_h = (
        np.vstack([_vec(t) for t in res.slot_steps])
        if res.slot_steps
        else np.empty((0, DIM))
    )
    logits, boxes = bnp.bbox_inference(WEIGHTS, enc, tag_h)
    cls_v = [logits[k] for k in range(res.n_slots)]
    coords = [boxes[k].tolist() for k in range(res.n_slots)]
    cls_m, coord_m = decoder_semantics.merge_spans(cls_v, coords, res.bboxes_to_merge)

    assert len(coord_m) == len(ref_coord)
    if ref_coord:
        np.testing.assert_allclose(
            np.asarray(coord_m, dtype=float), np.asarray(ref_coord, dtype=float),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray([np.asarray(c, dtype=float) for c in cls_m]),
            np.asarray(ref_cls, dtype=float),
            rtol=1e-10, atol=1e-12,
        )


def test_decode_loop_real_numerics_randomized():
    rng = np.random.default_rng(77)
    tags = ["fcel", "ecel", "ched", "rhed", "srow", "lcel", "ucel", "xcel", "nl"]
    for case in range(25):
        n = int(rng.integers(3, 18))
        stream = [tags[int(rng.integers(0, len(tags)))] for _ in range(n)] + ["<end>"]
        enc = _enc(1000 + case)
        ref_tags, ref_slots, ref_cls, ref_coord = run_reference_decode_real_bbox(
            stream, WEIGHTS, enc, _vec
        )
        res = decoder_semantics.decode_postfix(stream)
        assert res.n_slots == ref_slots, f"case {case}: {stream}"
        tag_h = (
            np.vstack([_vec(t) for t in res.slot_steps])
            if res.slot_steps
            else np.empty((0, DIM))
        )
        logits, boxes = bnp.bbox_inference(WEIGHTS, enc, tag_h)
        cls_v = [logits[k] for k in range(res.n_slots)]
        coords = [boxes[k].tolist() for k in range(res.n_slots)]
        _, coord_m = decoder_semantics.merge_spans(cls_v, coords, res.bboxes_to_merge)
        assert len(coord_m) == len(ref_coord), f"case {case}: {stream}"
        if ref_coord:
            np.testing.assert_allclose(
                np.asarray(coord_m, dtype=float),
                np.asarray(ref_coord, dtype=float),
                rtol=1e-10, atol=1e-12, err_msg=f"case {case}: {stream}",
            )
