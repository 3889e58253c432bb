"""M3/M4 tag-transformer DECODE parity: the reference's Tag_Transformer
executed for REAL under torch_np — including the reference-AUTHORED
TMTransformerDecoder cache discipline (transformer_rs.py:39-73: layer 0
attends over the raw embedded history, layer i>0 over layer i-1's cached
per-step outputs) and TMTransformerDecoderLayer last-token-only math
(transformer_rs.py:76-124) — vs the repo's vectorized numpy twin
(models/transformer_np.py::tag_decode_loop).

Unlike the prescribed-stream tests (test_decoder_semantics_parity,
test_decode_loop_real_numerics), NOTHING here is prescribed: every tag is
fc(argmax) over real floats flowing through input filter → transformer
encoder → cached decoder, the grammar corrections feed the corrected tag
back into the next step's embedding, and the emitted tag_H slots drive the
real numpy bbox forward on both sides. Weights are seeded synthetic
(no checkpoints in-container); the math is what is under test.
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_ibm_models_spark.models import bbox_decoder_np as bnp
from docling_ibm_models_spark.models import decoder_semantics
from docling_ibm_models_spark.models import transformer_np as tnp

from .fake_torch_rs import (
    ID_TO_TAG,
    WORD_MAP_TAG,
    run_reference_predict_real_tags,
)

D_MODEL = 512  # fixed by the reference input filter (utils.resnet_block: 256->512)
N_HEADS = 4
DIM_FF = 256
SPATIAL = 4
MAX_LEN = 48


@pytest.fixture(scope="module")
def w_tag():
    w_if = bnp.synthetic_weights(
        seed=7, encoder_dim=D_MODEL, in_ch=256, attention_dim=32,
        tag_decoder_dim=D_MODEL, decoder_dim=D_MODEL, num_classes=2,
    )
    w = {
        "input_filter": w_if["input_filter"],
        "enc_layers": tnp.synthetic_encoder_layers(
            seed=13, d_model=D_MODEL, dim_ff=DIM_FF, num_layers=2
        ),
        "dec_layers": tnp.synthetic_decoder_layers(
            seed=29, d_model=D_MODEL, dim_ff=DIM_FF, num_layers=2
        ),
    }
    # seed 75 / gain 2 calibrated: greedy decode emits a 30+-tag sequence
    # with 6 distinct tags, exercises the lcel span path, and terminates
    w.update(tnp.synthetic_tag_head(seed=75, d_model=D_MODEL, vocab_size=13, gain=2.0))
    return w


@pytest.fixture(scope="module")
def w_bbox():
    return bnp.synthetic_weights(
        seed=57, encoder_dim=D_MODEL, in_ch=256, attention_dim=32,
        tag_decoder_dim=D_MODEL, decoder_dim=D_MODEL, num_classes=2,
    )


def _enc(seed):
    return np.random.default_rng(seed).normal(0.0, 0.3, (1, SPATIAL, SPATIAL, 256))


@pytest.mark.parametrize("enc_seed", [3, 11, 27])
def test_real_tag_decode_full_parity(w_tag, w_bbox, enc_seed):
    enc = _enc(enc_seed)
    ref_seq, ref_slots, ref_cls, ref_coord = run_reference_predict_real_tags(
        w_tag, w_bbox, enc, n_heads=N_HEADS, dim_ff=DIM_FF, max_pred_len=MAX_LEN
    )

    memory = tnp.encoder_forward(
        w_tag["enc_layers"], bnp.encoder_input_prep(w_tag, enc), N_HEADS
    )
    res = tnp.tag_decode_loop(w_tag, memory, WORD_MAP_TAG, MAX_LEN, N_HEADS)

    assert res["seq"] == ref_seq, (
        [ID_TO_TAG[i] for i in res["seq"]],
        [ID_TO_TAG[i] for i in ref_seq],
    )
    assert res["tag_H"].shape[0] == ref_slots

    cls, box = bnp.bbox_inference(w_bbox, enc, res["tag_H"])
    mc, mb = decoder_semantics.merge_spans(
        cls.tolist(), box.tolist(), res["bboxes_to_merge"]
    )
    assert len(mb) == len(ref_coord)
    np.testing.assert_allclose(np.array(mb), np.array(ref_coord), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.array(mc), np.array(ref_cls), rtol=1e-10, atol=1e-12)


def test_sequence_is_nontrivial(w_tag):
    """The calibrated weights must keep exercising the interesting paths:
    a long multi-tag sequence with span tags, natural termination, and
    emitted bbox slots — otherwise the parity above would be vacuous."""
    enc = _enc(3)
    memory = tnp.encoder_forward(
        w_tag["enc_layers"], bnp.encoder_input_prep(w_tag, enc), N_HEADS
    )
    res = tnp.tag_decode_loop(w_tag, memory, WORD_MAP_TAG, MAX_LEN, N_HEADS)
    tags = [ID_TO_TAG[i] for i in res["seq"]]
    assert tags[0] == "<start>" and tags[-1] == "<end>"
    assert len(tags) >= 10
    assert len(set(tags)) >= 5
    assert "lcel" in tags  # span path exercised
    assert res["tag_H"].shape[0] >= 3
    assert any(v == -1 or v >= 0 for v in res["bboxes_to_merge"].values())


def test_grammar_corrections_feed_back(w_tag):
    """The corrected tag (not the raw argmax) must be what gets embedded
    next step: force a first-step xcel proposal by spiking its fc bias —
    the output stream must contain the corrected lcel, never xcel (the
    reference's never-incremented line_num keeps the correction active at
    every step — tablemodel04_rs.py:198-204)."""
    import copy

    w2 = copy.deepcopy(w_tag)
    w2["fc"]["b"][WORD_MAP_TAG["xcel"]] += 50.0
    enc = _enc(3)
    memory = tnp.encoder_forward(
        w2["enc_layers"], bnp.encoder_input_prep(w2, enc), N_HEADS
    )
    res = tnp.tag_decode_loop(w2, memory, WORD_MAP_TAG, 8, N_HEADS)
    tags = [ID_TO_TAG[i] for i in res["seq"]]
    assert "xcel" not in tags
    assert "lcel" in tags

    ref_seq, _, _, _ = run_reference_predict_real_tags(
        w2, bnp.synthetic_weights(
            seed=57, encoder_dim=D_MODEL, in_ch=256, attention_dim=32,
            tag_decoder_dim=D_MODEL, decoder_dim=D_MODEL, num_classes=2,
        ), enc, n_heads=N_HEADS, dim_ff=DIM_FF, max_pred_len=8,
    )
    assert res["seq"] == ref_seq


def test_forced_decode_matches_postfix_and_depends_on_image(w_tag):
    """The serving path's constrained decode (forced proposal schedule):
    (a) corrected stream + slot/merge bookkeeping equal decode_postfix
    over the same proposals (both parity-tested vs the reference loop);
    (b) the emitted tag_H slot states are REAL forward outputs — they
    depend on the encoder memory, so the same schedule over two different
    images yields different slot states (the property that makes the M5
    bbox forward image-dependent in serving)."""
    proposed = ["fcel", "xcel", "nl", "fcel", "ucel", "lcel", "nl",
                "fcel", "lcel", "lcel", "nl", "<end>"]
    forced = [WORD_MAP_TAG[t] for t in proposed]
    sem = decoder_semantics.decode_postfix(proposed)

    outs = []
    for enc_seed in (3, 11):
        memory = tnp.encoder_forward(
            w_tag["enc_layers"], bnp.encoder_input_prep(w_tag, _enc(enc_seed)), N_HEADS
        )
        res = tnp.tag_decode_loop(
            w_tag, memory, WORD_MAP_TAG, len(proposed) + 2, N_HEADS,
            forced_tags=forced,
        )
        tags = [ID_TO_TAG[i] for i in res["seq"][1:]]
        assert tags == list(sem.tags)
        assert res["tag_H"].shape[0] == sem.n_slots > 0
        assert dict(res["bboxes_to_merge"]) == dict(sem.bboxes_to_merge)
        outs.append(res["tag_H"])
    assert not np.allclose(outs[0], outs[1])
