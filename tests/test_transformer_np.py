"""M3 transformer-encoder cross-check: the vectorized numpy forward
(models/transformer_np.py) vs an independent module-structured
implementation of torch's documented TransformerEncoder semantics
(tests/torch_np.py) — two implementations of one public spec, identical
seeded weights, constructed with the reference's exact constructor-arg
shape (transformer_rs.py:152-158: d_model, nhead, dim_feedforward,
num_layers, enable_nested_tensor=False). The reference's all-False
encoder mask (transformer_rs.py:186-195) is asserted to be a no-op.
"""

from __future__ import annotations

import numpy as np

from docling_ibm_models_spark.models import bbox_decoder_np as bnp
from docling_ibm_models_spark.models import transformer_np as tnp

from . import torch_np

D_MODEL = 64
N_HEADS = 4
DIM_FF = 128
N_LAYERS = 4


def _build_torch_np_encoder(layers):
    enc_layer = torch_np.TransformerEncoderLayer(
        d_model=D_MODEL, nhead=N_HEADS, dim_feedforward=DIM_FF
    )
    enc = torch_np.TransformerEncoder(enc_layer, num_layers=N_LAYERS,
                                      enable_nested_tensor=False)
    for mod, lw in zip(enc.layers, layers):
        mod.self_attn.in_proj_weight = lw["in_proj_w"].copy()
        mod.self_attn.in_proj_bias = lw["in_proj_b"].copy()
        mod.self_attn.out_proj.weight = lw["out_w"].copy()
        mod.self_attn.out_proj.bias = lw["out_b"].copy()
        mod.norm1.weight = lw["ln1_w"].copy()
        mod.norm1.bias = lw["ln1_b"].copy()
        mod.norm2.weight = lw["ln2_w"].copy()
        mod.norm2.bias = lw["ln2_b"].copy()
        mod.linear1.weight = lw["ff1_w"].copy()
        mod.linear1.bias = lw["ff1_b"].copy()
        mod.linear2.weight = lw["ff2_w"].copy()
        mod.linear2.bias = lw["ff2_b"].copy()
    return enc


def test_encoder_forward_cross_check():
    layers = tnp.synthetic_encoder_layers(seed=13, d_model=D_MODEL,
                                          dim_ff=DIM_FF, num_layers=N_LAYERS)
    enc = _build_torch_np_encoder(layers)
    rng = np.random.default_rng(31)
    for L, N in [(9, 1), (25, 1), (5, 2)]:
        x = rng.normal(0.0, 0.5, (L, N, D_MODEL))
        ref = enc(torch_np.Tensor(x))
        mine = tnp.encoder_forward(layers, x, N_HEADS)
        np.testing.assert_allclose(mine, ref.a, rtol=1e-10, atol=1e-12)


def test_all_false_mask_is_noop():
    """The reference builds its encoder mask as zeros == ones — an
    all-False bool mask (transformer_rs.py:186-195). Blocking nothing must
    equal passing no mask at all."""
    layers = tnp.synthetic_encoder_layers(seed=13, d_model=D_MODEL,
                                          dim_ff=DIM_FF, num_layers=N_LAYERS)
    enc = _build_torch_np_encoder(layers)
    rng = np.random.default_rng(7)
    L, N = 9, 1
    x = rng.normal(0.0, 0.5, (L, N, D_MODEL))
    mask = torch_np.zeros(N * N_HEADS, L, L) == torch_np.ones(N * N_HEADS, L, L)
    with_mask = enc(torch_np.Tensor(x), mask=mask)
    without = enc(torch_np.Tensor(x))
    np.testing.assert_allclose(with_mask.a, without.a, rtol=0, atol=0)


def test_tag_encoder_forward_end_to_end():
    """input filter (reference-parity component) → flatten → encoder:
    deterministic, shape-correct, non-degenerate."""
    w = bnp.synthetic_weights(seed=7, encoder_dim=64, in_ch=16,
                              attention_dim=16, tag_decoder_dim=64,
                              decoder_dim=64, num_classes=2)
    w["enc_layers"] = tnp.synthetic_encoder_layers(seed=13, d_model=64,
                                                   dim_ff=128, num_layers=2)
    rng = np.random.default_rng(3)
    enc_in = rng.normal(0.0, 0.3, (1, 5, 5, 16))
    out = tnp.tag_encoder_forward(w, enc_in, n_heads=4)
    out2 = tnp.tag_encoder_forward(w, enc_in, n_heads=4)
    assert out.shape == (25, 1, 64)
    np.testing.assert_array_equal(out, out2)
    assert np.std(out) > 1e-3
