"""M3 Tag_Transformer image-encoder forward as REAL numpy (reference:
docling_ibm_models/tableformer/models/table04_rs/transformer_rs.py:152-195).

The reference encoder is ``nn.TransformerEncoder(nn.TransformerEncoderLayer(
d_model, nhead, dim_feedforward), num_layers, enable_nested_tensor=False)``
applied to the flattened input-filter features with an ALL-FALSE bool mask
(transformer_rs.py:186-195 — the mask is constructed as ``zeros == ones``,
i.e. nothing is ever masked; preserved here as an explicit no-op).

Status honesty: the encoder layer math is torch LIBRARY code, so unlike
the bbox decoder there is no reference-authored numerics to execute for
parity. What this module claims: (a) a from-scratch vectorized numpy
implementation of the documented torch semantics (packed qkv projection,
per-head 1/sqrt(d) scaling, post-norm residuals, ReLU FFN, biased-variance
LayerNorm), cross-checked against an INDEPENDENT module-structured
implementation mirroring torch's class layout (tests/torch_np.py) built
from the same public spec — two implementations, one spec; and (b) the
reference-authored parts around it (input filter, flatten/permute, the
all-False mask, positional target prep) carry true reference parity via
models/bbox_decoder_np.py. Real checkpoint weights would slot into the
same weight dicts on a cluster.
"""

from __future__ import annotations

import math

import numpy as np

from docling_ibm_models_spark.models.bbox_decoder_np import encoder_input_prep

LN_EPS = 1e-5


def _layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + LN_EPS) * w + b


def _mha_self(x: np.ndarray, lw: dict, n_heads: int) -> np.ndarray:
    """Self-attention over (L, N, E) with packed in_proj, no masking (the
    reference's mask is all-False by construction)."""
    L, N, E = x.shape
    d = E // n_heads
    W, b = lw["in_proj_w"], lw["in_proj_b"]
    Q = x @ W[:E].T + b[:E]
    K = x @ W[E : 2 * E].T + b[E : 2 * E]
    V = x @ W[2 * E :].T + b[2 * E :]

    def heads(t):
        return t.reshape(L, N * n_heads, d).transpose(1, 0, 2)

    Qh, Kh, Vh = heads(Q), heads(K), heads(V)
    scores = Qh @ Kh.transpose(0, 2, 1) / math.sqrt(d)
    scores -= scores.max(axis=-1, keepdims=True)
    e = np.exp(scores)
    attn = e / e.sum(axis=-1, keepdims=True)
    out = (attn @ Vh).transpose(1, 0, 2).reshape(L, N, E)
    return out @ lw["out_w"].T + lw["out_b"]


def encoder_forward(layers: list[dict], x_lne: np.ndarray, n_heads: int) -> np.ndarray:
    """Post-norm transformer encoder stack over (L, N, E)."""
    x = x_lne
    for lw in layers:
        x = _layer_norm(x + _mha_self(x, lw, n_heads), lw["ln1_w"], lw["ln1_b"])
        ff = np.maximum(x @ lw["ff1_w"].T + lw["ff1_b"], 0.0) @ lw["ff2_w"].T + lw["ff2_b"]
        x = _layer_norm(x + ff, lw["ln2_w"], lw["ln2_b"])
    return x


def tag_encoder_forward(w: dict, enc_inputs_nhwc: np.ndarray, n_heads: int) -> np.ndarray:
    """transformer_rs.py:171-195 through ``encoder_out``: input filter →
    flatten → (positions, batch, dim) → N-layer encoder (all-False mask =
    no-op). ``w`` carries the shared ``input_filter`` plus ``enc_layers``."""
    x = encoder_input_prep(w, enc_inputs_nhwc)
    return encoder_forward(w["enc_layers"], x, n_heads)


def synthetic_encoder_layers(
    seed: int = 13, d_model: int = 512, dim_ff: int = 1024, num_layers: int = 4
) -> list[dict]:
    """Deterministic seeded stand-in for the checkpoint encoder weights."""
    rng = np.random.default_rng(seed)
    s = 1.0 / math.sqrt(d_model)
    layers = []
    for _ in range(num_layers):
        layers.append(
            {
                "in_proj_w": rng.normal(0.0, s, (3 * d_model, d_model)),
                "in_proj_b": rng.normal(0.0, 0.01, 3 * d_model),
                "out_w": rng.normal(0.0, s, (d_model, d_model)),
                "out_b": rng.normal(0.0, 0.01, d_model),
                "ln1_w": rng.uniform(0.8, 1.2, d_model),
                "ln1_b": rng.normal(0.0, 0.02, d_model),
                "ff1_w": rng.normal(0.0, s, (dim_ff, d_model)),
                "ff1_b": rng.normal(0.0, 0.01, dim_ff),
                "ff2_w": rng.normal(0.0, 1.0 / math.sqrt(dim_ff), (d_model, dim_ff)),
                "ff2_b": rng.normal(0.0, 0.01, d_model),
                "ln2_w": rng.uniform(0.8, 1.2, d_model),
                "ln2_b": rng.normal(0.0, 0.02, d_model),
            }
        )
    return layers
