"""M7 vision-tower parity: the repo's numpy SAM ViT encoder
(models/sam_encoder_np.py) vs the REFERENCE sam.py classes executed for
real under torch_np with identical seeded weights.

Reference code under test (reference-adapted model graph, executed
numerics included — sam.py:30-473): PatchEmbed, absolute+DECOMPOSED
RELATIVE position embeddings (get_rel_pos exact path +
add_decomposed_rel_pos einsums), windowed attention with pad/partition/
unpartition, global-attention blocks, GELU MLP, LayerNorm2d neck, and the
Vary-toy net_2/net_3 stride-2 tail. The OPT generate side (sam_opt.py,
HuggingFace library) remains environment-blocked.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pytest

from docling_ibm_models_spark.models import sam_encoder_np as snp

from . import ref_import, torch_np


def _import_ref_sam():
    ref_import.install()
    import docling_ibm_models.code_formula_model.models.sam as sam

    sam.torch = torch_np.torch
    sam.nn = torch_np.nn
    sam.F = torch_np.F
    return sam


def _build_ref_encoder(sam, w, cfg):
    enc = sam.ImageEncoderViT(
        img_size=cfg["img_size"],
        patch_size=cfg["patch_size"],
        in_chans=cfg["in_chans"],
        embed_dim=cfg["embed_dim"],
        depth=cfg["depth"],
        num_heads=cfg["num_heads"],
        mlp_ratio=cfg["mlp_ratio"],
        out_chans=cfg["out_chans"],
        # the build_sam_vit_b shape (sam.py:476-513): rel-pos on, abs-pos
        # on, windowed except global_attn_indexes; norm/act passed
        # explicitly because the reference's def-time defaults captured
        # the import mocks
        norm_layer=partial(torch_np.LayerNorm, eps=1e-6),
        act_layer=torch_np.GELU,
        use_abs_pos=True,
        use_rel_pos=True,
        window_size=cfg["window_size"],
        global_attn_indexes=cfg["global_attn_indexes"],
    )
    enc.patch_embed.proj.weight = w["patch_w"].copy()
    enc.patch_embed.proj.bias = w["patch_b"].copy()
    enc.pos_embed = torch_np.Tensor(w["pos_embed"])
    for blk, bw in zip(enc.blocks, w["blocks"]):
        assert blk.window_size == bw["window"]
        blk.norm1.weight = bw["ln1_w"].copy()
        blk.norm1.bias = bw["ln1_b"].copy()
        blk.attn.qkv.weight = bw["qkv_w"].copy()
        blk.attn.qkv.bias = bw["qkv_b"].copy()
        blk.attn.proj.weight = bw["proj_w"].copy()
        blk.attn.proj.bias = bw["proj_b"].copy()
        blk.attn.rel_pos_h = torch_np.Tensor(bw["rel_pos_h"])
        blk.attn.rel_pos_w = torch_np.Tensor(bw["rel_pos_w"])
        blk.norm2.weight = bw["ln2_w"].copy()
        blk.norm2.bias = bw["ln2_b"].copy()
        blk.mlp.lin1.weight = bw["mlp1_w"].copy()
        blk.mlp.lin1.bias = bw["mlp1_b"].copy()
        blk.mlp.lin2.weight = bw["mlp2_w"].copy()
        blk.mlp.lin2.bias = bw["mlp2_b"].copy()
    enc.neck[0].weight = w["neck1_w"].copy()
    enc.neck[1].weight = torch_np.Tensor(w["neck_ln1_w"])
    enc.neck[1].bias = torch_np.Tensor(w["neck_ln1_b"])
    enc.neck[2].weight = w["neck2_w"].copy()
    enc.neck[3].weight = torch_np.Tensor(w["neck_ln2_w"])
    enc.neck[3].bias = torch_np.Tensor(w["neck_ln2_b"])
    enc.net_2.weight = w["net2_w"].copy()
    enc.net_3.weight = w["net3_w"].copy()
    return enc


CFG_WINDOWED = {
    # grid 4x4, window 3 does NOT divide it -> the pad/partition path runs;
    # blocks 1,3 are global -> the decomposed rel-pos tables differ per kind
    "img_size": 64, "patch_size": 16, "in_chans": 3, "embed_dim": 64,
    "depth": 4, "num_heads": 4, "mlp_ratio": 2.0, "out_chans": 256,
    "window_size": 3, "global_attn_indexes": (1, 3),
}
CFG_DIVISIBLE = {
    # window 2 divides the 4x4 grid -> no padding branch
    "img_size": 64, "patch_size": 16, "in_chans": 3, "embed_dim": 32,
    "depth": 2, "num_heads": 2, "mlp_ratio": 4.0, "out_chans": 256,
    "window_size": 2, "global_attn_indexes": (1,),
}


@pytest.mark.parametrize("cfg,seed", [(CFG_WINDOWED, 3), (CFG_WINDOWED, 11), (CFG_DIVISIBLE, 5)])
def test_sam_encoder_parity(cfg, seed):
    sam = _import_ref_sam()
    w = snp.synthetic_sam_weights(
        seed=101 + seed, img_size=cfg["img_size"], patch_size=cfg["patch_size"],
        in_chans=cfg["in_chans"], embed_dim=cfg["embed_dim"], depth=cfg["depth"],
        num_heads=cfg["num_heads"], mlp_ratio=cfg["mlp_ratio"],
        out_chans=cfg["out_chans"], window_size=cfg["window_size"],
        global_attn_indexes=cfg["global_attn_indexes"],
    )
    enc = _build_ref_encoder(sam, w, cfg)
    x = np.random.default_rng(seed).normal(0.0, 0.5, (1, cfg["in_chans"], cfg["img_size"], cfg["img_size"]))

    ref = enc(torch_np.Tensor(x))
    mine = snp.sam_encoder_forward(w, x, cfg["num_heads"])

    assert mine.shape == ref.a.shape == (1, 1024, 1, 1)
    np.testing.assert_allclose(mine, ref.a, rtol=1e-10, atol=1e-12)
    assert np.std(mine) > 1e-6  # non-degenerate


def test_window_partition_roundtrip_parity():
    """sam.py:516-562 partition/unpartition incl. the padding crop."""
    sam = _import_ref_sam()
    rng = np.random.default_rng(17)
    x = rng.normal(0.0, 1.0, (2, 5, 7, 6))
    ref_win, ref_hw = sam.window_partition(torch_np.Tensor(x), 3)
    my_win, my_hw = snp.window_partition(x, 3)
    assert my_hw == tuple(ref_hw)
    np.testing.assert_array_equal(my_win, ref_win.a)
    ref_back = sam.window_unpartition(ref_win, 3, ref_hw, (5, 7))
    my_back = snp.window_unpartition(my_win, 3, my_hw, (5, 7))
    np.testing.assert_array_equal(my_back, ref_back.a)
    np.testing.assert_array_equal(my_back, x)


def test_get_rel_pos_exact_path_parity():
    sam = _import_ref_sam()
    rng = np.random.default_rng(23)
    for q, k in [(4, 4), (3, 3), (6, 3), (3, 6)]:
        table = rng.normal(0.0, 1.0, (2 * max(q, k) - 1, 8))
        ref = sam.get_rel_pos(q, k, torch_np.Tensor(table))
        mine = snp.get_rel_pos(q, k, table)
        np.testing.assert_array_equal(mine, ref.a)
