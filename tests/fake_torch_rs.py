"""Computing fake-torch harness: executes the REFERENCE TableModel04_rs
``predict()`` loop (tablemodel04_rs.py:110-328) with prescribed per-step
argmax proposals and prescribed bbox-decoder outputs, so the loop's
deterministic semantics (grammar corrections, bbox-slot emission, span
merge) run for real and can be parity-checked against
docling_ibm_models_spark.models.decoder_semantics.

The module-global ``torch`` inside tablemodel04_rs is swapped for the
minimal namespace below; the neural submodules (_encoder, _tag_transformer,
_bbox_decoder) are replaced with fakes that replay the prescribed streams.
Only the ops the predict() source actually uses are implemented.
"""

from __future__ import annotations

import types

from . import ref_import

WORD_MAP_TAG = {
    "<pad>": 0,
    "<unk>": 1,
    "<start>": 2,
    "<end>": 3,
    "ecel": 4,
    "fcel": 5,
    "lcel": 6,
    "ucel": 7,
    "xcel": 8,
    "nl": 9,
    "ched": 10,
    "rhed": 11,
    "srow": 12,
}
ID_TO_TAG = {v: k for k, v in WORD_MAP_TAG.items()}


class Blob:
    """Stand-in for encoder tensors: every shape-op returns self."""

    def permute(self, *a):
        return self

    def view(self, *a):
        return self

    def to(self, *a, **k):
        return self

    def size(self, *a):
        return 1

    @property
    def shape(self):
        return (1,)

    def __eq__(self, other):  # torch.zeros(...) == torch.ones(...)
        return Blob()

    __hash__ = None


class Vec:
    def __init__(self, vals):
        self.vals = list(vals)

    def to(self, *a, **k):
        return self

    def unsqueeze(self, dim):
        return Rows([[v] for v in self.vals])


class Rows:
    """decoded_tags: (steps, 1) int tensor."""

    def __init__(self, rows):
        self.rows = rows

    def to(self, *a, **k):
        return self

    def squeeze(self):
        flat = [r[0] for r in self.rows]
        return Vec(flat) if len(flat) > 1 else _Scalar(flat[0])

    def tolist(self):
        return [r[0] for r in self.rows]


class _Scalar:
    def __init__(self, v):
        self.v = v

    def tolist(self):
        return self.v


Vec.tolist = lambda self: list(self.vals)


class StepMark:
    """decoded[-1, :, :] — identifies the decode step for _fc."""

    def __init__(self, step):
        self.step = step


class Decoded:
    def __init__(self, step):
        self.step = step

    def __getitem__(self, idx):
        return StepMark(self.step)


class Logits:
    def __init__(self, tag_id):
        self.tag_id = tag_id

    def argmax(self, dim):
        return self

    def item(self):
        return self.tag_id


class BB(list):
    """bbox coord/class rows: list with .to()."""

    def to(self, *a, **k):
        return self


class FakeSeq(list):
    def to(self, *a, **k):
        return self


def _fake_torch():
    t = types.SimpleNamespace()
    t.LongTensor = lambda vals: Vec(vals)
    t.cat = lambda parts, dim=0: Rows(
        [r for p in parts for r in (p.rows if isinstance(p, Rows) else [[v] for v in p.vals])]
    )
    t.tensor = lambda vals, **k: BB(vals)
    t.stack = lambda lst, **k: FakeSeq(lst)
    t.empty = lambda n, **k: FakeSeq()
    t.zeros = lambda *a, **k: Blob()
    t.ones = lambda *a, **k: Blob()
    return t


class FakeTagTransformer:
    def __init__(self, proposed_ids):
        self._proposed = list(proposed_ids)
        self._n_heads = 1
        self._input_filter = lambda x: Blob()
        self._encoder = lambda x, mask=None: Blob()
        self._embedding = lambda dt: dt
        self._positional_encoding = lambda x: x
        self._fc = lambda mark: Logits(
            self._proposed[mark.step]
            if mark.step < len(self._proposed)
            else WORD_MAP_TAG["<end>"]
        )

    def eval(self):
        pass

    def _decoder(self, emb, enc, cache, memory_key_padding_mask=None):
        # emb is decoded_tags (Rows): rows = [<start>, out...] -> step index
        return Decoded(len(emb.rows) - 1), cache


class FakeBBoxDecoder:
    """Returns prescribed per-slot (class, coord) streams; records how many
    slots the loop actually emitted."""

    def __init__(self, classes, coords):
        self.classes = classes
        self.coords = coords
        self.received_slots = None

    def inference(self, enc_out, tag_H_buf):
        self.received_slots = len(tag_H_buf)
        if len(tag_H_buf) > len(self.coords):
            raise AssertionError(
                f"loop emitted {len(tag_H_buf)} slots > {len(self.coords)} prescribed"
            )
        n = len(tag_H_buf)
        return (
            FakeSeq(BB([c]) for c in self.classes[:n]),
            FakeSeq(BB(c) for c in self.coords[:n]),
        )


def run_reference_decode(proposed_tags, coords, classes, max_pred_len=512):
    """Run the reference predict() with prescribed proposals/bboxes.

    Returns (seq_tags_without_start, n_slots, merged_classes, merged_coords)
    with plain-python types.
    """
    ref_import.install()
    import docling_ibm_models.tableformer.models.table04_rs.tablemodel04_rs as tm

    tm.torch = _fake_torch()
    m = tm.TableModel04_rs.__new__(tm.TableModel04_rs)
    m._device = "cpu"
    m._prof = False
    m._bbox = True
    m._max_pred_len = max_pred_len
    m._init_data = {"word_map": {"word_map_tag": WORD_MAP_TAG}}
    m._encoder = lambda imgs: Blob()
    m._tag_transformer = FakeTagTransformer(
        [WORD_MAP_TAG[t] for t in proposed_tags]
    )
    bb = FakeBBoxDecoder(classes, coords)
    m._bbox_decoder = bb

    seq, out_cls, out_coord = m.predict(Blob(), max_steps=None, k=1)
    tags = [ID_TO_TAG[i] for i in seq[1:]]  # drop <start>
    merged_cls = [c[0] for c in out_cls]
    merged_coord = [list(c) for c in out_coord]
    return tags, bb.received_slots, merged_cls, merged_coord


# ---------------------------------------------------------------------------
# Real-numerics variant: the same reference predict() loop, but the bbox
# decoder is the repo's REAL numpy forward (models/bbox_decoder_np.py) and
# the per-step decoder states are real vectors — the loop's grammar
# corrections, slot emission, span merge and mergebboxes all run over real
# numbers end-to-end.
# ---------------------------------------------------------------------------
class RealDecoded:
    """decoded: [-1, :, :] yields itself — carries (step, real vector)."""

    def __init__(self, step, vec):
        self.step = step
        self.vec = vec

    def __getitem__(self, idx):
        return self


class FakeTagTransformerReal(FakeTagTransformer):
    def __init__(self, proposed_ids, vec_fn):
        super().__init__(proposed_ids)
        self.vec_fn = vec_fn

    def _decoder(self, emb, enc, cache, memory_key_padding_mask=None):
        step = len(emb.rows) - 1
        return RealDecoded(step, self.vec_fn(step)), cache


class RealNumpyBBoxDecoder:
    """reference-parity numpy forward behind the loop's decoder contract."""

    def __init__(self, weights):
        self.w = weights
        self.received_slots = None

    def inference(self, enc_out, tag_H_buf):
        import numpy as np

        from docling_ibm_models_spark.models import bbox_decoder_np as bnp

        self.received_slots = len(tag_H_buf)
        enc = enc_out.a if hasattr(enc_out, "a") else np.asarray(enc_out)
        dim = self.w["att_tag"]["w"].shape[1]
        tag_h = (
            np.vstack([t.vec for t in tag_H_buf])
            if tag_H_buf
            else np.empty((0, dim))
        )
        cls, box = bnp.bbox_inference(self.w, enc, tag_h)
        return (
            FakeSeq(BB(c.tolist()) for c in cls),
            FakeSeq(BB(b.tolist()) for b in box),
        )


def run_reference_decode_real_bbox(
    proposed_tags, weights, enc_nhwc, vec_fn, max_pred_len=512
):
    """Reference predict() with prescribed tag proposals but REAL bbox
    numerics. Returns (tags, n_slots, merged_class_vectors, merged_coords)."""
    ref_import.install()
    from . import torch_np

    import docling_ibm_models.tableformer.models.table04_rs.tablemodel04_rs as tm

    tm.torch = _fake_torch()
    m = tm.TableModel04_rs.__new__(tm.TableModel04_rs)
    m._device = "cpu"
    m._prof = False
    m._bbox = True
    m._max_pred_len = max_pred_len
    m._init_data = {"word_map": {"word_map_tag": WORD_MAP_TAG}}
    m._encoder = lambda imgs: torch_np.Tensor(enc_nhwc)
    m._tag_transformer = FakeTagTransformerReal(
        [WORD_MAP_TAG[t] for t in proposed_tags], vec_fn
    )
    bb = RealNumpyBBoxDecoder(weights)
    m._bbox_decoder = bb

    seq, out_cls, out_coord = m.predict(Blob(), max_steps=None, k=1)
    tags = [ID_TO_TAG[i] for i in seq[1:]]
    return tags, bb.received_slots, [list(c) for c in out_cls], [list(c) for c in out_coord]


# ---------------------------------------------------------------------------
# FULLY-REAL variant: the reference predict() loop with the REAL
# Tag_Transformer — reference-authored TMTransformerDecoder cache discipline
# (transformer_rs.py:39-73) and TMTransformerDecoderLayer last-token math
# (transformer_rs.py:76-124) executing over torch_np primitives with seeded
# synthetic weights, real input-filter/encoder numerics, and the repo's real
# numpy bbox forward. Nothing in the tag path is prescribed: every tag comes
# out of fc(argmax) over real floats.
# ---------------------------------------------------------------------------
def _set_lin(lin, d):
    lin.weight = d["w"].copy()
    lin.bias = d["b"].copy()


def _set_bn(bn, d):
    bn.weight = d["weight"].copy()
    bn.bias = d["bias"].copy()
    bn.running_mean = d["running_mean"].copy()
    bn.running_var = d["running_var"].copy()


def _set_block(blk, d):
    blk.conv1.weight = d["conv1"].copy()
    _set_bn(blk.bn1, d["bn1"])
    blk.conv2.weight = d["conv2"].copy()
    _set_bn(blk.bn2, d["bn2"])
    if "down_conv" in d:
        blk.downsample[0].weight = d["down_conv"].copy()
        _set_bn(blk.downsample[1], d["down_bn"])


def _set_mha(mha, w_pack, b_pack, out_w, out_b):
    mha.in_proj_weight = w_pack.copy()
    mha.in_proj_bias = b_pack.copy()
    mha.out_proj.weight = out_w.copy()
    mha.out_proj.bias = out_b.copy()


class RealNumpyBBoxDecoderT(RealNumpyBBoxDecoder):
    """Accepts torch_np Tensors in tag_H_buf (the real loop emits those)."""

    def inference(self, enc_out, tag_H_buf):
        import numpy as np

        from docling_ibm_models_spark.models import bbox_decoder_np as bnp

        self.received_slots = len(tag_H_buf)
        enc = enc_out.a if hasattr(enc_out, "a") else np.asarray(enc_out)
        dim = self.w["att_tag"]["w"].shape[1]
        rows = [t.a if hasattr(t, "a") else t.vec for t in tag_H_buf]
        tag_h = np.vstack(rows) if rows else np.empty((0, dim))
        cls, box = bnp.bbox_inference(self.w, enc, tag_h)
        return (
            FakeSeq(BB(c.tolist()) for c in cls),
            FakeSeq(BB(b.tolist()) for b in box),
        )


def build_real_tag_transformer(w_tag, n_heads, dim_ff, enc_image_size=4):
    """Instantiate the reference Tag_Transformer (transformer_rs.py:125-171)
    under torch_np and seed every submodule from the synthetic weight dicts.
    The TM decoder classes are re-based onto torch_np's TransformerDecoder/
    Layer (their torch bases were import-time mocks, so the inherited
    __init__ would not build submodules) — the FORWARD code objects are the
    reference's own, untouched."""
    ref_import.install()
    from . import torch_np

    import docling_ibm_models.tableformer.models.table04_rs.transformer_rs as tr
    import docling_ibm_models.tableformer.utils.utils as u

    tr.torch = torch_np.torch
    tr.nn = torch_np.nn
    tr.Tensor = torch_np.Tensor
    u.torch = torch_np.torch
    u.nn = torch_np.nn
    u.F = torch_np.F
    u.BasicBlock = torch_np.BasicBlock
    u.conv1x1 = torch_np.conv1x1

    real_layer = type(
        "TMTransformerDecoderLayer",
        (torch_np.TransformerDecoderLayer,),
        {"forward": tr.TMTransformerDecoderLayer.forward},
    )
    real_decoder = type(
        "TMTransformerDecoder",
        (torch_np.TransformerDecoder,),
        {"forward": tr.TMTransformerDecoder.forward},
    )
    tr.TMTransformerDecoderLayer = real_layer
    tr.TMTransformerDecoder = real_decoder

    vocab, d_model = w_tag["embedding"].shape
    tt = tr.Tag_Transformer(
        "cpu",
        vocab,
        [],
        d_model,
        len(w_tag["enc_layers"]),
        len(w_tag["dec_layers"]),
        enc_image_size,
        n_heads=n_heads,
        dim_ff=dim_ff,
    )
    tt._embedding.weight = w_tag["embedding"].copy()
    _set_lin(tt._fc, w_tag["fc"])
    _set_block(tt._input_filter[0], w_tag["input_filter"]["b1"])
    _set_block(tt._input_filter[1], w_tag["input_filter"]["b2"])
    for mod, lw in zip(tt._encoder.layers, w_tag["enc_layers"]):
        _set_mha(mod.self_attn, lw["in_proj_w"], lw["in_proj_b"], lw["out_w"], lw["out_b"])
        mod.norm1.weight = lw["ln1_w"].copy()
        mod.norm1.bias = lw["ln1_b"].copy()
        mod.norm2.weight = lw["ln2_w"].copy()
        mod.norm2.bias = lw["ln2_b"].copy()
        mod.linear1.weight = lw["ff1_w"].copy()
        mod.linear1.bias = lw["ff1_b"].copy()
        mod.linear2.weight = lw["ff2_w"].copy()
        mod.linear2.bias = lw["ff2_b"].copy()
    for mod, lw in zip(tt._decoder.layers, w_tag["dec_layers"]):
        _set_mha(mod.self_attn, lw["in_proj_w"], lw["in_proj_b"], lw["out_w"], lw["out_b"])
        _set_mha(mod.multihead_attn, lw["c_in_proj_w"], lw["c_in_proj_b"], lw["c_out_w"], lw["c_out_b"])
        mod.linear1.weight = lw["ff1_w"].copy()
        mod.linear1.bias = lw["ff1_b"].copy()
        mod.linear2.weight = lw["ff2_w"].copy()
        mod.linear2.bias = lw["ff2_b"].copy()
        mod.norm1.weight = lw["ln1_w"].copy()
        mod.norm1.bias = lw["ln1_b"].copy()
        mod.norm2.weight = lw["ln2_w"].copy()
        mod.norm2.bias = lw["ln2_b"].copy()
        mod.norm3.weight = lw["ln3_w"].copy()
        mod.norm3.bias = lw["ln3_b"].copy()
    return tt


def run_reference_predict_real_tags(
    w_tag, w_bbox, enc_nhwc, n_heads=4, dim_ff=256, max_pred_len=48
):
    """Reference predict() with NOTHING prescribed: real tag transformer,
    real grammar corrections over its argmax stream, real bbox numerics.
    Returns (seq_ids, n_slots, merged_classes, merged_coords)."""
    ref_import.install()
    from . import torch_np

    import docling_ibm_models.tableformer.models.table04_rs.tablemodel04_rs as tm

    tm.torch = torch_np.torch
    tt = build_real_tag_transformer(w_tag, n_heads, dim_ff, enc_image_size=enc_nhwc.shape[1])
    m = tm.TableModel04_rs.__new__(tm.TableModel04_rs)
    m._device = "cpu"
    m._prof = False
    m._bbox = True
    m._max_pred_len = max_pred_len
    m._init_data = {"word_map": {"word_map_tag": WORD_MAP_TAG}}
    m._encoder = lambda imgs: torch_np.Tensor(enc_nhwc)
    m._tag_transformer = tt
    bb = RealNumpyBBoxDecoderT(w_bbox)
    m._bbox_decoder = bb

    seq, out_cls, out_coord = m.predict(Blob(), max_steps=None, k=1)
    return (
        [int(i) for i in seq],
        bb.received_slots,
        [list(c) for c in out_cls],
        [list(c) for c in out_coord],
    )
