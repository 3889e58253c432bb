"""Deterministic TableFormer serving model: the FULL M2-M5 numpy forward
chain under synthetic broadcast weights + the REAL deterministic
table-structure chain.

Per table, ``predict_table`` runs the real reference-parity math end to
end (reference /root/reference/docling_ibm_models/tableformer/models/
table04_rs/tablemodel04_rs.py:110-328): M2 conv/BN/pool encoder
(models/encoder_np.py), M3 input-filter + transformer encoder
(models/transformer_np.py), the M4 cached autoregressive decode loop
(TMTransformerDecoder discipline + last-token-only layers + in-loop
grammar corrections feeding back into the next step's embedding), and the
M5 bbox forward (models/bbox_decoder_np.py) over the decode loop's actual
per-slot hidden states.

*** Two honest fakes remain, both environment-blocked: (a) the crop
byte→pixel decode (no raster codec in-container) synthesizes a small
deterministic RGB image from the crop bytes before the REAL preprocessing
chain runs; (b) the per-step tag PROPOSAL is schedule-forced (md5-seeded
grid) through ``tag_decode_loop``'s constrained-decoding hook, because no
trained head checkpoint exists in-container and greedy argmax under
synthetic weights degenerates (never terminates or ends immediately —
measured). Greedy-argmax parity is pinned by tests/test_tag_decoder_np.py;
real checkpoint weights would slot into the same weight dicts. ***

Everything downstream of the decode IS the real, reference-parity-tested
chain (operators/): otsl_to_html → cell matching (J2) → 9-step matching
post-processor (A1-A9, J6) → response generation (J5) → merge (J4) →
index compaction (A11). ``predict_table`` therefore has the exact shape of
the reference's ``TFPredictor.predict``+``multi_table_predict``
(tf_predictor.py:457-576,698-836).
"""

from __future__ import annotations

import hashlib

from docling_ibm_models_spark.models import decoder_semantics
from docling_ibm_models_spark.operators import (
    cell_matcher as cm,
)
from docling_ibm_models_spark.operators import (
    otsl_ops,
    post_processor,
    response_gen,
)


# reference dataset config (tests/test_tf_predictor.py:54-64)
TF_IMG_MEAN = [0.94247851, 0.94254675, 0.94292611]
TF_IMG_STD = [0.17910956, 0.17940403, 0.17931663]
TF_RESIZED = 448


# Stub model config for the REAL numpy forwards (M2-M5): smaller dims than
# the reference checkpoint (512/28²) keep the per-table cost low;
# the math itself is reference-parity-tested at the reference dims in
# tests/test_bbox_decoder_np.py / test_tag_decoder_np.py. Dims are
# checkpoint config, not semantics.
BBOX_IN_CH = 64
BBOX_DIM = 128  # d_model of the tag transformer AND the bbox decoder dims
BBOX_ATT = 32
BBOX_SPATIAL = 6
TAG_HEADS = 4
TAG_FF = 256
TAG_LAYERS = 2


class DeterministicTableFormer:
    def __init__(self, weights: dict):
        from docling_ibm_models_spark.models import bbox_decoder_np as bnp
        from docling_ibm_models_spark.models import encoder_np
        from docling_ibm_models_spark.models import transformer_np as tnp

        self.grid_bias = int(weights.get("grid_bias", 0))
        seed = int(weights.get("bbox_seed", 7))
        # M5 weights: deterministic synthetics (no checkpoint in-container);
        # built once per executor-worker singleton (harness.get_or_create)
        self.bbox_w = bnp.synthetic_weights(
            seed=seed,
            encoder_dim=BBOX_DIM,
            in_ch=BBOX_IN_CH,
            attention_dim=BBOX_ATT,
            tag_decoder_dim=BBOX_DIM,
            decoder_dim=BBOX_DIM,
            num_classes=2,
        )
        # M2 mini-backbone (real conv/BN/pool math, encoder_np with
        # reference-class parity): 3→16→64 channels, stride-2 twice
        self.enc_stack = encoder_np.synthetic_encoder_stack(
            seed=seed + 1, channels=(3, 16, BBOX_IN_CH)
        )
        # M3/M4 tag-transformer weights: the shared input filter + encoder
        # stack + cached-decoder stack + embedding/fc head (all consumed by
        # REAL numpy forwards — transformer_np with reference parity)
        self.tag_w = {
            "input_filter": bnp.synthetic_weights(
                seed=seed + 2,
                encoder_dim=BBOX_DIM,
                in_ch=BBOX_IN_CH,
                attention_dim=BBOX_ATT,
                tag_decoder_dim=BBOX_DIM,
                decoder_dim=BBOX_DIM,
                num_classes=2,
            )["input_filter"],
            "enc_layers": tnp.synthetic_encoder_layers(
                seed=seed + 3, d_model=BBOX_DIM, dim_ff=TAG_FF, num_layers=TAG_LAYERS
            ),
            "dec_layers": tnp.synthetic_decoder_layers(
                seed=seed + 4, d_model=BBOX_DIM, dim_ff=TAG_FF, num_layers=TAG_LAYERS
            ),
        }
        self.tag_w.update(
            tnp.synthetic_tag_head(
                seed=seed + 5, d_model=BBOX_DIM, vocab_size=len(tnp.OTSL_WORD_MAP)
            )
        )

    @staticmethod
    def _prepare_crop(crop: bytes):
        """P1+P2+P4-P8 for REAL: synthesize a deterministic small RGB
        ndarray from the crop payload (no codec in-container — the byte →
        pixel decode is the only faked step), then run the reference's
        actual preprocessing chain (normalize → 448² bilinear resize →
        (C,W,H) transpose → /255 → batch dim; tf_predictor.py:990-1015)
        via operators/image_ops. The returned tensor seeds the decode, so
        the transform math is load-bearing and covered by the pinned
        pipeline signatures."""
        import numpy as np

        raw = hashlib.md5(crop if crop else b"").digest() * 12  # 192 bytes
        side = 8
        img = np.frombuffer(raw, dtype=np.uint8)[: side * side * 3].reshape(
            side, side, 3
        )
        from docling_ibm_models_spark.operators.image_ops import prepare_image

        return prepare_image(img, TF_IMG_MEAN, TF_IMG_STD, TF_RESIZED)

    def _decode_table(self, batch, sec=None):
        """M2-M5 as the FULL numpy forward chain (round-4 upgrade): the
        prepared image tensor runs the real M2 conv/BN/pool encoder
        (encoder_np, reference-class parity), the real M3 input-filter +
        transformer encoder (transformer_np), the real M4 cached decode
        loop (TMTransformerDecoder discipline + last-token layer + in-loop
        grammar corrections, transformer_np.tag_decode_loop — parity vs
        tablemodel04_rs.py:161-273 under tests/test_tag_decoder_np.py),
        and the real M5 bbox forward (bbox_decoder_np) over the decode
        loop's ACTUAL per-slot hidden states.

        The one non-real step besides the byte→pixel decode: the PROPOSAL
        tag at each decode step is schedule-forced (md5-seeded grid — the
        constrained-decoding hook of tag_decode_loop) rather than
        fc-argmax, because untrained synthetic head weights make greedy
        argmax degenerate (measured: sequences either never terminate or
        end immediately). Greedy-argmax parity is separately pinned by
        tests/test_tag_decoder_np.py; everything downstream of the
        proposal — corrections feeding back into the next step's
        embedding, cache updates, tag_H slot states, span-merge registry,
        cxcywh→xyxy — is the real reference-parity math over real floats.
        """
        from contextlib import nullcontext

        sec = sec if sec is not None else (lambda _n: nullcontext())
        h = hashlib.md5(
            batch.tobytes() if hasattr(batch, "tobytes") else (batch or b"")
        ).digest()
        rows = 2 + (h[0] + self.grid_bias) % 4  # 2..5
        cols = 2 + h[1] % 4  # 2..5
        header = h[2] % 2 == 0
        proposed: list[str] = []
        for r in range(rows):
            c = 0
            while c < cols:
                if r == 0 and header:
                    proposed.append("ched")
                    c += 1
                    continue
                b = h[(3 + r * cols + c) % 16]
                proposed.append("fcel")
                c += 1
                if b % 5 == 0 and c < cols:
                    # propose a horizontal span; occasionally propose the
                    # ungrammatical xcel, which the corrections rewrite
                    span = 1 + b % 2
                    for _ in range(span):
                        if c >= cols:
                            break
                        proposed.append("xcel" if b % 10 == 0 else "lcel")
                        c += 1
            proposed.append("nl")
        proposed.append("<end>")

        res = decoder_semantics.decode_postfix(proposed)
        rs_seq = [t for t in res.tags if t != "<end>"]

        import numpy as np

        from docling_ibm_models_spark.models import bbox_decoder_np as bnp
        from docling_ibm_models_spark.models import encoder_np
        from docling_ibm_models_spark.models import transformer_np as tnp

        # M2: real conv/BN/pool forward (encoder_np, reference-class
        # parity) over a deterministic strided downsample of the REAL
        # prepared image tensor (prepared pixels are mean/std-normalized,
        # ~unit scale — the synthetic BN stats consume them as-is)
        with sec("model_encoder"):
            side = batch.shape[-1]  # 448 after prepare_image
            idx = np.linspace(0, side - 1, 4 * BBOX_SPATIAL).astype(int)
            small = np.asarray(batch, dtype=np.float64)[:, :, idx][:, :, :, idx]
            enc_out = encoder_np.encoder04_forward(small, self.enc_stack, BBOX_SPATIAL)
            # standardize the feature map into the regime the synthetic
            # weights were calibrated for (trained checkpoints get this
            # from BN statistics fitted on real data; per-crop brightness
            # shifts would otherwise saturate the sigmoid heads)
            enc_out = (enc_out - enc_out.mean()) / (enc_out.std() + 1e-9) * 0.3
        # M3: real input-filter + transformer encoder over the feature map
        with sec("model_tag_transformer_encoder"):
            memory = tnp.tag_encoder_forward(self.tag_w, enc_out, TAG_HEADS)
        # M4: real cached decode loop — every step embeds the corrected
        # history, runs the TMTransformerDecoder cache discipline, and
        # buffers the REAL last-layer hidden state per bbox slot; only the
        # per-step PROPOSAL is schedule-forced (see docstring)
        with sec("model_tag_transformer_decoder"):
            loop = tnp.tag_decode_loop(
                self.tag_w,
                memory,
                tnp.OTSL_WORD_MAP,
                max_pred_len=len(proposed) + 2,
                n_heads=TAG_HEADS,
                forced_tags=[tnp.OTSL_WORD_MAP[t] for t in proposed],
            )
        # the loop's corrected stream and slot bookkeeping agree with
        # decode_postfix over the same proposals (both parity-tested
        # against the reference loop; decode_postfix supplies the slot→
        # (row, col) anchors the grid placement below needs)
        loop_tags = [tnp.OTSL_ID_TO_TAG[i] for i in loop["seq"][1:]]
        assert loop_tags == list(res.tags), (loop_tags, res.tags)
        tag_H = loop["tag_H"]
        assert tag_H.shape[0] == res.n_slots
        assert dict(loop["bboxes_to_merge"]) == dict(res.bboxes_to_merge)
        # M5: real bbox forward over the decode loop's ACTUAL slot states
        with sec("model_bbox_decoder"):
            logits, boxes = bnp.bbox_inference(self.bbox_w, enc_out, tag_H)
        # anchor the forward's sigmoid outputs as WITHIN-GRID-CELL offsets
        # (YOLO-style): a trained decoder reads the cell's position out of
        # tag_H; random synthetic weights cannot, so the grid supplies the
        # structure and the real forward supplies the per-cell offsets.
        # Slot (row, col) comes from the corrected tag stream.
        rc_at = []  # (row, col) of every output-tag index
        r_i = c_i = 0
        for tag in res.tags:
            rc_at.append((r_i, c_i))
            if tag == "nl":
                r_i, c_i = r_i + 1, 0
            elif tag != "<end>":
                c_i += 1
        slot_rc = [rc_at[t] for t in res.slot_steps]
        n_r = max(r_i, 1)
        n_c = max((max(c for _, c in slot_rc) + 1) if slot_rc else 1, 1)
        anchored = []
        for i, (r, c) in enumerate(slot_rc):
            ox, oy, ow_, oh_ = boxes[i]
            # cell text sits centered-ish horizontally and in the UPPER
            # part of its grid cell (typeset rows hug the cell top)
            anchored.append(
                [
                    (min(c, n_c - 1) + 0.2 + 0.6 * ox) / n_c,
                    (min(r, n_r - 1) + 0.12 + 0.5 * oy) / n_r,
                    (0.25 + 0.65 * ow_) / n_c,
                    (0.25 + 0.65 * oh_) / n_r,
                ]
            )
        # span merge keeps the first slot's class VECTOR, argmax after —
        # reference order (tablemodel04_rs.py:291-307, tf_predictor.py:632)
        class_vecs = [logits[i] for i in range(res.n_slots)]
        coords = anchored
        class_vecs, coords = decoder_semantics.merge_spans(
            class_vecs, coords, res.bboxes_to_merge
        )
        classes = [int(np.argmax(c)) for c in class_vecs]
        bboxes = [
            [round(v, 6) for v in decoder_semantics.box_cxcywh_to_xyxy(b)]
            for b in coords
        ]
        return rs_seq, bboxes, classes

    def predict_table(
        self,
        iocr_page: dict,
        table_bbox: list[float],
        crop: bytes,
        correct_overlapping_cells: bool = False,
        profiler=None,
    ):
        """Full per-table flow (reference predict() :698-836 minus torch):
        decode → square check → sync repair → otsl_to_html → match_cells →
        post-process (guarded like the reference :809-818) → response →
        sort → merge → compaction.

        ``profiler`` (functions/profiler.py) records wall time under the
        reference's own section names (BASELINE.md protocol); the stubbed
        decode is charged to the decoder section it stands in for."""
        from contextlib import nullcontext

        from docling_ibm_models_spark.functions.profiler import SectionProfiler

        prof = profiler if profiler is not None else SectionProfiler()
        sec = prof.section if prof else (lambda _n: nullcontext())

        # image preprocessing runs OUTSIDE every profiled section, exactly
        # like the reference (_prepare_image at tf_predictor.py:731 sits
        # between start_agg and the first begin()); the prepared tensor
        # seeds the fake decode so the real transform chain is load-bearing
        batch = self._prepare_crop(crop)  # (1, 3, 448, 448) float32
        with sec("predict_total"):
            # per-stage sections mirror the reference's own profiler names
            # (tablemodel04_rs.py:130-280): model_encoder,
            # model_tag_transformer_encoder, model_tag_transformer_decoder,
            # model_bbox_decoder
            rs_seq, bboxes, classes = self._decode_table(batch, sec=sec)
            if not otsl_ops.is_square(rs_seq):
                rs_seq = otsl_ops.pad_to_square(rs_seq, "lcel")
            html_seq = otsl_ops.otsl_to_html(rs_seq)
            prediction = {
                "rs_seq": rs_seq,
                "html_seq": html_seq,
                "bboxes": bboxes,
                "classes": classes,
            }
            _sync, prediction["bboxes"] = response_gen.check_bbox_sync(prediction)

            with sec("matching"):
                details = cm.match_cells(iocr_page, table_bbox, prediction)
            if prediction["bboxes"] and iocr_page["tokens"]:
                with sec("post_process"):
                    details = post_processor.process(
                        details, correct_overlapping_cells
                    )
            else:
                # no matching possible: string-key the raw matches like step 5
                details["matches"] = {}

            with sec("generate_docling_response"):
                resp = response_gen.generate_tf_response(
                    details["table_cells"], details["matches"]
                )
                resp.sort(key=lambda c: c["cell_id"])
                merged = response_gen.merge_tf_output(resp, details["pdf_cells"])
                num_cols, num_rows = response_gen.compact_row_col_indexes(merged)
        return {
            "tf_cells": merged,
            "otsl_seq": rs_seq,
            "num_cols": num_cols,
            "num_rows": num_rows,
            "profile": prof.snapshot(),
        }


def default_weights() -> dict:
    return {"grid_bias": 0, "bbox_seed": 7}
