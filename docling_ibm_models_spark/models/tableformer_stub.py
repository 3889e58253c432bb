"""Deterministic TableFormer stub (M2-M6 stand-in) + the REAL deterministic
table-structure chain.

*** STUB — the CNN encoder / tag-transformer / autoregressive OTSL decoder
/ bbox decoder (reference
/root/reference/docling_ibm_models/tableformer/models/table04_rs/tablemodel04_rs.py:110-328)
need torch weights that are neither installed nor downloadable here, so
``_decode_table`` is a DETERMINISTIC FAKE: an md5-seeded grid whose OTSL
tags/bboxes depend only on the crop bytes. ***

Everything downstream of the decode IS the real, reference-parity-tested
chain (operators/): otsl_to_html → cell matching (J2) → 9-step matching
post-processor (A1-A9, J6) → response generation (J5) → merge (J4) →
index compaction (A11). ``predict_table`` therefore has the exact shape of
the reference's ``TFPredictor.predict``+``multi_table_predict``
(tf_predictor.py:457-576,698-836) with only the neural forward faked.
"""

from __future__ import annotations

import hashlib

from docling_ibm_models_spark.operators import (
    cell_matcher as cm,
)
from docling_ibm_models_spark.operators import (
    otsl_ops,
    post_processor,
    response_gen,
)


class DeterministicTableFormer:
    def __init__(self, weights: dict):
        self.grid_bias = int(weights.get("grid_bias", 0))

    def _decode_table(self, crop: bytes):
        """DETERMINISTIC FAKE of M2-M6: crop bytes → (rs_seq, bboxes,
        classes) — a plain rows×cols grid with an optional header row."""
        h = hashlib.md5(crop if crop else b"").digest()
        rows = 2 + (h[0] + self.grid_bias) % 4  # 2..5
        cols = 2 + h[1] % 4  # 2..5
        header = h[2] % 2 == 0
        rs_seq: list[str] = []
        bboxes: list[list[float]] = []
        classes: list[int] = []
        for r in range(rows):
            for c in range(cols):
                rs_seq.append("ched" if (r == 0 and header) else "fcel")
                x1, y1 = c / cols, r / rows
                bboxes.append([x1 + 0.01, y1 + 0.01, (c + 1) / cols - 0.01, (r + 1) / rows - 0.01])
                classes.append(2)
            rs_seq.append("nl")
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

        with sec("predict_total"):
            with sec("model_tag_transformer_decoder"):
                rs_seq, bboxes, classes = self._decode_table(crop)
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
    return {"grid_bias": 0}
