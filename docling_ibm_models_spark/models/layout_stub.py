"""Deterministic layout-detection stub (M1 stand-in).

*** STUB — the container has no torch/transformers, so the RT-DETR
forward pass (reference
/root/reference/docling_ibm_models/layoutmodel/layout_predictor.py:110-177)
is replaced by a DETERMINISTIC FAKE: md5-seeded pseudo-detections whose
count/geometry depend only on (page bytes, weights). Everything around the
forward — batch assembly, score thresholding, class-id→label map with the
reference's +1 offset, blacklist filter, bbox clip to page — is the real
post-processing contract and is tested. Swapping in a real backend means
replacing ``_forward_batch`` only. ***
"""

from __future__ import annotations

import hashlib

import numpy as np

# the reference's 18-class map (layout_predictor.py:46-65) — public labels
CLASS_MAP = {
    1: "Caption",
    2: "Footnote",
    3: "Formula",
    4: "List-item",
    5: "Page-footer",
    6: "Page-header",
    7: "Picture",
    8: "Section-header",
    9: "Table",
    10: "Text",
    11: "Title",
    12: "Document Index",
    13: "Code",
    14: "Checkbox-Selected",
    15: "Checkbox-Unselected",
    16: "Form",
    17: "Key-Value Region",
    18: "Paragraph",
}

BLACKLIST_CLASSES: set[str] = set()  # reference default: empty (":67-68")
DEFAULT_THRESHOLD = 0.3  # production threshold (":71-73"); tests use 0.6


class DeterministicLayoutModel:
    """Pseudo-RT-DETR: weights = a broadcast numpy matrix that perturbs
    the md5-derived detections, so outputs provably depend on the
    broadcast weights (exercises the distribution path)."""

    def __init__(self, weights: dict):
        self.w = np.asarray(weights["proj"], dtype=np.float64)

    def _forward_batch(self, images: list[bytes]):
        """DETERMINISTIC FAKE forward: page bytes → raw (boxes, scores,
        class_ids) in normalized coords."""
        out = []
        for img in images:
            h = hashlib.md5(img if img else b"").digest()
            n = 3 + h[0] % 7  # 3..9 detections
            boxes, scores, ids = [], [], []
            for k in range(n):
                d = hashlib.md5(h + bytes([k])).digest()
                x1 = (d[0] / 255) * 0.8
                y1 = (d[1] / 255) * 0.8
                bw = 0.05 + (d[2] / 255) * 0.3
                bh = 0.03 + (d[3] / 255) * 0.2
                # weights perturb geometry (proves broadcast path matters)
                jitter = float(self.w[k % self.w.shape[0], 0]) * 0.01
                boxes.append([x1 + jitter, y1, min(x1 + bw, 1.2), min(y1 + bh, 1.1)])
                scores.append(0.25 + (d[4] / 255) * 0.75)
                ids.append(d[5] % 18)  # raw 0..17; +1 offset applied below
            out.append((boxes, scores, ids))
        return out

    def predict_batch(
        self, images: list[bytes], widths, heights, threshold: float = DEFAULT_THRESHOLD
    ) -> list[list[dict]]:
        """Real contract: threshold filter → label_id+1 map lookup →
        blacklist filter → clip to page (reference :144-177)."""
        results = []
        for (boxes, scores, ids), w, h in zip(self._forward_batch(images), widths, heights):
            clusters = []
            for box, score, cid in zip(boxes, scores, ids):
                if score < threshold:
                    continue
                label = CLASS_MAP.get(int(cid) + 1)
                if label is None or label in BLACKLIST_CLASSES:
                    continue
                clusters.append(
                    {
                        "l": min(max(box[0] * w, 0.0), w),
                        "t": min(max(box[1] * h, 0.0), h),
                        "r": min(max(box[2] * w, 0.0), w),
                        "b": min(max(box[3] * h, 0.0), h),
                        "label": label,
                        "confidence": float(score),
                    }
                )
            results.append(clusters)
        return results


def default_weights(seed: int = 42) -> dict:
    rng = np.random.RandomState(seed)
    return {"proj": rng.standard_normal((16, 4))}
