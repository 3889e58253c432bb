"""Code/formula predictor (M7) and figure classifier (M8) — deterministic
parts from scratch, neural forwards stubbed.

Parity surfaces (verified in tests/test_aux_predictors.py by importing the
reference with fake torch modules; no code copied):
* ``strip_latex_tail`` ↔ reference ``CodeFormulaPredictor._strip``
  (/root/reference/docling_ibm_models/code_formula_model/code_formula_predictor.py:146-169)
  — P18, the iterative trailing-junk stripper for generated LaTeX/code;
* ``build_prompt`` ↔ ``_get_prompt`` (:109-144) — the 256-<imgpad> VLM
  prompt template;
* ``topk_sort`` ↔ the classifier's per-image descending prob sort
  (document_figure_classifier_predictor.py:170-175) — A13.

*** The SAM-ViT + OPT generate (M7) and EfficientNet forward (M8) are
DETERMINISTIC FAKES (md5-seeded), as torch/weights are unavailable; batch
shaping and output contracts are real. ***
"""

from __future__ import annotations

import functools
import hashlib

_REMOVE_TAIL = [r"\quad", r"\\", r"\,", " c c c c", " l l l l l"]

FIGURE_CLASSES = [
    "bar_chart", "bar_code", "chemistry_markush_structure",
    "chemistry_molecular_structure", "flow_chart", "icon", "line_chart",
    "logo", "map", "other", "pie_chart", "qr_code", "remote_sensing",
    "screenshot", "signature", "stamp",
]


def strip_latex_tail(text: str) -> str:
    """P18 — iteratively strip trailing ``\\quad``/``\\\\``/… then
    whitespace (reference-parity)."""
    changed = True
    while changed:
        changed = False
        for sub in _REMOVE_TAIL:
            if text.endswith(sub):
                text = text[: -len(sub)]
                changed = True
    return text.strip()


def build_prompt(label: str) -> str:
    """M7 prompt template (reference-parity): 256 image-pad tokens + the
    code/formula query."""
    if label == "code":
        query = "<code_image_to_text>"
    elif label == "formula":
        query = "<equation>"
    else:
        raise NotImplementedError("Label must be either code or formula")
    return (
        "A chat between a curious user and an artificial intelligence"
        " assistant. The assistant gives helpful, detailed, and polite answers to"
        " the user's questions. USER: "
        + "<img>" + "<imgpad>" * 256 + "</img>" + "\n" + " ASSISTANT:" + "\n" + query
    )


def topk_sort(class_probs: list[float], classes: list[str] | None = None):
    """A13 — per-image (class, prob) list sorted by prob desc
    (reference-parity: stable sort, original order on ties)."""
    classes = classes or FIGURE_CLASSES
    preds = [(classes[i], p) for i, p in enumerate(class_probs)]
    preds.sort(key=lambda t: t[1], reverse=True)
    return preds


def validate_predict_inputs(images, labels, temperature=0.0):
    """The reference predict()'s deterministic input-validation contract
    (code_formula_predictor.py:196-227, covered by reference
    tests/test_code_formula_predictor.py:63-111): temperature must be a
    non-negative number (plain Exception otherwise), image/label counts
    must match (Exception), and unsupported image payload types raise
    TypeError. Returns do_sample (False when temperature == 0)."""
    if (
        temperature is None
        or not isinstance(temperature, (float, int))
        or temperature < 0
    ):
        raise Exception("Temperature must be a number greater or equal to 0.")
    do_sample = temperature != 0
    if len(labels) != len(images):
        raise Exception(
            "The number of images must be the same as the number of labels."
        )
    for image in images:
        if not isinstance(image, (bytes, bytearray, memoryview)):
            raise TypeError("Not supported input image format")
    return do_sample


class DeterministicCodeFormulaPredictor:
    """M7 stand-in: real input-validation contract + prompt build + stubbed
    generate + real tail strip."""

    def predict(
        self, images: list[bytes], labels: list[str], temperature: float = 0.0
    ) -> list[str]:
        validate_predict_inputs(images, labels, temperature)
        out = []
        for img, label in zip(images, labels):
            _prompt = build_prompt(label)  # raises on bad label, like reference
            h = hashlib.md5(img or b"").hexdigest()
            fake = (
                f"x = {int(h[:4], 16) % 100}" if label == "code"
                else f"\\frac{{{int(h[:2], 16)}}}{{{int(h[2:4], 16) + 1}}}" + r"\quad\\"
            )
            out.append(strip_latex_tail(fake))
        return out


class DeterministicFigureClassifier:
    """M8 stand-in: stubbed softmax + real top-k + input-type contract
    (reference document_figure_classifier_predictor.py:150-158 raises
    TypeError on unsupported payloads, covered by its
    tests/test_document_figure_classifier.py:64-71)."""

    def predict(self, images: list[bytes]) -> list[list[tuple[str, float]]]:
        for image in images:
            if not isinstance(image, (bytes, bytearray, memoryview)):
                raise TypeError("Not supported input image format")
        batch = []
        for img in images:
            h = hashlib.md5(img or b"").digest()
            raw = [h[i % 16] + 1 for i in range(len(FIGURE_CLASSES))]
            total = float(sum(raw))
            batch.append(topk_sort([v / total for v in raw]))
        return batch


class CodeFormulaVisionTower:
    """M7 with a REAL vision tower: deterministic pixel synthesis (no
    rasterizer in-container) → the real SamOptImageProcessor preprocessing
    chain (sam_opt_image_processor.py:11-29 semantics —
    operators/image_ops.py::code_formula_preprocess) → the real numpy SAM
    ViT forward (reference parity, models/sam_encoder_np.py). The OPT
    language side (sam_opt.py, HuggingFace) stays a deterministic fake,
    but it is now seeded by the REAL 1024-d vision features, so the served
    output exercises the full ported numeric path. With checkpoint
    weights, `weights["sam"]` and mean/std would load from artifacts and
    the same code serves the real model."""

    # ImageNet-style defaults; the checkpoint's values ship with its
    # artifacts (code_formula_predictor.py:89 from_pretrained)
    MEAN = (0.485, 0.456, 0.406)
    STD = (0.229, 0.224, 0.225)

    def __init__(self, weights: dict):
        self.w = weights

    def _synth_pixels(self, payload: bytes) -> "np.ndarray":
        import numpy as np

        h = hashlib.md5(payload or b"").digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        return rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)

    def encode(self, payload: bytes) -> "np.ndarray":
        import numpy as np

        from docling_ibm_models_spark.models.sam_encoder_np import sam_encoder_forward
        from docling_ibm_models_spark.operators.image_ops import code_formula_preprocess

        img = self._synth_pixels(payload)
        x = code_formula_preprocess(
            img, self.MEAN, self.STD, size=(self.w["img_size"], self.w["img_size"])
        )
        feats = sam_encoder_forward(self.w["sam"], x[None], self.w["num_heads"])
        return np.asarray(feats).reshape(-1)  # (1024,)

    def predict(self, payloads: list[bytes], labels: list[str]):
        """Returns (texts, features): texts via the reference prompt/strip
        contract, deterministic content seeded by the real features."""
        validate_predict_inputs(payloads, labels)
        texts, feats = [], []
        for payload, label in zip(payloads, labels):
            _prompt = build_prompt(label)  # raises on bad label, like reference
            f = self.encode(payload)
            feats.append(f)
            k = int(abs(float(f[:8].sum())) * 1e6) % 97
            fake = (
                f"y = {k}" if label == "code"
                else f"\\frac{{{k}}}{{{(k % 9) + 1}}}" + r"\quad\\"
            )
            texts.append(strip_latex_tail(fake))
        return texts, feats


@functools.lru_cache(maxsize=4)
def default_vision_weights(seed: int = 47) -> dict:
    """Small-config synthetic SAM weights for the serving stub (dims are
    checkpoint config; the graph/math is the reference's, parity-tested in
    tests/test_sam_encoder_np.py). Memoized — the 52 MB dict costs ~1.8 s
    to synthesize and every caller treats it as read-only (it goes
    straight into a broadcast)."""
    from docling_ibm_models_spark.models.sam_encoder_np import synthetic_sam_weights

    return {
        "img_size": 64,
        "num_heads": 2,
        "sam": synthetic_sam_weights(
            seed=seed, img_size=64, patch_size=16, embed_dim=32, depth=2,
            num_heads=2, mlp_ratio=2.0, out_chans=256, window_size=3,
            global_attn_indexes=(1,),
        ),
    }


class FigureClassifierVision:
    """M8 with the REAL preprocessing chain: deterministic pixel synthesis
    → the reference-hardcoded Resize-224/ToTensor/Normalize transform
    (document_figure_classifier_predictor.py:92-99 —
    operators/image_ops.py::figure_classifier_preprocess) feeding a
    deterministic softmax stand-in for the library-blocked EfficientNet
    forward; the per-class scores are functions of the REAL preprocessed
    tensor (16 spatial-quadrant channel means), so the served path
    exercises the ported pixel math end-to-end. Real top-k contract (A13)."""

    def __init__(self, weights: dict | None = None):
        self.w = weights or {}

    def _synth_pixels(self, payload: bytes) -> "np.ndarray":
        import numpy as np

        h = hashlib.md5(payload or b"").digest()
        rng = np.random.default_rng(int.from_bytes(h[8:], "big"))
        return rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)

    def predict(self, payloads: list[bytes]) -> list[list[tuple[str, float]]]:
        import numpy as np

        from docling_ibm_models_spark.operators.image_ops import (
            figure_classifier_preprocess,
        )

        out = []
        for payload in payloads:
            if not isinstance(payload, (bytes, bytearray, memoryview)):
                raise TypeError("Not supported input image format")
            x = figure_classifier_preprocess(self._synth_pixels(bytes(payload)))
            # 16 logits: per-channel means over a 2x2 spatial grid + 4
            # global stats — deterministic functions of the real tensor
            qs = [
                float(x[c, i * 112 : (i + 1) * 112, j * 112 : (j + 1) * 112].mean())
                for c in range(3) for i in range(2) for j in range(2)
            ]
            logits = np.array(qs + [float(x.mean()), float(x.std()),
                                    float(x.max()), float(x.min())])
            logits = logits * 8.0  # spread so top-1 is decisive
            e = np.exp(logits - logits.max())
            probs = (e / e.sum()).tolist()
            out.append(topk_sort([round(p, 6) for p in probs]))
        return out
