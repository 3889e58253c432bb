"""Spark model stages: pages → page_recs → layout clusters → table cells.

The SURVEY.md §3 lifecycle, stages 1-2. Each stage is one Arrow-batched
``mapInPandas`` whose kernel follows the executor-singleton + broadcast
pattern (models/harness.py). The neural forwards are deterministic stubs
(clearly marked in models/*_stub.py); the surrounding plumbing — schemas,
batching, weight broadcast, per-table deterministic chain (matcher →
post-processor → response, all reference-parity-tested) — is real.

Rendering note: with no rasterizer in the container, ``page_records_stage``
"renders" deterministically: the image column carries the page's raw bytes
(decode stubbed), and OCR tokens are typeset from the ground-truth text by
a simple deterministic line-flow — giving real token geometry for the
matcher without cv2/PIL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_ibm_models_spark import schemas
from docling_ibm_models_spark.models import harness
from docling_ibm_models_spark.models.layout_stub import (
    DeterministicLayoutModel,
)
from docling_ibm_models_spark.models.tableformer_stub import (
    DeterministicTableFormer,
)

PAGE_W, PAGE_H = 1237, 1612  # ADS fixture raster dims (FIXTURES.md §2)
_MARGIN, _CHAR_W, _LINE_H = 50.0, 7.0, 18.0


def typeset_tokens(text: str) -> list[dict]:
    """Deterministic line-flow typesetting: words → top-left-origin token
    bboxes (the OCR-token stand-in; real geometry for the matcher)."""
    tokens = []
    x, y = _MARGIN, _MARGIN
    for i, word in enumerate(text.split()):
        w = max(len(word), 1) * _CHAR_W
        if x + w > PAGE_W - _MARGIN:
            x = _MARGIN
            y += _LINE_H
        tokens.append(
            {
                "id": i,
                "text": word,
                "l": x,
                "t": y,
                "r": x + w,
                "b": y + _LINE_H - 4.0,
                "confidence": 1.0,
            }
        )
        x += w + _CHAR_W
    return tokens


def _table_bboxes_for(url: str, n_tokens: int) -> list[list[float]]:
    """0-2 deterministic table regions per page (x1,y1,x2,y2 top-left),
    placed over the typeset-token zone so the matcher has text to match."""
    k = (sum(url.encode()) + n_tokens) % 3
    boxes = [[178.0, 55.0, 1061.0, 220.0], [100.0, 150.0, 900.0, 420.0]]
    return boxes[:k]


def page_records_stage(pages: DataFrame) -> DataFrame:
    """pages (input_hint shape) → page_recs (iOCR-page analogue)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                tokens = typeset_tokens(text or "")
                rows.append(
                    {
                        "url": url,
                        "page_no": 0,
                        "image": bytes(html or b""),
                        "width": PAGE_W,
                        "height": PAGE_H,
                        "tokens": tokens,
                        "table_bboxes": _table_bboxes_for(url, len(tokens)),
                    }
                )
            yield pd.DataFrame(rows)

    return pages.select("url", "html", "text").mapInPandas(
        gen, schema=schemas.PAGE_RECS
    )


def layout_stage(page_recs: DataFrame, weights_bc) -> DataFrame:
    """M1 — page image batch → exploded layout clusters. Model built once
    per python worker from the broadcast weights."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = harness.get_or_create(
            "layout", lambda: DeterministicLayoutModel(weights_bc.value)
        )
        for pdf in batches:
            if not len(pdf):
                continue
            preds = model.predict_batch(
                list(pdf["image"]), list(pdf["width"]), list(pdf["height"])
            )
            rows = []
            for url, page_no, clusters in zip(pdf["url"], pdf["page_no"], preds):
                for c in clusters:
                    rows.append({"url": url, "page_no": int(page_no), **c})
            if rows:
                yield pd.DataFrame(rows)

    return page_recs.select("url", "page_no", "image", "width", "height").mapInPandas(
        gen, schema=schemas.LAYOUT_CLUSTER
    )


def table_structure_stage(
    page_recs: DataFrame, weights_bc, correct_overlapping_cells: bool = False
) -> DataFrame:
    """M2-M6 + J2 + A1-A9/J6 + J5/J4/A11 — per (page, table_bbox) pair:
    the stubbed decode feeds the real reference-parity chain."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = harness.get_or_create(
            "tableformer", lambda: DeterministicTableFormer(weights_bc.value)
        )
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                iocr_page = {
                    # flattened Arrow token structs → iOCR token dicts
                    "tokens": [
                        {
                            "id": int(t["id"]),
                            "text": t["text"],
                            "bbox": [t["l"], t["t"], t["r"], t["b"]],
                        }
                        for t in r.tokens
                    ],
                    "width": int(r.width),
                    "height": int(r.height),
                }
                for t_idx, bbox in enumerate(r.table_bboxes):
                    crop = bytes(r.image or b"") + bytes([t_idx])
                    # per-table profiling cycle into the worker's sliding
                    # window (reference AggProfiler.start_agg per predict)
                    cycle = harness.get_profiler("tableformer").start_cycle()
                    out = model.predict_table(
                        iocr_page, list(bbox), crop, correct_overlapping_cells,
                        profiler=cycle,
                    )
                    cells = []
                    for i, c in enumerate(out["tf_cells"]):
                        bb = c["bbox"] if isinstance(c["bbox"], dict) else {}
                        cells.append(
                            {
                                "cell_id": i,
                                "bbox": {
                                    "b": bb.get("b"),
                                    "l": bb.get("l"),
                                    "r": bb.get("r"),
                                    "t": bb.get("t"),
                                    "token": bb.get("token"),
                                },
                                "row_span": c["row_span"],
                                "col_span": c["col_span"],
                                "start_row_offset_idx": c["start_row_offset_idx"],
                                "end_row_offset_idx": c["end_row_offset_idx"],
                                "start_col_offset_idx": c["start_col_offset_idx"],
                                "end_col_offset_idx": c["end_col_offset_idx"],
                                "indentation_level": c["indentation_level"],
                                "text_cell_bboxes": c["text_cell_bboxes"],
                                "column_header": c["column_header"],
                                "row_header": c["row_header"],
                                "row_section": c["row_section"],
                            }
                        )
                    rows.append(
                        {
                            "url": r.url,
                            "page_no": int(r.page_no),
                            "table_id": t_idx,
                            "otsl_seq": out["otsl_seq"],
                            "num_rows": out["num_rows"],
                            "num_cols": out["num_cols"],
                            "table_cells": cells,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return page_recs.mapInPandas(gen, schema=schemas.TABLES)


def code_formula_stage(clusters: DataFrame, weights_bc) -> DataFrame:
    """M7 — layout clusters labeled Code/Formula → text + REAL SAM vision
    features. The vision tower runs the full ported numeric path per
    region (SamOptImageProcessor preprocessing → SAM ViT forward,
    reference parity — models/sam_encoder_np.py); the OPT generate is a
    deterministic fake seeded by those features. Executor-singleton +
    broadcast weights, same serving shape as the other model stages. The
    feature head/norm are rounded to 6dp so the stage signature is stable
    across BLAS threading configurations."""
    from docling_ibm_models_spark.models.aux_predictors import CodeFormulaVisionTower

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = harness.get_or_create(
            "code_formula", lambda: CodeFormulaVisionTower(weights_bc.value)
        )
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                f"{r.url}|{int(r.page_no)}|{r.l:.4f},{r.t:.4f},{r.r:.4f},{r.b:.4f}".encode()
                for r in pdf.itertuples()
            ]
            labels = ["code" if lb == "Code" else "formula" for lb in pdf["label"]]
            texts, feats = model.predict(payloads, labels)
            rows = []
            for r, text, f in zip(pdf.itertuples(), texts, feats):
                rows.append(
                    {
                        "url": r.url,
                        "page_no": int(r.page_no),
                        "label": r.label,
                        "l": float(r.l),
                        "t": float(r.t),
                        "r": float(r.r),
                        "b": float(r.b),
                        "text": text,
                        "feat_norm": round(float((f * f).sum() ** 0.5), 6),
                        "feat_head": [round(float(v), 6) for v in f[:4]],
                    }
                )
            yield pd.DataFrame(rows)

    region = clusters.where(F.col("label").isin("Code", "Formula"))
    return region.mapInPandas(gen, schema=schemas.CODE_FORMULA)


def figure_classifier_stage(clusters: DataFrame, weights_bc) -> DataFrame:
    """M8 — Picture clusters → figure class top-k. The stage runs the REAL
    reference-hardcoded preprocessing (Resize-224 PIL-bilinear → ToTensor →
    Normalize) per region; the EfficientNet forward itself is the
    deterministic stand-in seeded by the real preprocessed tensor. Same
    executor-singleton + broadcast serving shape as the other stages."""
    from docling_ibm_models_spark.models.aux_predictors import FigureClassifierVision

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = harness.get_or_create(
            "figure_classifier", lambda: FigureClassifierVision(weights_bc.value)
        )
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                f"{r.url}|{int(r.page_no)}|{r.l:.4f},{r.t:.4f},{r.r:.4f},{r.b:.4f}".encode()
                for r in pdf.itertuples()
            ]
            preds = model.predict(payloads)
            rows = []
            for r, topk in zip(pdf.itertuples(), preds):
                rows.append(
                    {
                        "url": r.url,
                        "page_no": int(r.page_no),
                        "l": float(r.l),
                        "t": float(r.t),
                        "figure_class": topk[0][0],
                        "confidence": round(float(topk[0][1]), 6),
                        "top3": [c for c, _ in topk[:3]],
                    }
                )
            yield pd.DataFrame(rows)

    region = clusters.where(F.col("label") == "Picture")
    return region.mapInPandas(gen, schema=schemas.FIGURE_CLASS)
