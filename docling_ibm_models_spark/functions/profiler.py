"""Per-section wall-time profiler, reference-section-name compatible.

The reference instruments its table pipeline with an aggregating profiler
(/root/reference/docling_ibm_models/tableformer/utils/app_profiler.py:30-254;
sections wired at tablemodel04_rs.py:130-280 and tf_predictor.py:814-827).
BASELINE.md commits us to reporting per-stage timings under the same
section names for comparability; this is the lightweight Spark-side
equivalent — per-task section sums that aggregate via plain DataFrame
operations instead of a process-global singleton.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# reference section names (tablemodel04_rs.py / tf_predictor.py)
SECTIONS = (
    "predict_total",
    "model_encoder",
    "model_tag_transformer_encoder",
    "model_tag_transformer_decoder",
    "model_bbox_decoder",
    "matching",
    "post_process",
    "generate_docling_response",
)


class SectionProfiler:
    def __init__(self) -> None:
        self.dt: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    @contextmanager
    def section(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.dt[name] = self.dt.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def snapshot(self) -> dict[str, float]:
        return {k: round(v, 6) for k, v in self.dt.items()}
