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


def resident_kb() -> int:
    """Resident set size in kB from /proc/self/statm (the reference's fast
    MemMonitor.get_memory path, mem_monitor.py:144-170); 0 off-Linux."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import os

        return pages * (os.sysconf("SC_PAGESIZE") // 1024)
    except Exception:
        return 0


class SectionProfiler:
    """Per-section wall sums + call counts + max resident kB (the
    reference Profiler's three metrics, app_profiler.py:38-137)."""

    def __init__(self) -> None:
        self.dt: dict[str, float] = {}
        self.calls: dict[str, int] = {}
        self.kb: dict[str, int] = {}

    @contextmanager
    def section(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.dt[name] = self.dt.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1
            self.kb[name] = max(self.kb.get(name, 0), resident_kb())

    def snapshot(self) -> dict[str, float]:
        return {k: round(v, 6) for k, v in self.dt.items()}

    def get_data(self, section_names=None) -> dict:
        """Reference Profiler.get_data shape (app_profiler.py:107-137):
        {section: {"dt", "calls", "kB"}}."""
        names = (
            [n for n in self.dt if n in section_names]
            if section_names is not None
            else list(self.dt)
        )
        return {
            n: {"dt": self.dt[n], "calls": self.calls[n], "kB": self.kb[n]}
            for n in names
        }


class AggSectionProfiler:
    """Cycle-windowed aggregation, mirroring the reference AggProfiler
    (app_profiler.py:148-254): ``start_cycle`` opens a fresh per-cycle
    profiler, a deque keeps the newest ``window_size`` cycles (newest at
    index 0), and ``get_data`` reports the last cycle plus mean/median of
    every metric per section across the window. Unlike the reference this
    is NOT a process-global singleton — on Spark executors a singleton
    would alias unrelated tasks; callers own an instance per model/worker
    (models/harness.py keeps one per executor singleton)."""

    def __init__(self, window_size: int = 20) -> None:
        from collections import deque

        self._window_size = window_size
        self._cycles: "deque[SectionProfiler]" = deque()

    def start_cycle(self) -> SectionProfiler:
        self._cycles.appendleft(SectionProfiler())
        if len(self._cycles) > self._window_size:
            self._cycles.pop()
        return self._cycles[0]

    def section(self, name: str):
        if not self._cycles:
            self.start_cycle()
        return self._cycles[0].section(name)

    def get_data(self) -> dict:
        from statistics import mean, median

        data = {
            "window": len(self._cycles),
            "last": self._cycles[0].get_data() if self._cycles else {},
            "mean": {},
            "median": {},
        }
        values: dict[str, dict[str, list]] = {}
        for p in self._cycles:
            for sec, metrics in p.get_data().items():
                for m, v in metrics.items():
                    values.setdefault(sec, {}).setdefault(m, []).append(v)
        for sec, metrics in values.items():
            for m, vs in metrics.items():
                data["mean"].setdefault(sec, {})[m] = mean(vs)
                data["median"].setdefault(sec, {})[m] = median(vs)
        return data
