"""Profiler parity vs the reference AggProfiler/Profiler (pure-python,
imported directly): same metric names, same windowing semantics, same
aggregation structure, call counts exactly equal, dts approximately."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/reference")

from docling_ibm_models.tableformer.utils.app_profiler import (  # noqa: E402
    AggProfiler,
    Profiler,
)

from docling_ibm_models_spark.functions.profiler import (  # noqa: E402
    AggSectionProfiler,
    SectionProfiler,
    resident_kb,
)


def test_section_profiler_matches_reference_metrics():
    pattern = [("a", 0.01), ("b", 0.02), ("a", 0.01)]
    # NEST the two profilers around the SAME sleeps: both then measure the
    # same wall interval (± context-manager overhead), so the dt tolerance
    # is meaningful even when this VM's contention makes an individual
    # sleep() oversleep by 100+ ms (timing two separate sleep runs flaked
    # exactly that way under load).
    ref = Profiler()
    ours = SectionProfiler()
    for sec, dt in pattern:
        ref.begin(sec)
        with ours.section(sec):
            time.sleep(dt)
        ref.end(sec)

    rd, od = ref.get_data(), ours.get_data()
    assert set(rd) == set(od) == {"a", "b"}
    for sec in rd:
        assert set(rd[sec]) == set(od[sec]) == {"dt", "calls", "kB"}
        assert rd[sec]["calls"] == od[sec]["calls"]
        # ref's interval contains ours; both saw the identical sleeps
        assert od[sec]["dt"] <= rd[sec]["dt"] + 1e-6
        assert rd[sec]["dt"] - od[sec]["dt"] < 0.05
        # both read resident kB from /proc (within 20% of each other)
        assert abs(rd[sec]["kB"] - od[sec]["kB"]) < 0.2 * max(rd[sec]["kB"], 1)
    # section filter semantics
    assert list(ref.get_data(["b"])) == list(ours.get_data(["b"])) == ["b"]


def test_agg_window_semantics_match_reference():
    # reference AggProfiler is a process-global singleton — drive it and
    # ours with identical cycles, compare windowing + aggregation structure
    ref = AggProfiler(window_size=3)
    ref._cycles.clear()  # singleton: reset state from any earlier test
    ref._window_size = 3
    ours = AggSectionProfiler(window_size=3)
    for cyc in range(5):  # 5 cycles into a window of 3
        ref.start_agg()
        ours.start_cycle()
        for _ in range(cyc + 1):
            ref.begin("s")
            time.sleep(0.002)
            ref.end("s")
            with ours.section("s"):
                time.sleep(0.002)

    rd, od = ref.get_data(), ours.get_data()
    assert rd["window"] == od["window"] == 3
    assert rd["last"]["s"]["calls"] == od["last"]["s"]["calls"] == 5
    # window holds cycles 3,4,5 -> calls [5,4,3]: mean 4, median 4
    assert rd["mean"]["s"]["calls"] == od["mean"]["s"]["calls"] == 4
    assert rd["median"]["s"]["calls"] == od["median"]["s"]["calls"] == 4
    assert set(rd["mean"]["s"]) == set(od["mean"]["s"]) == {"dt", "calls", "kB"}


def test_resident_kb_positive_on_linux():
    assert resident_kb() > 1000  # this test process certainly exceeds 1 MB


def test_mem_monitor_parity_with_reference():
    """Same process, back-to-back reads: field sets identical, values within
    noise; disabled/non-Linux sentinels identical."""
    from docling_ibm_models.tableformer.utils.mem_monitor import (
        MemMonitor as RefMonitor,
    )

    from docling_ibm_models_spark.functions.mem_monitor import MemMonitor

    ref, ours = RefMonitor(), MemMonitor()
    rm, om = ref.get_memory(), ours.get_memory()
    assert set(rm) == set(om) == {"size", "resident", "shared", "text", "lib", "data", "dt"}
    for k in ("size", "resident", "data"):
        assert abs(rm[k] - om[k]) <= max(0.1 * rm[k], 2048), k  # kB, same process
    assert rm["lib"] == om["lib"] == 0  # unused since Linux 2.6
    rf, of = ref.get_memory_full(), ours.get_memory_full()
    assert set(rf) == set(of)
    assert abs(rf["VmRSS"] - of["VmRSS"]) <= max(0.1 * rf["VmRSS"], 2048)
    assert RefMonitor(enable=False).get_memory() == MemMonitor(enable=False).get_memory() == -2
