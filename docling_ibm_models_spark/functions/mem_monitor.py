"""Process-memory monitor — behavioral re-creation of the reference's
``tableformer/utils/mem_monitor.py`` (:88-180), parity-tested against the
imported reference in tests/test_profiler.py.

Semantics preserved:

* ``get_memory()`` parses ``/proc/<pid>/statm`` into the seven statm fields
  in kB. QUIRK KEPT: the reference converts pages to kB with ``x << 2``,
  i.e. it hard-codes 4 KiB pages instead of reading SC_PAGESIZE — on a
  non-4K-page kernel its numbers are off by the same factor, and matching
  the reference exactly matters more than fixing it (the profiler's own
  ``resident_kb`` uses the real page size).
* ``get_memory_full()`` regex-parses ``/proc/<pid>/status`` for the 16 Vm*/
  Rss* fields, stopping early once all matched (fields missing from the
  kernel — e.g. VmPMD after Linux 4.15 — are simply absent, like the
  reference).
* disabled → -2; non-Linux → -1.
"""

from __future__ import annotations

import os
import platform
import re

STATUS_FIELDS = [
    "VmPeak", "VmSize", "VmLck", "VmPin", "VmHWM", "VmRSS",
    "RssAnon", "RssFile", "RssShmem", "VmData", "VmStk", "VmExe",
    "VmLib", "VmPTE", "VmPMD", "VmSwap",
]

_STATUS_RE = {f: re.compile(rf"({f}:)(\s+)(\d*)(.*)") for f in STATUS_FIELDS}
_STATM_KEYS = ("size", "resident", "shared", "text", "lib", "data", "dt")


class MemMonitor:
    def __init__(self, enable: bool = True):
        self._enable = enable
        self._pid = os.getpid()

    def get_memory(self):
        if not self._enable:
            return -2
        if platform.system() != "Linux":
            return -1
        with open(f"/proc/{self._pid}/statm") as f:
            vals = [int(x) << 2 for x in f.read().split(" ")]  # quirk: 4K pages assumed
        return dict(zip(_STATM_KEYS, vals))

    def get_memory_full(self):
        if not self._enable:
            return -2
        if platform.system() != "Linux":
            return -1
        memory: dict = {}
        with open(f"/proc/{self._pid}/status") as f:
            for line in f:
                for field, rx in _STATUS_RE.items():
                    m = rx.match(line)
                    if m is not None:
                        memory[field] = int(m.group(3))
                if len(memory) == len(STATUS_FIELDS):
                    break
        return memory
