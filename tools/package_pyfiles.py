#!/usr/bin/env python
"""Build the ``--py-files`` archive for cluster submission (north-rule
launch shape):

    python tools/package_pyfiles.py [dist/docling_ibm_models_spark.zip]
    spark-submit --py-files dist/docling_ibm_models_spark.zip \\
        -m docling_ibm_models_spark.run --pages ... --out ...

The zip contains the package exactly as importable from a zipimport path
(executors unpack nothing — Python imports straight from the archive), so
what ships is what ran in tests. Deterministic output: fixed timestamps
and sorted entries, so re-building an unchanged tree is byte-identical —
a content-addressable artifact for cluster caches.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "docling_ibm_models_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, root)
                entries.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/docling_ibm_models_spark.zip"
    path = build(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} modules")
