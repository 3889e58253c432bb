"""The --py-files archive must be importable via zipimport (exactly how
executors consume it) and deterministic (byte-identical rebuilds)."""

from __future__ import annotations

import hashlib
import subprocess
import sys

from tools.package_pyfiles import build


def test_pyfiles_zip_imports_and_is_deterministic(tmp_path):
    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()
    assert h(z1) == h(z2), "rebuild is not byte-identical"

    # import FROM THE ZIP in a clean interpreter (no repo dir on sys.path)
    # and run a pure function end-to-end
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from docling_ibm_models_spark.functions.html_extract import extract_main_content; "
        "text, spans = extract_main_content('<html><body><p>Hello world this "
        "paragraph carries enough prose to be kept as main content by the "
        "boilerplate classifier heuristics.</p>"
        "<script>x=1</script></body></html>'); "
        "print(text)" % z1
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # ensure the repo package dir is not importable
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Hello" in out.stdout
