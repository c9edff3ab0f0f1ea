"""--py-files packaging: the zip built by tools/package.py must be a
self-sufficient import source for the engine (what executors see on a
real cluster)."""

import subprocess
import sys


def test_zip_imports_cleanly(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.package import build_zip

    zp = build_zip(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import webcrawlergo_spark.plans.wave as w; "
        "import webcrawlergo_spark.operators.seenset as s; "
        "import webcrawlergo_spark.operators.export as e; "
        "print(w.CrawlConfig(base_url='https://x.test').retry_times)" % zp
    )
    # clean interpreter, repo NOT on the path — the zip must suffice
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "2"
