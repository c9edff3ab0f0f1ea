"""Package the engine for spark-submit on a real cluster.

    python tools/package.py            # → dist/webcrawlergo_spark.zip

then on any Spark cluster:

    spark-submit \\
      --py-files dist/webcrawlergo_spark.zip \\
      tools/submit_crawl.py \\
      --base-url https://example.test --checkpoint-dir s3://bucket/ck

The zip contains only the library package (no tests, no caches);
executors unpack it onto their PYTHONPATH — the standard --py-files
contract. Verified by tests/test_packaging.py, which imports the
engine from the zip alone in a clean interpreter.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "webcrawlergo_spark")


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "webcrawlergo_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build_zip())
