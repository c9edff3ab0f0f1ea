"""S10 + F7 — the db2disk export sink.

Reference behavior (cmd/webcrawlerGo/db.go:153-270): for each marked
path (or one pass with '' when none), run the latest-pages query
(W1, paginated at 20 in the reference — here one distributed pass),
then write every page to disk as

    <save_path><url_path_dir>/<sanitized_last_segment>_<ts>.html

where each path segment has unsafe filename characters
``[<>:"/\\|?* ]`` replaced by '_' (db.go:229, F7) and the final
segment is additionally query-escaped (db.go:249, Go url.QueryEscape
== Spark ``url_encode``: application/x-www-form-urlencoded).

Spark shape: the path→filename derivation is pure column expressions
(parse_url / split / transform / regexp_replace / url_encode /
date_format — all codegen); only the physical file IO runs in a
mapInPandas sink, one batch per partition, executors writing their
own partitions in parallel (a file-per-row sink is inherently IO —
there is no shuffle and no driver involvement).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .window import latest_pages_filtered

# db.go:229 — regex char class, Spark/Java flavor ('/' never occurs
# inside a segment post-split but is kept for fidelity)
UNSAFE_CHARS = r'[<>:"/\\|?* ]'
TS_FORMAT = "yyyy-MM-dd_HH-mm-ss"  # settings.go:21-22


PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def export_paths(latest: DataFrame, url_col: str = "url", ts_col: str = "added_at") -> DataFrame:
    """Add ``rel_path`` — the on-disk relative path for each page row,
    exactly as db.go:228-263 computes it. Pure column expressions.

    Path extraction is a regex, not ``parse_url``: Go's url.Parse is
    lenient (spaces, colons in segments), Spark's parse_url is strict
    java.net.URI and NULLs out exactly the URLs F7 exists to sanitize.
    """
    path = F.regexp_extract(F.col(url_col), PATH_RE, 1)
    segs = F.split(path, "/")
    san = F.transform(segs, lambda s: F.regexp_replace(s, UNSAFE_CHARS, "_"))
    fname = F.url_encode(F.element_at(san, -1))  # QueryEscape (db.go:249)
    dirp = F.array_join(F.slice(san, F.lit(1), F.size(san) - 1), "/")
    rel = F.concat(
        dirp, F.lit("/"), fname, F.lit("_"), F.date_format(ts_col, TS_FORMAT), F.lit(".html")
    )
    return latest.withColumn("rel_path", rel)


def write_files(df: DataFrame, save_path: str, content_col: str = "content") -> DataFrame:
    """The physical sink: write one file per row under ``save_path``.
    Returns (rel_path, n_bytes) rows. Executors write their own
    partitions — no collect, no shuffle."""
    root = save_path.rstrip("/")

    def w(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = []
            for rel, content in zip(pdf["rel_path"], pdf[content_col]):
                full = os.path.join(root, rel.lstrip("/"))
                os.makedirs(os.path.dirname(full), exist_ok=True)
                data = content.encode() if isinstance(content, str) else bytes(content)
                with open(full, "wb") as f:
                    f.write(data)
                n.append(len(data))
            yield pd.DataFrame({"rel_path": pdf["rel_path"], "n_bytes": n})

    return df.mapInPandas(w, "rel_path string, n_bytes long")


def db2disk(
    pages: DataFrame,
    urls: DataFrame,
    save_path: str,
    content_col: str = "content",
    base_prefix: str | None = None,
    marked_paths: list[str] | None = None,
    cutoff: str | None = None,
) -> list:
    """The full db2disk mode (db.go:153-225): one latest-pages pass
    per marked path (all-monitored pass when none), distinct page set,
    sanitize, write. Returns the written (rel_path, n_bytes) rows."""
    passes = [m for m in (marked_paths or []) if m] or [None]
    out = None
    for m in passes:
        part = latest_pages_filtered(pages, urls, cutoff, base_prefix, m, with_id=True)
        out = part if out is None else out.unionByName(part)
    # two marked paths may select the same page — the reference
    # overwrites the same file; one distinct write is equivalent
    latest = out.dropDuplicates(["url_id"])
    if content_col not in latest.columns and content_col in pages.columns:
        latest = latest.join(pages.select("id", content_col), "id", "left")
    return write_files(export_paths(latest), save_path, content_col).collect()
