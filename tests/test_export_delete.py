"""S10/F7 db2disk export sink + S9 delete cascade + X4 cuckoo tier.

The export golden is an independent pure-Python transliteration of
savePageContent (reference cmd/webcrawlerGo/db.go:228-270): path
split, per-segment unsafe-char replace, QueryEscape, timestamped
filename — compared file-by-file (paths AND bytes) against the
engine's mapInPandas sink.
"""

import datetime
import os
import re
import urllib.parse

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawlergo_spark.operators.delete import delete_urls_cascade
from webcrawlergo_spark.operators.export import db2disk, export_paths, write_files
from webcrawlergo_spark.operators.seenset import (
    CuckooFilter,
    cuckoo_delete_urls,
    cuckoo_insert_urls,
    dedup_new_urls,
)

UNSAFE = re.compile(r'[<>:"/\\|?* ]')

ROWS = [
    # (id, url_id, url, added_at, content)
    (1, 1, "https://h.test/u/1", "2024-01-01 10:00:00", "<html>one</html>"),
    (2, 2, "https://h.test/a b/c:d", "2024-01-02 11:30:05", "<html>two</html>"),
    (3, 3, "https://h.test/x/y&z", "2024-01-03 23:59:59", "<html>three</html>"),
    (4, 4, "https://h.test", "2024-01-04 00:00:01", "<html>root</html>"),
]


def golden_path(url: str, added_at: str) -> str:
    """db.go:228-263, independently."""
    path = urllib.parse.urlsplit(url).path
    segs = [UNSAFE.sub("_", s) for s in path.split("/")]
    fname = urllib.parse.quote_plus(segs[-1])
    ts = datetime.datetime.fromisoformat(added_at).strftime("%Y-%m-%d_%H-%M-%S")
    return "/".join(segs[:-1]) + f"/{fname}_{ts}.html"


def test_export_files_match_golden(spark, tmp_path):
    df = spark.createDataFrame(
        ROWS,
        "id long, url_id long, url string, added_at string, content string",
    ).withColumn("added_at", F.col("added_at").cast("timestamp"))
    out = write_files(export_paths(df), str(tmp_path), "content").collect()
    got = {r["rel_path"]: r["n_bytes"] for r in out}
    want = {golden_path(url, ts): len(c) for _, _, url, ts, c in ROWS}
    assert got == want
    for (_, _, url, ts, c) in ROWS:
        full = os.path.join(str(tmp_path), golden_path(url, ts).lstrip("/"))
        with open(full) as f:
            assert f.read() == c


def test_db2disk_end_to_end(spark, tmp_path):
    urls = spark.createDataFrame(
        [(u, url, True, True) for _, u, url, _, _ in ROWS],
        "id long, url string, is_monitored boolean, is_alive boolean",
    )
    pages = spark.createDataFrame(
        [(i, u, ts, c) for i, u, _, ts, c in ROWS],
        "id long, url_id long, added_at string, content string",
    ).withColumn("added_at", F.col("added_at").cast("timestamp"))
    written = db2disk(pages, urls, str(tmp_path), marked_paths=["/u/", "/x/"])
    # marked passes select u/1 and x/y&z only
    rels = sorted(r["rel_path"] for r in written)
    assert rels == sorted(
        [golden_path(ROWS[0][2], ROWS[0][3]), golden_path(ROWS[2][2], ROWS[2][3])]
    )
    for rel in rels:
        assert os.path.exists(os.path.join(str(tmp_path), rel.lstrip("/")))


def test_delete_cascade_and_reseen(spark):
    urls = spark.createDataFrame(
        [(i, f"https://h.test/p{i}", False, True) for i in range(10)],
        "id long, url string, is_monitored boolean, is_alive boolean",
    )
    pages = spark.createDataFrame(
        [(i * 10 + k, i) for i in range(10) for k in range(2)], "id long, url_id long"
    )
    seen = urls.select("url")
    targets = urls.filter(F.col("id") % 3 == 0)
    out = delete_urls_cascade(urls, pages, targets, seen=seen)
    assert out["urls"].count() == 6
    assert out["pages"].count() == 12  # cascade dropped 4 urls × 2 pages
    kept_ids = {r["id"] for r in out["urls"].collect()}
    assert all(i % 3 != 0 for i in kept_ids)
    assert {r["url_id"] for r in out["pages"].collect()} == kept_ids
    # deleted URLs left the seen set → re-discoverable
    assert out["seen"].count() == 6


def test_cuckoo_dedup_equals_exact_and_supports_delete(spark):
    all_urls = [f"https://h.test/p{i}" for i in range(500)]
    seen_urls = all_urls[:300]
    cf = CuckooFilter(n_buckets=1024)
    seen = spark.createDataFrame([(u,) for u in seen_urls], "url string")
    assert cuckoo_insert_urls(cf, seen) == 0

    cands = spark.createDataFrame([(u,) for u in all_urls], "url string")
    exact = sorted(r["url"] for r in dedup_new_urls(cands, seen).collect())
    viac = sorted(r["url"] for r in dedup_new_urls(cands, seen, cuckoo=cf).collect())
    assert exact == viac == sorted(all_urls[300:])

    # S9: delete 50 previously-inserted keys from registry AND filter
    victims = spark.createDataFrame([(u,) for u in seen_urls[:50]], "url string")
    assert cuckoo_delete_urls(cf, victims) == 50
    seen2 = seen.join(victims, "url", "left_anti")
    after = sorted(r["url"] for r in dedup_new_urls(cands, seen2, cuckoo=cf).collect())
    assert after == sorted(all_urls[300:] + seen_urls[:50])


def test_cuckoo_no_false_negatives_for_inserted():
    cf = CuckooFilter(n_buckets=4096)
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, 8000, dtype=np.int64).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 8000, dtype=np.int64).astype(np.uint64)
    assert cf.insert_many(h1, h2) == 0
    assert cf.contains_many(h1, h2).all()
