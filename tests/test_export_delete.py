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
    build_cuckoo_shards,
    cuckoo_delete_shards,
    cuckoo_insert_shards,
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
    cuckoo_df = build_cuckoo_shards(seen, n_shards=4)
    targets = urls.filter(F.col("id") % 3 == 0)
    out = delete_urls_cascade(
        urls, pages, targets, seen=seen, cuckoo_df=cuckoo_df, n_shards=4
    )
    assert out["urls"].count() == 6
    assert out["pages"].count() == 12  # cascade dropped 4 urls × 2 pages
    kept_ids = {r["id"] for r in out["urls"].collect()}
    assert all(i % 3 != 0 for i in kept_ids)
    assert {r["url_id"] for r in out["pages"].collect()} == kept_ids
    # deleted URLs left the seen set → re-discoverable
    assert out["seen"].count() == 6
    # ... and left the approximate tier too (T4: a probe of the deleted
    # URLs against the updated shard table reports them unseen)
    deleted = seen.join(out["seen"], "url", "left_anti")
    re_new = dedup_new_urls(
        deleted, out["seen"], cuckoo_df=out["cuckoo"], n_shards=4
    )
    assert re_new.count() == 4


def test_cuckoo_dedup_equals_exact_and_supports_delete(spark):
    """X4 cuckoo tier, r4 executor-side: the shard table is a
    DataFrame, probe/delete are cogrouped jobs, the driver holds no
    filter state — and the dedup result stays bit-identical to the
    exact anti-join, including after deletes (the capability bloom
    lacks)."""
    from pyspark.sql import functions as SF

    all_urls = [f"https://h.test/p{i}" for i in range(500)]
    seen_urls = all_urls[:300]
    seen = spark.createDataFrame([(u,) for u in seen_urls], "url string")
    cuckoo_df = build_cuckoo_shards(seen, n_shards=4).localCheckpoint(eager=True)
    # every key placed: no failed inserts → negatives are exact
    assert cuckoo_df.agg(SF.max("n_fail")).collect()[0][0] == 0

    cands = spark.createDataFrame([(u,) for u in all_urls], "url string")
    exact = sorted(r["url"] for r in dedup_new_urls(cands, seen).collect())
    viac = sorted(
        r["url"]
        for r in dedup_new_urls(cands, seen, cuckoo_df=cuckoo_df, n_shards=4).collect()
    )
    assert exact == viac == sorted(all_urls[300:])

    # S9: delete 50 previously-inserted keys from registry AND filter
    victims = spark.createDataFrame([(u,) for u in seen_urls[:50]], "url string")
    cuckoo2 = cuckoo_delete_shards(cuckoo_df, victims, n_shards=4).localCheckpoint(
        eager=True
    )
    assert cuckoo2.agg(SF.sum("n")).collect()[0][0] == 250  # 300 - 50 found+removed
    seen2 = seen.join(victims, "url", "left_anti")
    after = sorted(
        r["url"]
        for r in dedup_new_urls(cands, seen2, cuckoo_df=cuckoo2, n_shards=4).collect()
    )
    assert after == sorted(all_urls[300:] + seen_urls[:50])


def test_cuckoo_incremental_insert_shards(spark):
    """Wave-sized incremental inserts (the cogrouped maintenance path)
    keep the dedup result bit-identical to exact, with zero failed
    inserts and an accurate key count."""
    all_urls = [f"https://h.test/q{i}" for i in range(400)]
    s1 = spark.createDataFrame([(u,) for u in all_urls[:200]], "url string")
    s2 = spark.createDataFrame([(u,) for u in all_urls[200:300]], "url string")
    cuckoo_df = build_cuckoo_shards(s1, n_shards=4)
    cuckoo_df = cuckoo_insert_shards(cuckoo_df, s2, n_shards=4).localCheckpoint(
        eager=True
    )
    assert cuckoo_df.agg(F.max("n_fail")).collect()[0][0] == 0
    assert cuckoo_df.agg(F.sum("n")).collect()[0][0] == 300
    seen = s1.unionByName(s2)
    cands = spark.createDataFrame([(u,) for u in all_urls], "url string")
    got = sorted(
        r["url"]
        for r in dedup_new_urls(cands, seen, cuckoo_df=cuckoo_df, n_shards=4).collect()
    )
    assert got == sorted(all_urls[300:])


def test_cuckoo_no_false_negatives_for_inserted():
    cf = CuckooFilter(n_buckets=4096)
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, 8000, dtype=np.int64).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 8000, dtype=np.int64).astype(np.uint64)
    assert cf.insert_many(h1, h2) == 0
    assert cf.contains_many(h1, h2).all()


def test_cascade_delete_of_unseen_urls_never_evicts_foreign_fingerprints(spark):
    """ADVICE r4: the cascade must feed the cuckoo tier only keys that
    were actually inserted (victims ∩ seen). Deleting never-inserted
    keys can evict a COLLIDING fingerprint belonging to a different
    URL — with 5,000 foreign deletes against a 300-key tier a
    collision is near-certain, so under the bug some still-seen URL
    would probe falsely-new below."""
    seen_urls = [f"https://h.test/s{i}" for i in range(300)]
    foreign = [f"https://h.test/f{i}" for i in range(5000)]
    urls = spark.createDataFrame(
        [(i, u, False, True) for i, u in enumerate(seen_urls + foreign)],
        "id long, url string, is_monitored boolean, is_alive boolean",
    )
    pages = spark.createDataFrame([(0, 0)], "id long, url_id long")
    seen = spark.createDataFrame([(u,) for u in seen_urls], "url string")
    cuckoo_df = build_cuckoo_shards(seen, n_shards=4).localCheckpoint(eager=True)
    assert cuckoo_df.agg(F.max("n_fail")).collect()[0][0] == 0

    targets = spark.createDataFrame([(u,) for u in foreign], "url string")
    out = delete_urls_cascade(
        urls, pages, targets, seen=seen, cuckoo_df=cuckoo_df, n_shards=4
    )
    cuckoo2 = out["cuckoo"].localCheckpoint(eager=True)
    # tier population untouched (no foreign key was ever inserted) ...
    assert cuckoo2.agg(F.sum("n")).collect()[0][0] == 300
    # ... and every still-seen URL still probes positive: nothing is
    # falsely "new" (cuckoo negatives are trusted without confirm)
    falsely_new = dedup_new_urls(seen, out["seen"], cuckoo_df=cuckoo2, n_shards=4)
    assert falsely_new.count() == 0
