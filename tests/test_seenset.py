"""Seen-set tier tests: bloom shards have no false negatives, the
bloom dedup path is bit-identical to the exact anti-join, and the
cuckoo overflow tier supports insert/contains/delete."""

import numpy as np
from pyspark.sql import functions as F

from webcrawlergo_spark.operators.seenset import (
    CuckooFilter,
    bloom_build,
    bloom_probe,
    build_bloom_shards,
    dedup_new_urls,
)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    h1 = rng.integers(0, 2**63, 5000, dtype=np.int64)
    h2 = rng.integers(0, 2**63, 5000, dtype=np.int64)
    m = 5000 * 10
    bits = bloom_build(h1, h2, m)
    assert bloom_probe(bits, h1, h2, m).all()


def test_bloom_fpr_reasonable():
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, 10000, dtype=np.int64)
    h2 = rng.integers(0, 2**63, 10000, dtype=np.int64)
    bits = bloom_build(h1[:5000], h2[:5000], 5000 * 10)
    fpr = bloom_probe(bits, h1[5000:], h2[5000:], 5000 * 10).mean()
    assert fpr < 0.05


def test_bloom_dedup_equals_exact(spark):
    seen = spark.range(2000).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    cand = spark.range(1500, 3000).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    shards = {
        r["shard"]: (r["m_bits"], bytes(r["bits"]))
        for r in build_bloom_shards(seen, n_shards=8).collect()
    }
    exact = sorted(r["url"] for r in dedup_new_urls(cand, seen).collect())
    bloom = sorted(r["url"] for r in dedup_new_urls(cand, seen, bloom_shards=shards, n_shards=8).collect())
    assert exact == bloom == [f"u{i}" for i in range(2000, 3000)]


def test_cuckoo_insert_contains_delete():
    rng = np.random.default_rng(1)
    n = 3000
    h1 = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
    h2 = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
    cf = CuckooFilter(n_buckets=2048)  # load factor ~0.37, no failures expected
    fails = cf.insert_many(h1, h2)
    assert fails == 0
    assert cf.contains_many(h1, h2).all()
    # delete the first half; they must vanish, the rest must stay
    gone = cf.delete_many(h1[: n // 2], h2[: n // 2])
    assert gone.all()
    assert cf.contains_many(h1[n // 2 :], h2[n // 2 :]).all()
    # FPR after deletion stays small on fresh keys
    f1 = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    f2 = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    assert cf.contains_many(f1, f2).mean() < 0.05


def test_cuckoo_roundtrip_bytes():
    rng = np.random.default_rng(3)
    h1 = rng.integers(0, 2**63, 100, dtype=np.int64).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 100, dtype=np.int64).astype(np.uint64)
    cf = CuckooFilter(256)
    cf.insert_many(h1, h2)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), 256)
    assert cf2.contains_many(h1, h2).all()
