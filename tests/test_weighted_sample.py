"""A-ES weighted-sampling guards beyond the SQL oracle: exact
agreement with a pure-Python twin, and the statistical property that
makes it a WEIGHTED sample (heavy docs oversampled vs uniform),
checked deterministically across many md5 seed domains."""

import hashlib
import math

from webcrawlergo_spark.operators.sampling import (
    WS_K,
    WS_SEED,
    weighted_sample_frame,
    weighted_sample_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _golden_keys(rows, seed):
    out = {}
    for doc_id, w in rows:
        h = int(hashlib.md5(f"{seed}-{doc_id}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(1 << 60)
        wd = max(float(w), 1.0)
        out[doc_id] = (math.floor(math.log(u) / wd * 1e6 + 0.5) / 1e6, wd)
    return out


def test_weighted_sample_matches_python_golden(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()]
    keys = _golden_keys(rows, WS_SEED)
    want = sorted(keys.items(), key=lambda kv: (-kv[1][0], kv[0]))[:WS_K]
    got = weighted_sample_topk(spark, SF_DIR).collect()
    assert [(r["doc_id"], (r["key_6"], r["weight"])) for r in got] == want


def test_weighted_sample_oversamples_heavy_docs(spark):
    """500 docs, 50 with weight 40 and 450 with weight 1. Uniform
    sampling would put ~10% heavy docs in a sample; A-ES must put in
    far more. Aggregated over 25 deterministic seed domains so the
    check is a property of the estimator, not one lucky draw."""
    rows = [(i, 40 if i < 50 else 1) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    heavy = total = 0
    for s in range(25):
        got = weighted_sample_frame(docs, "w", k=20, seed=f"seed{s}").collect()
        assert len(got) == 20 and len({r["doc_id"] for r in got}) == 20
        heavy += sum(1 for r in got if r["doc_id"] < 50)
        total += 20
    frac = heavy / total
    assert frac > 0.3, f"heavy fraction {frac} — weighting inert (uniform would be 0.1)"
    assert frac < 0.95, f"heavy fraction {frac} — light docs never sampled"


def test_weighted_sample_plan_is_topk_not_sort(spark):
    """TakeOrderedAndProject, not a global Sort+Limit — the per-
    partition-heap shape that scales."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = weighted_sample_frame(docs, "n_chars")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
