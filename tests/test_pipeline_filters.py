"""Edge-case guards for the two corpus-filter operators the SQL
oracle checks only on the clean synthetic corpus: Gopher-style
repetition scoring and benchmark decontamination. The oracle proves
engine agreement; these pin the semantic contracts (zero-gram docs,
flag thresholds, benchmark exclusion, non-vacuous signal)."""

import pytest

from webcrawlergo_spark.operators.dedup import (
    BENCH_MOD,
    contamination_check,
    contamination_check_df,
)
from webcrawlergo_spark.operators.text import repetition_score, repetition_score_df

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        # 1: heavy repetition — "a b" bigram dominates
        (1, "a b a b a b a b a b"),
        # 2: all-distinct bigrams
        (2, "one two three four five six"),
        # 3: shorter than the gram width for BOTH ops (1 token)
        (3, "solo"),
        # 4: empty text
        (4, ""),
        # 20: benchmark doc (20 % BENCH_MOD == 0) sharing an 8-gram run
        #     with doc 21
        (20, "w1 w2 w3 w4 w5 w6 w7 w8 w9 tail"),
        # 21: contaminated — contains the benchmark 8-gram w1..w8
        (21, "head w1 w2 w3 w4 w5 w6 w7 w8 other"),
        # 22: clean — no benchmark overlap
        (22, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    ]
    assert 20 % BENCH_MOD == 0 and all(r[0] % BENCH_MOD for r in rows if r[0] != 20)
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_and_zero_gram_rows(tiny_docs):
    out = {r["doc_id"]: r for r in repetition_score_df(tiny_docs).collect()}
    assert set(out) == {1, 2, 3, 4, 20, 21, 22}

    rep = out[1]  # 9 bigrams, 2 distinct ("a b" ×5, "b a" ×4)
    assert rep["n_grams"] == 9 and rep["n_distinct_grams"] == 2
    assert rep["dup_gram_frac"] == pytest.approx(1 - 2 / 9, abs=1e-6)
    assert rep["top_gram_frac"] == pytest.approx(5 / 9, abs=1e-6)
    assert rep["repetitive"]

    clean = out[2]
    assert clean["dup_gram_frac"] == 0.0
    assert not clean["repetitive"]

    # docs below the gram width keep a zeroed, non-repetitive row
    for did in (3, 4):
        z = out[did]
        assert z["n_grams"] == 0 and z["n_distinct_grams"] == 0
        assert z["dup_gram_frac"] == 0.0 and z["top_gram_frac"] == 0.0
        assert not z["repetitive"]


def test_contamination_hits_and_benchmark_exclusion(tiny_docs):
    out = {r["doc_id"]: r for r in contamination_check_df(tiny_docs).collect()}
    # benchmark doc 20 is excluded from the output by definition
    assert set(out) == {1, 2, 3, 4, 21, 22}

    hit = out[21]  # exactly one 8-gram (w1..w8) of its 3 matches doc 20's
    assert hit["contaminated"] and hit["n_hits"] == 1 and hit["n_grams"] == 3
    assert hit["contam_frac"] == pytest.approx(1 / 3, abs=1e-6)

    assert not out[22]["contaminated"] and out[22]["n_hits"] == 0

    # zero-gram docs: not contaminated, frac 0.0 (the COALESCE contract)
    for did in (3, 4):
        assert out[did]["n_grams"] == 0 and not out[did]["contaminated"]
        assert out[did]["contam_frac"] == 0.0


def test_filters_nonvacuous_on_corpus(spark):
    """Both ops must show real signal on the shipped corpus — a filter
    that never fires would pass the oracle vacuously."""
    rep = repetition_score(spark, SF_DIR)
    assert rep.filter("repetitive").count() > 0
    assert rep.filter("NOT repetitive").count() > 0

    con = contamination_check(spark, SF_DIR)
    assert con.filter("contaminated").count() > 0
    assert con.filter("NOT contaminated").count() > 0
    # benchmark docs never appear in the scored output
    assert con.filter(f"doc_id % {BENCH_MOD} = 0").count() == 0


def test_resample_to_mix_quota_invariants(spark):
    """The temperature resample must (a) never upsample a stratum,
    (b) actually downsample the dominant one (non-vacuous on the
    skewed lang axis), (c) hit floor(N·w) exactly per stratum with
    N = min floor(n/w), and (d) keep the hash-order prefix (rk runs
    1..quota — the reproducible-sample contract)."""
    import math

    from pyspark.sql import functions as F

    from webcrawlergo_spark.operators.sampling import resample_to_mix

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_by_lang = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    total = sum(n_by_lang.values())
    sc = {l: math.sqrt(n / total) for l, n in n_by_lang.items()}
    w = {l: round(s / sum(sc.values()), 6) for l, s in sc.items()}
    n_out = min(math.floor(n_by_lang[l] / w[l]) for l in w)
    expect = {l: math.floor(n_out * w[l]) for l in w}

    out = resample_to_mix(spark, SF_DIR).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], []).append(r["rk"])
    assert {l: len(v) for l, v in got.items()} == expect
    dominant = max(n_by_lang, key=n_by_lang.get)
    assert len(got[dominant]) < n_by_lang[dominant], "dominant stratum not downsampled"
    for l, rks in got.items():
        assert len(rks) <= n_by_lang[l]
        assert sorted(rks) == list(range(1, len(rks) + 1))
