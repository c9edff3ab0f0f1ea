"""BM25 guards the SQL oracle can't express: the scoring arithmetic
against a hand-computed reference, the idf monotonicity that makes
rare terms dominate, and the fixture's non-vacuity (the benchmark
query must hit the corpus)."""

import math

from webcrawlergo_spark.operators.retrieval import (
    K1,
    B,
    QUERY_TERMS,
    bm25_topk,
    bm25_topk_df,
)

SF_DIR = "/root/testdata/sf0.001"


def _golden_bm25(texts, terms, k1, b):
    n = len(texts)
    dls = {d: len(t.split(" ")) for d, t in texts}
    avgdl = sum(dls.values()) / n
    df = {
        q: sum(1 for _, t in texts if q in t.split(" ")) for q in terms
    }
    out = {}
    for d, t in texts:
        toks = t.split(" ")
        s = 0.0
        for q in terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        if s > 0:
            out[d] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_python_golden(spark):
    """Hand-checkable corpus: rare term 'ruby' (df=1) must outscore
    any pile of the common term 'the'; longer docs are length-
    penalized; scores equal the textbook formula to 6dp."""
    texts = [
        (1, "the quick fox and the lazy dog saw the ruby"),
        (2, "the the the the the the the the the the"),
        (3, "a short doc with the word"),
        (4, "nothing relevant here at all friend"),
        (5, "ruby ruby the gem"),
    ]
    terms = ("ruby", "the")
    golden = _golden_bm25(texts, terms, K1, B)
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = bm25_topk_df(docs, terms=terms, top_k=10).collect()
    got = {r["doc_id"]: r["bm25_6"] for r in rows}
    assert got == golden
    # ranking: doc 5 (2× rare term, short) > doc 1 (1× rare) > the
    # common-term-only docs; doc 4 (no hit) absent entirely
    order = [r["doc_id"] for r in rows]
    assert order[0] == 5 and order[1] == 1
    assert 4 not in got
    # the rounded-score ordering is what the plan sorts on
    assert [got[d] for d in order] == sorted(got.values(), reverse=True)


def test_bm25_fixture_nonvacuous(spark):
    """The benchmark QUERY_TERMS must genuinely discriminate on the
    fixture corpus: full top-k returned, the rare marker term 'dup'
    present in the top doc, scores strictly positive and non-constant
    (a degenerate all-equal ranking would make the oracle comparison
    order-trivial)."""
    rows = bm25_topk(spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r["bm25_6"] for r in rows]
    assert all(s > 0 for s in scores)
    assert len(set(scores)) > 1
    texts = dict(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    assert "dup" in texts[rows[0]["doc_id"]].split(" "), (
        "top-ranked doc lacks the high-idf marker term — idf weighting inert"
    )
    assert set(QUERY_TERMS) == {"dup", "key", "vector", "scan"}
