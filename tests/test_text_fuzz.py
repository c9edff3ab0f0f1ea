"""Property-based equivalence for the session-7 text operators
(hypothesis): random token corpora, Spark vs an independent
pure-Python implementation of the spec. The operators' oracles only
exercise the fixed synthetic tables; these drive arbitrary shapes —
empty docs, single tokens, heavy repetition, phrase-length docs —
where off-by-one windows or tie-breaks would hide.

One shared Spark round-trip per property batch: hypothesis generates
the corpora up front (lists of examples), each property then runs ONE
Spark job over the union — per-example Spark jobs would take minutes.
"""

import hashlib

from hypothesis import given, settings, strategies as st

VOCAB = ["a", "b", "c", "dd", "eee"]

tokens = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=24)


def _winnow_golden(text, k, w):
    toks = [t for t in text.split(" ") if t] if text else []
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    keys = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * (1 << 20) + p
        for p, g in enumerate(grams)
    ]
    sel = set()
    for e in range(len(keys)):
        if e >= w - 1 or e == len(keys) - 1:
            sel.add(min(keys[max(0, e - w + 1) : e + 1]))
    return {s >> 20 for s in sel}


def _phrase_golden(text, phrase):
    toks = text.split(" ")
    k = len(phrase)
    anchors = [
        p for p in range(len(toks) - k + 1) if tuple(toks[p : p + k]) == phrase
    ]
    return (len(anchors), min(anchors)) if anchors else None


@settings(max_examples=10, deadline=None)
@given(corpus=st.lists(tokens, min_size=40, max_size=40))
def test_winnowing_fps_fuzz(spark, corpus):
    from webcrawlergo_spark.operators.dedup import WIN_K, WIN_W, winnowing_fps

    docs = [(i, " ".join(ts)) for i, ts in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fps(df).collect():
        got.setdefault(r.doc_id, set()).add(r.h40)
    for i, (_, text) in enumerate(docs):
        assert got.get(i, set()) == _winnow_golden(text, WIN_K, WIN_W), (
            i,
            text,
        )


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(tokens, min_size=40, max_size=40),
    phrase=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
)
def test_phrase_search_fuzz(spark, corpus, phrase):
    from webcrawlergo_spark.operators.retrieval import phrase_search_df

    phrase = tuple(phrase)
    docs = [(i, " ".join(ts)) for i, ts in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search_df(df, phrase).collect()
    }
    want = {}
    for i, (_, text) in enumerate(docs):
        g = _phrase_golden(text, phrase)
        if g:
            want[i] = g
    assert got == want
