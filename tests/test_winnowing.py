"""winnowing_pairs: pure-Python replay of the exact fingerprint
selection (md5-derived 40-bit hashes, leftmost-min packed key), the
Schleimer/Wilkerson/Aiken detection guarantee, and the stop-gram
hot-key guard."""

import hashlib

SF_DIR = "/root/testdata/sf0.001"


def _h40(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)


def _golden_fps(text: str, k: int, w: int) -> set[int]:
    toks = text.split(" ")
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    keys = [_h40(g) * (1 << 20) + p for p, g in enumerate(grams)]
    if not keys:
        return set()
    sel = set()
    for e in range(len(keys)):
        if e >= w - 1 or e == len(keys) - 1:
            sel.add(min(keys[max(0, e - w + 1) : e + 1]))
    return {s >> 20 for s in sel}


def test_winnowing_fps_match_python_golden(spark):
    from webcrawlergo_spark.operators.dedup import (
        WIN_K,
        WIN_W,
        winnowing_fps,
    )

    docs = [
        (0, "key agg row scan slow fast table value part hash value table"),
        (1, "a b c d e f g h i j"),
        (2, "x y z"),  # shorter than W grams — prefix-window rule
        (3, "one two three four"),  # exactly one gram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fps(df).collect():
        got.setdefault(r.doc_id, set()).add(r.h40)
    want = {
        d: _golden_fps(t, WIN_K, WIN_W)
        for d, t in docs
        if _golden_fps(t, WIN_K, WIN_W)
    }
    assert got == want


def test_winnowing_detection_guarantee(spark):
    """Two documents sharing a token run of length W+K-1, embedded at
    DIFFERENT offsets in otherwise disjoint text, must share at least
    one selected fingerprint — the paper's guarantee, and the reason
    this complements probabilistic minhash recall."""
    from webcrawlergo_spark.operators.dedup import (
        WIN_K,
        WIN_W,
        winnowing_fps,
    )

    run = " ".join(f"shared{i}" for i in range(WIN_W + WIN_K - 1))
    docs = [
        (0, "alpha beta gamma " + run + " delta epsilon"),
        (1, "uno dos tres cuatro cinco seis " + run),
        (2, "totally unrelated words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {}
    for r in winnowing_fps(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.h40)
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_winnowing_pairs_stop_gram_guard(spark, tmp_path):
    """A gram shared by MORE than WIN_MAX_DF documents is evidence of
    boilerplate, not duplication — it must not create pairs (the
    hot-key guard that keeps the fingerprint join from going n²)."""
    from webcrawlergo_spark.operators.dedup import (
        WIN_MAX_DF,
        winnowing_pairs,
    )

    boiler = "common header words repeated on every single page here"
    docs = [(i, boiler + f" unique{i} tail{i} words{i} differ{i} end{i}")
            for i in range(WIN_MAX_DF + 4)]
    # two true near-duplicates on top of the boilerplate corpus
    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs += [(100, dup + " variantone ending"), (101, dup + " varianttwo close")]
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(p)
    out = winnowing_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # the true duplicates pair up; the boilerplate (shared by
    # >WIN_MAX_DF docs) creates NO pair
    assert pairs == {(100, 101)}
