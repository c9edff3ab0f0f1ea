"""TF-IDF top-terms and DSIR importance weights: exact pure-Python
golden replications (same formula, same op order, same floor-round),
plus the invariants the SQL oracle can't express — idf monotonicity,
the integer-lattice order-independence contract, and the plan-shape
guarantee that the DSIR weight table broadcasts (the token stream must
never shuffle on the term key)."""

import math

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    tab = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return list(
        zip(
            tab.column("doc_id").to_pylist(),
            tab.column("text").to_pylist(),
            tab.column("lang").to_pylist(),
        )
    )


def _floor6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_tfidf_matches_python_golden(spark):
    from webcrawlergo_spark.operators.text import TFIDF_TOP_K, tfidf_topterms

    docs = _docs()
    n = len(docs)
    tf: dict[tuple, int] = {}
    df: dict[str, int] = {}
    for doc_id, text, _ in docs:
        seen = set()
        for t in text.split(" "):
            if not t:
                continue
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
            seen.add(t)
        for t in seen:
            df[t] = df.get(t, 0) + 1
    want = []
    by_doc: dict[int, list] = {}
    for (doc_id, t), c in tf.items():
        score = _floor6(float(c) * math.log((n + 1.0) / (df[t] + 1.0)))
        by_doc.setdefault(doc_id, []).append((t, score))
    for doc_id in sorted(by_doc):
        ranked = sorted(by_doc[doc_id], key=lambda r: (-r[1], r[0]))
        for rnk, (t, score) in enumerate(ranked[:TFIDF_TOP_K], start=1):
            want.append((doc_id, rnk, t, score))
    got = [
        (r.doc_id, r.rnk, r.term, r.tfidf_6)
        for r in tfidf_topterms(spark, SF_DIR).collect()
    ]
    assert got == want
    # smooth idf is non-negative (df <= N), so scores are too
    assert all(s >= 0 for _, _, _, s in got)


def test_dsir_matches_python_golden(spark):
    from webcrawlergo_spark.operators.text import (
        DSIR_TARGET_LANG,
        dsir_logratio,
    )

    docs = _docs()
    cc: dict[str, int] = {}
    ct: dict[str, int] = {}
    for _, text, lang in docs:
        for t in text.split(" "):
            if not t:
                continue
            cc[t] = cc.get(t, 0) + 1
            if lang == DSIR_TARGET_LANG:
                ct[t] = ct.get(t, 0) + 1
    v = len(cc)
    nc = sum(cc.values())
    nt = sum(ct.values())
    w = {
        t: math.floor(
            math.log(((ct.get(t, 0) + 1.0) * (nc + v)) / ((c + 1.0) * (nt + v)))
            * 1e6
            + 0.5
        )
        for t, c in cc.items()
    }
    want = []
    for doc_id, text, lang in sorted(docs):
        toks = [t for t in text.split(" ") if t]
        want.append(
            (doc_id, lang, len(toks), sum(w[t] for t in toks) / 1e6)
        )
    got = [
        (r.doc_id, r.lang, r.n_toks, r.llr_6)
        for r in dsir_logratio(spark, SF_DIR).collect()
    ]
    assert got == want
    # the target stratum must score higher on average than the rest —
    # otherwise the importance weights carry no selection signal
    tgt = [s for _, lang, _, s in got if lang == DSIR_TARGET_LANG]
    rest = [s for _, lang, _, s in got if lang != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_weights_broadcast_not_shuffled(spark):
    """The vocabulary-sized weight table must reach the token stream
    as a broadcast: a hash exchange on the term key would shuffle the
    full token stream — the 100 TB scale-killer this operator is
    designed around."""
    from webcrawlergo_spark.operators.text import dsir_logratio

    plan = (
        dsir_logratio(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # every join is broadcast — a shuffled join would repartition the
    # token stream on the term key
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # the term-key exchanges move only vocabulary-sized aggregates
    # (map-side combined); the stream itself exchanges once, on
    # doc_id, for the per-document sum. Count only the exchanges the
    # plan REQUIRES (ENSURE_REQUIREMENTS): the r6 spread_scan
    # repartition (REPARTITION_BY_NUM, a no-op on any multi-partition
    # scan) also hashes on doc_id — and when it is present the per-doc
    # sum REUSES that partitioning, so the required count drops to 0;
    # on a wide scan (no spread) it is exactly 1. Either way the token
    # stream crosses at most one doc_id exchange.
    required = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(doc_id" in ln and "ENSURE_REQUIREMENTS" in ln
    ]
    assert len(required) <= 1, plan
