"""hits_scores: exact pure-Python golden of the integer-lattice HITS
iteration plus structural sanity; phrase_search: hand-built corpus
covering overlapping occurrences, repeated phrase words, and the
anchor >= 0 boundary."""

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------------


def _golden_hits(n_nodes, edges, scale, n_iter):
    """The identical lattice in pure Python (// is exact floor div)."""
    h = {v: scale // n_nodes for v in range(n_nodes)}
    a = None
    for _ in range(n_iter):
        ar = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            ar[d] += h[s]
        atot = sum(ar.values())
        a = {v: (ar[v] * scale) // atot for v in range(n_nodes)}
        hr = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            hr[s] += a[d]
        htot = sum(hr.values())
        h = {v: (hr[v] * scale) // htot for v in range(n_nodes)}
    return h, a


def test_hits_matches_python_golden_on_crawl_graph(spark):
    """Run the real sf0.001 query and replay the lattice in Python
    over the same deterministic edge rule — exact equality, not a
    tolerance (integer sums are aggregation-order-independent)."""
    import pyarrow.parquet as pq

    from webcrawlergo_spark.operators.crawl_queries import _EDGE_MULS
    from webcrawlergo_spark.operators.graph import (
        HITS_ITER,
        HITS_SCALE,
        hits_scores,
    )

    n = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    edges = [
        (doc, (doc * a + b) % n) for doc in range(n) for a, b in _EDGE_MULS
    ]
    h, a = _golden_hits(n, edges, HITS_SCALE, HITS_ITER)
    got = {r.node: (r.hub_9, r.auth_9) for r in hits_scores(spark, SF_DIR).collect()}
    assert len(got) == n
    assert got == {v: (h[v], a[v]) for v in range(n)}


def test_hits_structure_star_graph(spark):
    """Star graph: every spoke links to the hub node. The hub must
    take (almost) all authority mass and zero hub score; spokes carry
    the hub mass and zero authority."""
    from pyspark.sql import functions as F

    from webcrawlergo_spark.operators.graph import HITS_SCALE, hits_frame

    n = 6
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(s, 0) for s in range(1, n)], "src long, dst long"
    )
    out = {r.node: (r.hub_9, r.auth_9) for r in hits_frame(nodes, edges, n).collect()}
    assert out[0][1] == HITS_SCALE  # all authority on the center
    assert out[0][0] == 0  # the center links to nothing
    for v in range(1, n):
        assert out[v][1] == 0
        assert out[v][0] == HITS_SCALE // (n - 1)
    # L1 mass never exceeds the lattice (floor losses only shrink it)
    assert sum(hub for hub, _ in out.values()) <= HITS_SCALE
    assert sum(auth for _, auth in out.values()) <= HITS_SCALE


# --------------------------------------------------------------------------
# phrase search
# --------------------------------------------------------------------------


def _phrase_hits(docs, phrase):
    """Brute-force occurrence scan, the semantics contract."""
    out = {}
    k = len(phrase)
    for doc_id, text in docs:
        toks = text.split(" ")
        anchors = [
            p
            for p in range(len(toks) - k + 1)
            if tuple(toks[p : p + k]) == phrase
        ]
        if anchors:
            out[doc_id] = (len(anchors), min(anchors))
    return out


def test_phrase_search_handbuilt_corpus(spark):
    from webcrawlergo_spark.operators.retrieval import phrase_search_df

    docs = [
        (0, "hash join is a hash join plan"),  # two occurrences
        (1, "join hash"),  # reversed — no match
        (2, "the hash join"),  # single, anchor 1
        (3, "hash only and join only"),  # terms present, never adjacent
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search_df(df, ("hash", "join")).collect()
    }
    assert got == _phrase_hits(docs, ("hash", "join")) == {
        0: (2, 0),
        2: (1, 1),
    }


def test_phrase_search_repeated_word_and_overlap(spark):
    """A phrase with a repeated word exercises the count(DISTINCT i)
    gate: one posting supports several pattern offsets, and
    overlapping occurrences must each count."""
    from webcrawlergo_spark.operators.retrieval import phrase_search_df

    phrase = ("a", "b", "a")
    docs = [
        (0, "a b a b a"),  # overlapping matches at 0 and 2
        (1, "a b c a"),  # a's present twice, middle wrong
        (2, "b a b a"),  # match at 1
        (3, "a b"),  # shorter than the phrase
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search_df(df, phrase).collect()
    }
    assert got == _phrase_hits(docs, phrase) == {0: (2, 0), 2: (1, 1)}


def test_phrase_search_plan_filters_before_shuffle(spark):
    """The pattern join must reach the scan side before any exchange:
    only phrase-term postings may shuffle (the inverted-index-lookup
    property bm25 established). A BroadcastHashJoin below the first
    Exchange is the witness."""
    from webcrawlergo_spark.operators.retrieval import phrase_search

    plan = phrase_search(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    bcast = plan.find("BroadcastHashJoin")
    assert bcast != -1
    # physical plan prints top-down: the broadcast join appearing
    # AFTER (deeper than) the first exchange in the string means it
    # executes before it
    assert bcast > first_exchange >= 0
