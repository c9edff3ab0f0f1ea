"""Unit gates for the session-5 operators beyond the SQL oracle:
pagerank vs an exact pure-Python lattice twin, CMS vs a hashlib
golden + the est≥exact and mergeability contracts, chunking's
coverage/overlap/reconstruction properties, and SemDeDup's prune-rule
soundness against numpy cosines."""

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from webcrawlergo_spark.operators.graph import (
    PR_ITER,
    PR_SCALE,
    link_pagerank,
)
from webcrawlergo_spark.operators.sketch import (
    CMS_D,
    CMS_PHI_DEN,
    CMS_W,
    cms_heavy_hitters,
    cms_sketch,
)
from webcrawlergo_spark.operators.similarity import (
    SEMDEDUP_TAU,
    semdedup_keep,
)
from webcrawlergo_spark.operators.text import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    chunk_documents,
)

SF_DIR = "/root/testdata/sf0.001"
_EDGE_MULS = ((7, 1), (13, 2), (31, 3))


def _doc_ids():
    return sorted(pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
                  .column("doc_id").to_pylist())


def _pagerank_golden(ids):
    """The identical integer lattice in pure Python."""
    n = len(ids)
    edges = sorted({(i, (i * a + b) % n) for i in ids for a, b in _EDGE_MULS})
    odeg = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    r0 = PR_SCALE // n
    base = (15 * r0) // 100
    r = {i: r0 for i in ids}
    for _ in range(PR_ITER):
        s = {i: 0 for i in ids}
        for src, dst in edges:
            s[dst] += r[src] // odeg[src]
        r = {i: base + (85 * s[i]) // 100 for i in ids}
    return r


def test_pagerank_matches_python_lattice_exactly(spark):
    got = {row.node: row.pr_scaled for row in link_pagerank(spark, SF_DIR).collect()}
    want = _pagerank_golden(_doc_ids())
    assert got == want


def test_pagerank_mass_and_ordering(spark):
    """Total mass stays within the floor-leak bound (each node loses
    <1 unit per DIV per iteration) and in-link count drives rank:
    a node receiving ≥3 in-edges outranks every 0-in-edge node."""
    ids = _doc_ids()
    n = len(ids)
    r = _pagerank_golden(ids)
    total = sum(r.values())
    # per iteration each edge floors once and each node floors once
    # more in the damped update; 5 iterations of slack
    assert PR_SCALE * 0.98 <= total <= PR_SCALE
    edges = {(i, (i * a + b) % n) for i in ids for a, b in _EDGE_MULS}
    indeg = {i: 0 for i in ids}
    for _, d in edges:
        indeg[d] += 1
    rich = [i for i in ids if indeg[i] >= 3]
    poor = [i for i in ids if indeg[i] == 0]
    if rich and poor:
        assert min(r[i] for i in rich) > max(r[i] for i in poor)


def _cms_golden(tokens):
    n = {}
    for t in tokens:
        n[t] = n.get(t, 0) + 1
    sketch = {}
    for t, c in n.items():
        for r in range(CMS_D):
            b = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % CMS_W
            sketch[(r, b)] = sketch.get((r, b), 0) + c
    est = {
        t: min(
            sketch[(r, int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % CMS_W)]
            for r in range(CMS_D)
        )
        for t in n
    }
    return n, est


def _tokens():
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    return [t for x in texts for t in x.split(" ") if t]


def test_cms_matches_hashlib_golden_and_dominates_exact(spark):
    toks = _tokens()
    n, est = _cms_golden(toks)
    thresh = len(toks) // CMS_PHI_DEN
    want = {(t, n[t], est[t]) for t in n if est[t] >= thresh}
    got = {
        (r.tok, r.n_exact, r.cms_est)
        for r in cms_heavy_hitters(spark, SF_DIR).collect()
    }
    assert got == want
    assert all(e >= c for _, c, e in got)  # CMS never undercounts


def test_cms_sketch_is_bounded_and_mergeable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    full = cms_sketch(toks, "tok")
    assert full.count() <= CMS_D * CMS_W
    # deterministic hash-split halves (a limit() split would be
    # partition-order-dependent): last md5 hex digit < '8'
    h = F.substring(F.md5("tok"), 32, 1)
    lo = cms_sketch(toks.filter(h < F.lit("8")), "tok")
    hi = cms_sketch(toks.filter(h >= F.lit("8")), "tok")
    merged = (
        lo.unionByName(hi)
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_chunking_covers_overlaps_and_reconstructs(spark):
    rows = chunk_documents(spark, SF_DIR).collect()
    texts = dict(
        zip(
            pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_pylist(),
            pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
            .column("text")
            .to_pylist(),
        )
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id].split(" ")
        n = len(toks)
        chunks.sort(key=lambda r: r.chunk_id)
        starts = [r.tok_start for r in chunks]
        assert starts == list(range(0, n, CHUNK_STRIDE))
        for r in chunks:
            want = toks[r.tok_start : r.tok_start + CHUNK_SIZE]
            assert r.chunk_text == " ".join(want)
            assert r.n_tok == len(want)
        # consecutive chunks share SIZE-STRIDE tokens of context
        for a, b in zip(chunks, chunks[1:]):
            if a.tok_start + CHUNK_SIZE <= n:
                shared_a = a.chunk_text.split(" ")[CHUNK_STRIDE:]
                shared_b = b.chunk_text.split(" ")[: CHUNK_SIZE - CHUNK_STRIDE]
                assert shared_a == shared_b
        # full coverage: last chunk reaches the final token
        assert chunks[-1].tok_start + chunks[-1].n_tok == n


def test_anchor_text_matches_python_golden(spark):
    """Per-href anchor aggregation vs a direct Python walk of the
    token stream (anchor = preceding token in document order)."""
    from webcrawlergo_spark.operators.crawl_queries import anchor_text_agg

    tab = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    agg = {}
    for doc_id, text in zip(
        tab.column("doc_id").to_pylist(), tab.column("text").to_pylist()
    ):
        toks = text.split(" ")
        for pos, tok in enumerate(toks):
            if not tok.startswith("s"):
                continue
            anchor = toks[pos - 1] if pos > 0 else ""
            href = f"https://site.test/{tok}"
            n, docs, first = agg.get(href, (0, set(), None))
            first = anchor if first is None else min(first, anchor)
            docs.add(doc_id)
            agg[href] = (n + 1, docs, first)
    want = {
        (href, n, len(docs), first) for href, (n, docs, first) in agg.items()
    }
    got = {
        (r.href, r.n_refs, r.n_src_docs, r.first_anchor)
        for r in anchor_text_agg(spark, SF_DIR).collect()
    }
    assert got == want


def test_crawl_delta_edge_semantics(spark):
    """Hand-built log exercising every branch: unchanged (no fetch
    after t0), updated (newer page in the window), new (first fetch
    inside the window), a boundary fetch AT t0 exactly (inclusive —
    still the t0 snapshot), and a URL first fetched after t1
    (invisible to the delta)."""
    import datetime

    from webcrawlergo_spark.operators.crawl_queries import crawl_delta_frames

    def t(day):
        return datetime.datetime(2024, 1, day)

    pages = spark.createDataFrame(
        [
            # url 1: fetched day1 only -> unchanged, 0 new fetches
            (101, 1, t(1)),
            # url 2: day1 then day3 -> updated, 1 new fetch
            (102, 2, t(1)),
            (103, 2, t(3)),
            # url 3: first fetch day3 -> new
            (104, 3, t(3)),
            # url 4: only a fetch AFTER t1 -> absent from the delta
            (105, 4, t(5)),
            # url 5: two fetches before t0 -> unchanged, latest is the newer
            (106, 5, t(1)),
            (107, 5, t(2)),
        ],
        "id long, url_id long, added_at timestamp",
    )
    got = {
        r.url_id: (r.status, r.n_new_fetches, r.latest_id_t1)
        for r in crawl_delta_frames(
            pages, t0="2024-01-02 00:00:00", t1="2024-01-04 00:00:00"
        ).collect()
    }
    assert got == {
        1: ("unchanged", 0, 101),
        2: ("updated", 1, 103),
        3: ("new", 1, 104),
        5: ("unchanged", 0, 107),
    }


def test_crawl_delta_single_exchange(spark):
    """The snapshot diff is one window pass: exactly ONE hash
    exchange (url_id) and zero joins in the executed plan."""
    from webcrawlergo_spark.operators.crawl_queries import crawl_delta

    plan = (
        crawl_delta(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, plan


def test_pmi_phrases_matches_python_golden(spark):
    """Top-k PMI collocations vs an exact Python replication of the
    shared formula (same op order, same floor-round)."""
    from webcrawlergo_spark.operators.text import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
        pmi_phrases,
    )

    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    uni, bg = {}, {}
    nu = nb = 0
    for text in texts:
        toks = [t for t in text.split(" ") if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
            nu += 1
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            nb += 1
    scored = []
    for (x, y), c_xy in bg.items():
        if c_xy < PMI_MIN_COUNT:
            continue
        pmi = math.log(((float(c_xy) * nu) / (uni[x] * uni[y])) * (float(nu) / nb))
        pmi6 = math.floor(pmi * 1e6 + 0.5) / 1e6
        scored.append((f"{x} {y}", c_xy, pmi6))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = scored[:PMI_TOP_K]
    got = [(r.bg, r.c_xy, r.pmi_6) for r in pmi_phrases(spark, SF_DIR).collect()]
    assert got == want
    # PMI is a log-ratio: independent pairs sit near 0, collocations
    # above — the top-k must all beat independence
    assert all(p > 0 for _, _, p in got)


def test_stream_dedup_matches_batch_distinct(spark):
    """The streaming first-encounter dedup's drained emission set ==
    batch DISTINCT, and re-running against the same source emits the
    same set (state-store determinism of the key set)."""
    from webcrawlergo_spark.streaming.dedup_stream import stream_dedup_distinct

    got = [(r.user_id, r.event_type) for r in stream_dedup_distinct(spark, SF_DIR).collect()]
    want = [
        (r.user_id, r.event_type)
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
        .collect()
    ]
    assert got == want
    assert len(got) == len(set(got))  # each key emitted exactly once
    again = [(r.user_id, r.event_type) for r in stream_dedup_distinct(spark, SF_DIR).collect()]
    assert again == want


def test_semdedup_prune_rule_is_sound(spark):
    """kept ⊎ pruned = corpus, and the prune decision matches the
    numpy cosine rule with an ulp guard around τ (the exact rounded
    boundary is the SQL oracle's job)."""
    kept_rows = semdedup_keep(spark, SF_DIR).collect()
    kept = {r.vec_id for r in kept_rows}
    cell_of = {r.vec_id: r.cell for r in kept_rows}

    tab = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = tab.column("vec_id").to_pylist()
    V = np.array(tab.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    V = V[order]
    # replicate the cell assignment: argmax rounded cosine vs the
    # fixed centroids (cell id = vec_id/10 ∈ 1..8), ties to the
    # lowest cell
    cells = list(range(1, 9))
    cents = {c: V[ids.index(10 * c)] for c in cells}
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    aff = np.stack(
        [Vn @ (cents[c] / np.linalg.norm(cents[c])) for c in cells], axis=1
    )
    cell = np.argmax(np.round(aff, 6), axis=1) + 1
    for vid in kept:
        assert cell_of[vid] == cell[ids.index(vid)]
    cos = Vn @ Vn.T
    pruned = set(ids) - kept
    for j_idx, j in enumerate(ids):
        mates = [
            i_idx
            for i_idx, i in enumerate(ids)
            if i < j and cell[i_idx] == cell[j_idx]
        ]
        best = max((cos[i_idx, j_idx] for i_idx in mates), default=-2.0)
        if best >= SEMDEDUP_TAU + 1e-9:
            assert j in pruned
        elif best < SEMDEDUP_TAU - 1e-9:
            assert j in kept
