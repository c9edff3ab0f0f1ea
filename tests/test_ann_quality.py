"""ANN retrieval QUALITY (not just determinism): on data with real
cluster structure the multi-probe LSH and IVF paths must recover the
brute-force cosine top-k with high recall.

The driver-oracle checks pin these operators' outputs exactly, but an
ANN operator can be deterministic and still useless — recall against
the brute-force twin is the quality metric. The testdata embeddings
are near-isotropic (top-neighbor cosine ≈ 0.3 ≈ 3σ of noise at
dim 64), so recall there is information-theoretically data-limited
(measured and recorded in BENCH.md §ann-recall, not asserted); THIS
fixture plants 8 clusters (intra-cluster cosine ≈ 0.95) so the
operators' sublinear search has actual structure to find, and the
floors assert they find it.
"""

import numpy as np
from pyspark.sql import functions as F

from webcrawlergo_spark.operators.similarity import (
    CENTROID_IDS,
    DIM,
    N_QUERIES,
    TOP_K,
    ivf_topk_frames,
    lsh_topk,
)

N_VECS = 400
N_CLUSTERS = 8
NOISE = 0.15


def _clustered(seed: int = 5) -> np.ndarray:
    """8 unit-norm cluster centers; every vector = its center + a
    small unit-direction perturbation. Ids arranged so the fixed IVF
    centroid ids (10..80) land in 8 DISTINCT clusters and query ids
    0..2 in clusters 0..2."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.array([i % N_CLUSTERS for i in range(N_VECS)])
    for j, cid in enumerate(CENTROID_IDS):
        cluster[cid] = j
    for q in range(N_QUERIES):
        cluster[q] = q
    g = rng.normal(size=(N_VECS, DIM))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    vecs = centers[cluster] + NOISE * g
    return vecs


def _ground_truth(vecs: np.ndarray) -> set[tuple[int, int]]:
    """Brute-force cosine top-k pairs, mirroring the operators' 6dp
    rounding + (score desc, neighbor_id asc) tie-break."""
    norms = np.linalg.norm(vecs, axis=1)
    out = set()
    for q in range(N_QUERIES):
        cos = np.round(vecs @ vecs[q] / (norms * norms[q]), 6)
        order = sorted(
            (i for i in range(N_VECS) if i != q), key=lambda i: (-cos[i], i)
        )
        out |= {(q, i) for i in order[:TOP_K]}
    return out


def _recall(df, gt) -> float:
    got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    return len(gt & got) / len(gt)


def test_ann_recall_floors_on_clustered_fixture(spark):
    vecs = _clustered()
    gt = _ground_truth(vecs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N_VECS)],
        "vec_id long, v array<double>",
    ).cache()
    # multi-probe LSH: radius 1 (the shipped default) must clear 0.8;
    # radius 0 (exact bucket) is recorded as strictly ≤ radius 1
    r1 = _recall(lsh_topk(df, radius=1), gt)
    r0 = _recall(lsh_topk(df, radius=0), gt)
    assert r1 >= 0.8, (r0, r1)
    assert r0 <= r1
    # IVF with the default 2-cell probe: the query's own cluster is
    # probe #1, so structured data must clear 0.8 as well
    ri = _recall(ivf_topk_frames(df), gt)
    assert ri >= 0.8, ri


def test_pq_adc_recall_floor_on_clustered_fixture(spark):
    """PQ-ADC with exact re-rank must recover the brute-force top-k on
    clustered data: the ADC shortlist (64 ≫ cluster size) keeps the
    query's cluster, and the exact re-rank restores the true order.
    Also pins the encode invariant: a codeword row's own code is its
    k in every subspace (distance 0 to itself)."""
    from webcrawlergo_spark.operators.similarity import (
        PQ_CODE_IDS,
        PQ_M,
        pq_adc_topk_frames,
        pq_codes_frame,
    )

    vecs = _clustered()
    gt = _ground_truth(vecs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N_VECS)],
        "vec_id long, v array<double>",
    ).cache()
    rp = _recall(pq_adc_topk_frames(df), gt)
    assert rp >= 0.8, rp
    codes = {r["vec_id"]: r for r in pq_codes_frame(df).collect()}
    for k, cid in enumerate(PQ_CODE_IDS):
        assert all(codes[cid][f"c{m}"] == k for m in range(PQ_M)), (k, codes[cid])


def test_kmeans_refinement_improves_cluster_purity(spark):
    """Lloyd rounds must move the data-row seed centroids TOWARD the
    true cluster centers: assignment accuracy vs the planted cluster
    labels after 2 rounds must beat (or match) the 0-round seed
    assignment, and must be near-perfect on this strongly separated
    fixture. (The integer-lattice arithmetic is oracle-gated by
    kmeans_cells; this asserts the refinement is WORTH running.)"""
    from webcrawlergo_spark.operators.similarity import kmeans_refine_frames

    vecs = _clustered()
    truth = {}
    cluster = [i % N_CLUSTERS for i in range(N_VECS)]
    for j, cid in enumerate(CENTROID_IDS):
        cluster[cid] = j
    for q in range(N_QUERIES):
        cluster[q] = q
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N_VECS)],
        "vec_id long, v array<double>",
    ).cache()

    def accuracy(n_iter):
        # seed id 10·(j+1) belongs to true cluster j, so cell j should
        # collect exactly true-cluster-j members
        assign = {r["vec_id"]: r["cell"] for r in kmeans_refine_frames(df, n_iter=n_iter).collect()}
        # map each cell to its majority true cluster, score agreement
        from collections import Counter, defaultdict

        per_cell = defaultdict(Counter)
        for vid, cell in assign.items():
            per_cell[cell][cluster[vid]] += 1
        best = sum(c.most_common(1)[0][1] for c in per_cell.values())
        return best / len(assign)

    a1 = accuracy(1)
    a2 = accuracy(2)
    assert a2 >= a1, (a1, a2)
    assert a2 >= 0.95, a2


def test_semdedup_threshold_equivalence(spark):
    """The r6 semdedup prune filter replaces ``round(cos, 6) >= τ``
    with the raw-double cut ``cos >= _SEMDEDUP_CUT`` (τ − 5e-7 as a
    parsed double) to keep BigDecimal/toString out of the 10^7-pair
    hot loop. The two predicates must agree for EVERY double —
    asserted here over adversarial boundary values: the cut itself,
    its ulp neighbours, every 1e-6 grid point near τ with ±ulp
    jitter, randoms, ±0.0 and NaN (NaN ≥ τ under Spark ordering on
    both spellings)."""
    import math
    import struct

    from webcrawlergo_spark.operators.similarity import _SEMDEDUP_CUT, SEMDEDUP_TAU

    def ulp_step(x: float, n: int) -> float:
        (bits,) = struct.unpack("<q", struct.pack("<d", x))
        return struct.unpack("<d", struct.pack("<q", bits + n))[0]

    vals = [float("nan"), 0.0, -0.0, 1.0, -1.0, SEMDEDUP_TAU, _SEMDEDUP_CUT]
    for base in [0.299998 + k * 1e-6 for k in range(5)] + [_SEMDEDUP_CUT, 0.3]:
        for n in range(-3, 4):
            vals.append(ulp_step(base, n))
    import random

    rng = random.Random(6)
    vals += [rng.uniform(0.2999, 0.3001) for _ in range(200)]
    vals += [rng.uniform(-2, 2) for _ in range(200)]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bad = df.filter(
        (F.round("x", 6) >= F.lit(SEMDEDUP_TAU)) != (F.col("x") >= F.lit(_SEMDEDUP_CUT))
    ).count()
    assert bad == 0
    # NaN must land on the pruned side under both spellings
    nan_row = df.filter(F.isnan("x")).select(
        (F.round("x", 6) >= F.lit(SEMDEDUP_TAU)).alias("a"),
        (F.col("x") >= F.lit(_SEMDEDUP_CUT)).alias("b"),
    ).collect()[0]
    assert nan_row["a"] == nan_row["b"]
