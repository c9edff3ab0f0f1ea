"""Similarity search over the embedding column (array<float>).

- brute-force cosine top-k (the correctness baseline): broadcast the
  query set, JVM-side dot products via zip_with + aggregate (a
  sequential left fold — bit-identical to DuckDB's list_dot_product
  loop, then rounded to 6dp for belt-and-braces), window top-k.
- LSH-bucketed ANN (the scale path): sign-random-projection buckets
  from md5-derived deterministic hyperplanes; search only within the
  query's bucket. At 100 TB the bucket id is the shuffle/partition
  key and the brute-force cross join never materializes.
- near-duplicate pairs: same-bucket pairs with cosine ≥ threshold.

All hyperplane "randomness" is md5-derived (plane p, dim d →
sign ±1), reproducible identically in Python, Spark SQL and DuckDB —
no RNG state to ship.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

N_PLANES = 8
DIM = 64
TOP_K = 5
N_QUERIES = 3  # vec_id < 3 are the query vectors


def _sign(p: int, d: int) -> int:
    """Deterministic ±1: first hex digit of md5('{p}-{d}') < '8' → +1.
    (Python hashlib and SQL md5 agree bit-for-bit.)"""
    return 1 if hashlib.md5(f"{p}-{d}".encode()).hexdigest()[0] < "8" else -1


def _signs(p: int) -> list[int]:
    return [_sign(p, d) for d in range(DIM)]


_SIGN_SQL_CASE = "CASE WHEN substr(md5(CAST(p AS VARCHAR) || '-' || CAST(d AS VARCHAR)), 1, 1) < '8' THEN 1 ELSE -1 END"


def _dot(a, b, dim: int = DIM):
    """Dot product of two fixed-``dim`` numeric array columns as an
    UNROLLED codegen expression:
    lit(0.0) + a[1]·b[1] + … + a[dim]·b[dim], left-associated, each
    element cast to double individually.

    Bit-identical to the previous ``aggregate(zip_with(cast(a), cast(b),
    *), 0.0, acc + x)`` spelling (and to DuckDB's list_dot_product
    loop): a float→double SCALAR cast is exact, so casting elements
    instead of the whole array changes nothing numerically, IEEE
    addition is deterministic given the order, and the unrolled sum
    evaluates in exactly the fold's order including the leading
    ``0.0 +`` step (which normalizes a −0.0 first product the way the
    fold's initial accumulator does). Two r6 performance lessons live
    here:

    - the fold ran INTERPRETED (higher-order functions are
      CodegenFallback) — 64 lambda dispatches per row per fold vs one
      whole-stage-codegen arithmetic chain; semdedup_keep evaluates a
      fold per candidate PAIR (25M at sf1.0);
    - the per-ELEMENT cast matters as much as the unroll: with
      ``v = cast(embedding AS array<double>)`` as the input column,
      CollapseProject inlines the O(dim) array cast into every
      element_at reference — O(dim²) work per fold, measured as a 5×
      REGRESSION before the callers switched to passing the raw
      parquet float array (the embedding_quantize CollapseProject
      trap, round 2)."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + (
            F.element_at(a, i + 1).cast("double")
            * F.element_at(b, i + 1).cast("double")
        )
    return acc


def _vecs(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """(vec_id, v) with v the RAW parquet float array — deliberately
    NOT cast to array<double> here (r6): an array-level cast column
    gets inlined by CollapseProject into every element_at of the
    unrolled _dot/_sub_l2 consumers, re-casting the whole vector per
    element access (O(dim²) per fold — the embedding_quantize trap).
    The unrolled expressions cast per ELEMENT (exact for float→double)
    and the few array-level consumers (pandas-UDF bucketing, the
    quantize transforms, the kmeans lattice) cast at their boundary,
    where the array is materialized once per row."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if spread:
        from webcrawlergo_spark.sources.tpch import spread_scan

        # spread the single-row-group scan (r6): a vector×codeword /
        # vector×centroid fan-out otherwise runs on the scan's 1-2
        # tasks. OPT-IN per query: the fan-out consumers (pq encode,
        # semdedup/ivf cell assignment, kmeans) measured faster at
        # both sf0.1 and sf1.0 with it; the light one-pass consumers
        # (cosine, ann bucketing, quantize) measured SLOWER — their
        # per-row work is one Arrow batch and the extra exchange is
        # recomputed by every broadcast-build job in the plan.
        emb = spread_scan(emb, "vec_id")
    return emb.select("vec_id", F.col("embedding").alias("v"))


def _pair_dot(a, b):
    """Vectorized Arrow twin of ``_dot`` for per-PAIR scoring streams:
    one pandas-UDF double per row.

    BIT-IDENTICAL by the _bucket_nv_struct argument: vectorized across
    ROWS, sequential across DIMS (``acc += a[:, d] * b[:, d]`` for
    d = 0..DIM-1 — the exact left-fold order), inputs cast to
    array<double> at the Arrow boundary (exact for float32). r6
    measurement: every JVM spelling of a 64-term dot (interpreted HOF
    fold, unrolled codegen, with or without huge-method JIT) costs
    2.5-27 µs per evaluation; the Arrow batch path amortizes to tens
    of NANOseconds per pair (guide §4.2 — hand whole batches to
    numpy)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _udf(ca: pd.Series, cb: pd.Series) -> pd.Series:
        n = len(ca)
        if n == 0:
            return pd.Series([], dtype="float64")
        ma = np.stack(ca.to_numpy())
        mb = np.stack(cb.to_numpy())
        acc = np.zeros(n, dtype=np.float64)
        for d in range(ma.shape[1]):
            acc = acc + ma[:, d] * mb[:, d]  # sequential in d == left fold
        return pd.Series(acc)

    return _udf(a.cast("array<double>"), b.cast("array<double>"))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: queries (vec_id < N_QUERIES) vs all.

    Plan shape: broadcast-nested-loop of a 3-row query side against
    the corpus — the corpus side streams, nothing shuffles until the
    per-query top-k (a tiny TakeOrdered per group). The per-pair dot
    runs through the Arrow batch path (``_pair_dot``); norms are
    per-vector — ALSO via the Arrow path, which pins their evaluation
    into an ArrowEvalPython node below the join (a JVM norm expression
    gets CollapseProject-inlined into the post-join projection and
    re-evaluated per PAIR); the division + 6dp round stay in the JVM
    so the emitted score is Spark's own rounding."""
    vecs = _vecs(spark, sf_dir).withColumn(
        "nv", F.sqrt(_pair_dot(F.col("v"), F.col("v")))
    )
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    pairs = vecs.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = _pair_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


COSINE_TOPK_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, vecs.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, vecs.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(vecs.v, vecs.v))), 6) AS score
  FROM vecs CROSS JOIN q WHERE vecs.vec_id <> q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def _bucket_col(v):
    """8-bit sign-projection bucket of an array<double> column —
    JVM-expression spelling (8 interpreted aggregate folds per row).

    Each plane's signs are baked as a literal ±1 array (computed from
    md5 in Python — identical to the SQL derivation); the projection
    is a JVM-side fold, so bucketing a 10^10-row corpus is one
    narrow map stage. Kept as the reference implementation and the
    equality twin for the vectorized path below (the urlnorm
    dual-path pattern); the operators use ``_bucket_nv_struct`` —
    the 8 folds per row are the measured ANN bottleneck (r5: ~75%
    of warm ann_lsh_topk was bucketing 5k rows, not scoring).
    """
    bucket = F.lit(0)
    for p in range(N_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in _signs(p)])
        proj = _dot(v, signs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


_SIGNS_NP = None  # lazy: numpy sign matrix (N_PLANES, DIM), built once per process


def _signs_np():
    global _SIGNS_NP
    if _SIGNS_NP is None:
        _SIGNS_NP = np.array([_signs(p) for p in range(N_PLANES)], dtype=np.float64)
    return _SIGNS_NP


def _bucket_nv_struct(v):
    """Vectorized Arrow twin of ``_bucket_col`` + the vector norm, in
    ONE pass: struct<bucket:int, nv:double> from a pandas UDF.

    BIT-IDENTICAL to the interpreted folds by construction: the
    accumulation is vectorized across ROWS but sequential across
    DIMS (``acc = acc + v[:, d] * s[d]`` for d = 0..DIM-1), which is
    exactly the left-fold order of ``aggregate(zip_with(...))`` and
    of DuckDB's list_dot_product — IEEE addition is deterministic
    given the order, so bucket ids and norms hash-match the oracle.
    Equality with the JVM spelling is CI-asserted over the testdata
    corpus (test_flagship_plan::test_bucket_udf_equals_jvm_fold).

    Scale shape: one Arrow-batched narrow map (no shuffle, no
    collect); replaces 9 interpreted array walks per row with 64
    numpy row-vector ops per batch — the measured r5 win that took
    warm ann_lsh_topk from ~2.1 s to well under a second at sf0.1.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bucket int, nv double")
    def _udf(col: pd.Series) -> pd.DataFrame:
        n = len(col)
        if n == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int32"),
                                 "nv": pd.Series([], dtype="float64")})
        m = np.stack(col.to_numpy())  # (n, DIM) float64
        signs = _signs_np()
        bucket = np.zeros(n, dtype=np.int64)
        for p in range(N_PLANES):
            acc = np.zeros(n, dtype=np.float64)
            s = signs[p]
            for d in range(DIM):
                acc = acc + m[:, d] * s[d]  # sequential in d == left fold
            bucket |= (acc > 0).astype(np.int64) << p
        nv = np.zeros(n, dtype=np.float64)
        for d in range(DIM):
            nv = nv + m[:, d] * m[:, d]
        return pd.DataFrame({"bucket": bucket.astype("int32"), "nv": np.sqrt(nv)})

    # cast at the UDF boundary: _vecs now carries the raw float array
    # (see its docstring) and the numpy path must accumulate in
    # float64; the Arrow projection materializes the cast once per row
    return _udf(v.cast("array<double>"))


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket assignment for every vector (the ANN index build)."""
    vecs = _vecs(spark, sf_dir)
    return (
        vecs.select("vec_id", _bucket_nv_struct(F.col("v"))["bucket"].alias("bucket"))
        .orderBy("vec_id")
    )


_BUCKET_SQL = f"""
buckets AS (
  SELECT vec_id, CAST({" + ".join(
      f"CASE WHEN (SELECT SUM(v[d + 1] * ({_SIGN_SQL_CASE})) "
      f"FROM (SELECT unnest(range(0, {DIM})) AS d, {p} AS p) dims) > 0 "
      f"THEN {1 << p} ELSE 0 END"
      for p in range(N_PLANES))} AS INTEGER) AS bucket
  FROM vecs)
"""

ANN_BUCKETS_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_BUCKET_SQL}
SELECT vec_id, bucket FROM buckets ORDER BY vec_id
"""


MULTIPROBE_RADIUS = 1


def _probe_masks(radius: int) -> list[int]:
    """Hamming-ball XOR masks for multi-probe LSH: radius 0 = exact
    bucket only, 1 adds the N_PLANES single-bit flips, 2 the two-bit
    flips (Lv et al., VLDB'07 multi-probe idea — probe the buckets a
    near neighbor most likely fell into instead of building more
    tables)."""
    masks = [0]
    if radius >= 1:
        masks += [1 << p for p in range(N_PLANES)]
    if radius >= 2:
        masks += [(1 << a) | (1 << b) for a in range(N_PLANES) for b in range(a + 1, N_PLANES)]
    return masks


def lsh_topk(vecs: DataFrame, n_queries: int = N_QUERIES, radius: int = MULTIPROBE_RADIUS) -> DataFrame:
    """Multi-probe LSH ANN over a (vec_id, v) frame: each query probes
    its own bucket plus every bucket within Hamming radius ``radius``
    of its signature, exact cosine re-rank inside the probed buckets.

    Scale shape: the probe expansion happens on the QUERY side (tiny —
    |queries| × |masks| rows, broadcast), so the corpus join stays a
    plain equi-join on bucket — one shuffle/partition key at 10^10
    rows, identical to the single-probe plan. A corpus vector matches
    at most one mask per query (probe buckets are distinct), so no
    dedup pass is needed.

    Multi-probe cost control (r5, VERDICT item 4): the ~9× candidate
    expansion made the per-candidate cosine the bottleneck — and 2 of
    its 3 array folds were NORMS, recomputed per candidate by the
    interpreted HOF evaluator (no common-subexpr elimination across
    rows). Norms depend only on the vector, so they're precomputed in
    the same narrow map that buckets the corpus (O(corpus), once) and
    each candidate pays ONE fold (the dot). sqrt/product order is
    unchanged, so scores stay bit-identical to the oracle's
    sqrt(qq)*sqrt(vv) spelling."""
    # coalesce makes the join key provably non-null: without it the
    # equi-join inserts IsNotNull(bucket) BELOW the projection and the
    # Arrow UDF evaluates TWICE per corpus row (observed in the r5
    # plan audit: two ArrowEvalPython nodes on the stream side)
    vecs = vecs.withColumn("_bn", _bucket_nv_struct(F.col("v"))).select(
        "vec_id", "v",
        F.coalesce(F.col("_bn.bucket"), F.lit(-1)).alias("bucket"),
        F.col("_bn.nv").alias("nv"),
    )
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"), F.col("nv").alias("nq"),
    )
    # probe buckets as a literal-array explode: ≤ |masks| pure column
    # expressions per query row — no masks DataFrame, no cross join,
    # no BroadcastNestedLoop node (r5: shrinks the plan Catalyst must
    # re-optimize on every invocation; the probe expansion itself is
    # unchanged — query-side only, broadcast side stays tiny)
    probes = q.select(
        "query_id", "qv", "nq",
        F.explode(
            F.array(*[F.col("qb").bitwiseXOR(F.lit(m)) for m in _probe_masks(radius)])
        ).alias("pb"),
    )
    cand = vecs.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("pb")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    scored = cand.select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: multi-probe LSH (radius 1) + exact cosine re-rank.
    At scale: one equi-join shuffle on bucket, per-bucket candidate
    scan instead of full corpus."""
    return lsh_topk(_vecs(spark, sf_dir))


ANN_TOPK_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_BUCKET_SQL},
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb
      FROM vecs JOIN buckets USING (vec_id) WHERE vec_id < {N_QUERIES}),
masks AS (SELECT unnest([{", ".join(str(m) for m in _probe_masks(MULTIPROBE_RADIUS))}]) AS mask),
probes AS (
  SELECT query_id, qv, CAST(xor(qb, mask) AS INTEGER) AS pb
  FROM q CROSS JOIN masks),
scored AS (
  SELECT p.query_id, vecs.vec_id AS neighbor_id,
         round(list_dot_product(p.qv, vecs.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(vecs.v, vecs.v))), 6) AS score
  FROM vecs JOIN buckets USING (vec_id) JOIN probes p
    ON buckets.bucket = p.pb AND vecs.vec_id <> p.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.3) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets —
    the embedding-space analog of minhash_lsh_pairs."""
    # coalesce: non-null join key ⇒ no IsNotNull-under-projection ⇒
    # the Arrow UDF runs ONCE per row on each side (see lsh_topk note)
    vecs = _vecs(spark, sf_dir).withColumn("_bn", _bucket_nv_struct(F.col("v"))).select(
        "vec_id", "v",
        F.coalesce(F.col("_bn.bucket"), F.lit(-1)).alias("bucket"),
        F.col("_bn.nv").alias("nv"),
    )
    a = vecs.alias("a")
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bucket_b"), F.col("nv").alias("nb"),
    ).alias("b")
    pairs = a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_id") < F.col("vec_b")))
    # norms precomputed per vector (one narrow map), one fold per pair
    cos = _dot(F.col("v"), F.col("vb")) / (F.col("nv") * F.col("nb"))
    return (
        pairs.select(F.col("vec_id").alias("vec_a"), "vec_b", F.round(cos, 6).alias("score"))
        .filter(F.col("score") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


EMB_NEARDUP_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_BUCKET_SQL},
vb AS (SELECT vec_id, v, bucket FROM vecs JOIN buckets USING (vec_id))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS score
FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
ORDER BY vec_a, vec_b
"""


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# --------------------------------------------------------------------------

N_CELLS = 8
N_PROBE = 2
# deterministic coarse centroids: the embeddings of vec_ids 10..80
# step 10 (disjoint from the query ids < N_QUERIES). A k-means pass
# would refine them; centroid CHOICE is orthogonal to the IVF plan
# shape being exercised (assign → invert → probe-limited search).
CENTROID_IDS = [10 * (i + 1) for i in range(N_CELLS)]


def _cells(vecs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignment): every vector → argmax-cosine centroid.

    Assignment is a broadcast of N_CELLS rows against a narrow map
    over the corpus + a per-vector argmax expressed as a ``max_by``
    aggregate: the corpus×cells rows partial-aggregate map-side (one
    surviving row per vec_id per input partition) before the single
    shuffle on vec_id — at 10^10 vectors that is one scan plus a
    key-only shuffle, where the r2 ``Window.partitionBy(vec_id)``
    shape pushed all corpus×N_CELLS rows through the exchange.
    Tie-break matches the window it replaces (max aff, then LOWEST
    cell) via a struct key ordered (aff, -cell)."""
    cents = vecs.filter(F.col("vec_id").isin(CENTROID_IDS)).select(
        (F.col("vec_id") / 10).cast("int").alias("cell"), F.col("v").alias("cv")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    aff = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", F.round(cos, 6).alias("aff")
    )
    assign = aff.groupBy("vec_id").agg(
        F.max_by(
            "cell", F.struct(F.col("aff"), (-F.col("cell")).alias("neg_cell"))
        ).alias("cell")
    )
    return cents, assign.select("vec_id", "cell")


def ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build: every vector's coarse cell."""
    _, assign = _cells(_vecs(spark, sf_dir, spread=True))
    return assign.orderBy("vec_id")


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: each query probes its N_PROBE nearest cells, exact
    cosine re-rank inside the probed inverted lists only."""
    return ivf_topk_frames(_vecs(spark, sf_dir, spread=True))


def ivf_topk_frames(vecs: DataFrame, n_probe: int = N_PROBE) -> DataFrame:
    """IVF search over a (vec_id, v) frame (see ivf_topk)."""
    cents, assign = _cells(vecs)
    qv = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nq"),
    )
    qcos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    qaff = qv.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "cell", F.round(qcos, 6).alias("aff")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell").asc())
    probes = (
        qaff.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "nq", "cell")
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(vecs.withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v")))), "vec_id")
    )
    # norms precomputed per vector/query (see lsh_topk r5 note):
    # one interpreted fold per candidate instead of three
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    scored = cand.select("query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


_CELLS_SQL = f"""
cents AS (
  SELECT CAST(vec_id / 10 AS INTEGER) AS cell, v AS cv FROM vecs
  WHERE vec_id IN ({", ".join(str(i) for i in CENTROID_IDS)})),
aff AS (
  SELECT vec_id, cell,
         round(list_dot_product(v, cv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS aff
  FROM vecs CROSS JOIN cents),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY aff DESC, cell ASC) AS rn FROM aff) t
  WHERE rn = 1)
"""

IVF_CELLS_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_CELLS_SQL}
SELECT vec_id, cell FROM assign ORDER BY vec_id
"""

IVF_TOPK_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_CELLS_SQL},
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERIES}),
qaff AS (
  SELECT query_id, qv, cell,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS aff
  FROM q CROSS JOIN cents),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY aff DESC, cell ASC) AS rn FROM qaff) t
  WHERE rn <= {N_PROBE}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(p.qv, vecs.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(vecs.v, vecs.v))), 6) AS score
  FROM assign a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN vecs ON vecs.vec_id = a.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# INT8 quantization — the storage-compression step of an embedding store
# --------------------------------------------------------------------------


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric absmax INT8 quantization: q_i = round(v_i / scale),
    scale = max|v| / 127 — 4× smaller than float32 for a
    billion-vector ANN store (dot products rescale by
    scale_a·scale_b). Two portability/shape notes:

    - rounding is spelled ``floor(x/scale + 0.5)``: Spark's round()
      (HALF_UP) and DuckDB's round() do not agree bit-for-bit at
      .5 boundaries; floor arithmetic is exact in both. The same
      portable rounding produces ``scale_6``.
    - the quantized vector leaves as ONE scalar column (``q_csv``,
      comma-joined) — the driver's comparator canonicalizes via
      pandas and cannot hash list-valued cells (the r4 red row);
      the minhash family set this scalar-output convention.
    - the scale column is materialized behind a checkpoint BARRIER
      before the per-element transform: CollapseProject would
      otherwise inline the array_max expression into the lambda body,
      where the interpreted HOF evaluator re-computes it PER ELEMENT
      — O(dim²) per row (the r2 Catalyst lesson, BENCH.md).

    Zero vectors quantize with scale=1 (guarded identically in the
    oracle) instead of dividing by zero."""
    # array-level cast re-established here (see _vecs r6 note): the
    # HOF transforms below bind their input once per row, and the
    # checkpoint barrier materializes scale before the per-element map
    vecs = _vecs(spark, sf_dir).select(
        "vec_id", F.col("v").cast("array<double>").alias("v")
    )
    absmax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scaled = vecs.select(
        "vec_id",
        "v",
        F.when(absmax == 0, F.lit(1.0)).otherwise(absmax / 127).alias("scale"),
    ).localCheckpoint(eager=True)
    return (
        scaled.select(
            "vec_id",
            (F.floor(F.col("scale") * 1e6 + 0.5) / 1e6).alias("scale_6"),
            F.array_join(
                F.transform(
                    "v", lambda x: F.floor(x / F.col("scale") + 0.5).cast("int")
                ).cast("array<string>"),
                ",",
            ).alias("q_csv"),
        )
        .orderBy("vec_id")
    )


EMB_QUANTIZE_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
                  ELSE list_max(list_transform(v, x -> abs(x))) / 127 END AS scale
      FROM v)
SELECT vec_id, floor(scale * 1e6 + 0.5) / 1e6 AS scale_6,
       array_to_string(
           list_transform(v, x -> CAST(CAST(floor(x / scale + 0.5) AS INTEGER) AS VARCHAR)),
           ',') AS q_csv
FROM s ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# Product quantization (PQ) — the 64× embedding-store compression path
# --------------------------------------------------------------------------
#
# The third ANN scale path next to LSH and IVF, and the one that makes a
# 10^10-vector store FIT: a 64-dim float32 vector is 256 bytes; its PQ
# code is PQ_M bytes (here 8 — one codeword index per subspace). Search
# is ADC (asymmetric distance computation): the query stays exact, each
# corpus vector's distance is approximated by a table lookup per
# subspace — then the top shortlist is re-ranked with exact cosine, the
# standard production shape (PQ prunes 10^10 → 10^2, exact math touches
# only the survivors).

PQ_M = 8                 # subspaces
PQ_SUB = DIM // PQ_M     # dims per subspace
PQ_K = 16                # codewords per subspace → 4-bit codes
PQ_SHORTLIST = 64        # ADC survivors re-ranked exactly
# deterministic codebook: the sub-vectors of 16 fixed corpus rows.
# Step 9 (coprime to the fixture's 8-cluster id cycle) makes the
# codewords cover all clusters; a k-means pass would refine them —
# codebook CHOICE is orthogonal to the encode/ADC plan shape, same
# argument as CENTROID_IDS above.
PQ_CODE_IDS = [100 + 9 * i for i in range(PQ_K)]


def _sub_l2(a, b, m: int):
    """Squared L2 between subspace m of two array<double> columns —
    unrolled codegen arithmetic in the same left-fold order as the
    previous slice + zip_with + aggregate spelling, with per-element
    double casts (see _dot for both arguments), so Spark and DuckDB
    still produce bit-identical doubles."""
    acc = F.lit(0.0)
    for i in range(PQ_SUB):
        d = (
            F.element_at(a, m * PQ_SUB + i + 1).cast("double")
            - F.element_at(b, m * PQ_SUB + i + 1).cast("double")
        )
        acc = acc + d * d
    return acc


def _pq_codebook(vecs: DataFrame) -> DataFrame:
    """(k, cv): the PQ_K codeword vectors, k = 0..PQ_K-1."""
    return vecs.filter(F.col("vec_id").isin(PQ_CODE_IDS)).select(
        ((F.col("vec_id") - PQ_CODE_IDS[0]) / 9).cast("int").alias("k"),
        F.col("v").alias("cv"),
    )


def pq_codes_frame(vecs: DataFrame) -> DataFrame:
    """PQ encode: every vector → (c0..c7), c_m = argmin_k of the
    subspace-m squared L2 to codeword k (6dp-rounded, ties to the
    lowest k — deterministic in both engines).

    Scale shape (the _cells argument): the codebook is a PQ_K-row
    broadcast against a narrow map; the per-vector argmins are PQ_M
    ``min_by`` aggregates over the vec×codeword rows, so they
    partial-aggregate map-side before the single shuffle on vec_id.
    At 10^10 vectors: one scan + a key-only shuffle, and the output
    is 8 small ints per vector — the compressed store."""
    cb = _pq_codebook(vecs)
    d = vecs.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "k",
        *[F.round(_sub_l2(F.col("v"), F.col("cv"), m), 6).alias(f"d{m}") for m in range(PQ_M)],
    )
    return d.groupBy("vec_id").agg(
        *[
            F.min_by("k", F.struct(F.col(f"d{m}"), F.col("k"))).alias(f"c{m}")
            for m in range(PQ_M)
        ]
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle query: the full PQ code table (scalar int columns — the
    driver's comparator cannot hash array cells; minhash convention)."""
    return pq_codes_frame(_vecs(spark, sf_dir, spread=True)).orderBy("vec_id")


def pq_adc_topk_frames(vecs: DataFrame, shortlist: int = PQ_SHORTLIST) -> DataFrame:
    """PQ-ADC search: per query, one PQ_M×PQ_K distance table (exact
    sub-distances query↔codewords), each corpus vector scored by
    PQ_M table lookups, the ``shortlist`` nearest re-ranked with
    exact cosine → top-K.

    Scale shape: the distance tables are N_QUERIES rows (broadcast);
    scoring is a narrow codegen map over the CODES table (8 ints per
    vector — the embeddings themselves are touched only for the
    shortlist re-rank, a semi-join-sized read); the per-query
    shortlist cut is the salted two-phase top-K (politeness pattern),
    never a single-partition window over the corpus."""
    from webcrawlergo_spark.operators.sampling import salted_topk_per_group

    cb = _pq_codebook(vecs)
    codes = pq_codes_frame(vecs)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nq"),
    )
    dtab = q.crossJoin(F.broadcast(cb)).select(
        "query_id",
        "k",
        *[F.round(_sub_l2(F.col("qv"), F.col("cv"), m), 6).alias(f"t{m}") for m in range(PQ_M)],
    )
    # one array<double> per (query, subspace), codeword-indexed:
    # array_sort on struct(k, t) orders by k, transform strips to t.
    # (the m-binding must be a closure, NOT a second lambda default —
    # pyspark treats a 2-arg lambda as the (element, index) form)
    def _strip(m: int):
        return lambda s: s[f"t{m}"]

    dt = dtab.groupBy("query_id").agg(
        *[
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", f"t{m}"))), _strip(m)
            ).alias(f"dt{m}")
            for m in range(PQ_M)
        ]
    )
    approx = None
    for m in range(PQ_M):
        term = F.element_at(F.col(f"dt{m}"), F.col(f"c{m}") + 1)
        approx = term if approx is None else approx + term
    cand = (
        codes.crossJoin(F.broadcast(dt))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", approx.alias("approx"))
    )
    short = salted_topk_per_group(
        cand, ["query_id"], [F.col("approx"), F.col("vec_id")], shortlist, rank_col="_ark"
    ).drop("_ark")
    rer = short.join(
        vecs.withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v")))), "vec_id"
    ).join(F.broadcast(q), "query_id")
    score = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6)
    scored = rer.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(F.col("approx"), 6).alias("approx_dist"),
        score.alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN over the embeddings table (see pq_adc_topk_frames)."""
    return pq_adc_topk_frames(_vecs(spark, sf_dir, spread=True))


def _sub_l2_sql(a: str, b: str, m: int) -> str:
    """DuckDB twin of _sub_l2 (1-based list indexing, same fold)."""
    return (
        f"list_aggregate(list_transform(range(0, {PQ_SUB}), i -> "
        f"({a}[{m * PQ_SUB} + i + 1] - {b}[{m * PQ_SUB} + i + 1])"
        f" * ({a}[{m * PQ_SUB} + i + 1] - {b}[{m * PQ_SUB} + i + 1])), 'sum')"
    )


# argmin-with-tie-break has no composite-key arg_min in DuckDB 1.x —
# per-subspace first_value windows are the unambiguous spelling
_PQ_CODES_CTE = f"""
cb AS (
  SELECT CAST((vec_id - {PQ_CODE_IDS[0]}) / 9 AS INTEGER) AS k, v AS cv FROM vecs
  WHERE vec_id IN ({", ".join(str(i) for i in PQ_CODE_IDS)})),
d AS (
  SELECT vec_id, k,
         {", ".join(f"round({_sub_l2_sql('v', 'cv', m)}, 6) AS d{m}" for m in range(PQ_M))}
  FROM vecs CROSS JOIN cb),
codes AS (
  SELECT DISTINCT vec_id,
         {", ".join(f"first_value(k) OVER (PARTITION BY vec_id ORDER BY d{m}, k) AS c{m}" for m in range(PQ_M))}
  FROM d)
"""

PQ_CODES_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_PQ_CODES_CTE}
SELECT vec_id, {", ".join(f"c{m}" for m in range(PQ_M))} FROM codes ORDER BY vec_id
"""

PQ_ADC_TOPK_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_PQ_CODES_CTE},
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERIES}),
dtab AS (
  SELECT query_id, k,
         {", ".join(f"round({_sub_l2_sql('qv', 'cv', m)}, 6) AS t{m}" for m in range(PQ_M))}
  FROM q CROSS JOIN cb),
dt AS (
  SELECT query_id, {", ".join(f"list(t{m} ORDER BY k) AS dt{m}" for m in range(PQ_M))}
  FROM dtab GROUP BY query_id),
cand AS (
  SELECT query_id, vec_id,
         {" + ".join(f"dt{m}[c{m} + 1]" for m in range(PQ_M))} AS approx
  FROM codes CROSS JOIN dt WHERE vec_id <> query_id),
short AS (
  SELECT query_id, vec_id, approx FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx, vec_id) AS ark FROM cand) t
  WHERE ark <= {PQ_SHORTLIST}),
scored AS (
  SELECT s.query_id, s.vec_id AS neighbor_id, round(s.approx, 6) AS approx_dist,
         round(list_dot_product(q.qv, vecs.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(vecs.v, vecs.v))), 6) AS score
  FROM short s JOIN q ON s.query_id = q.query_id
  JOIN vecs ON vecs.vec_id = s.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_dist, score, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# Lloyd k-means refinement — the codebook/centroid trainer
# --------------------------------------------------------------------------
#
# IVF and PQ both ship deterministic data-row codebooks with the note
# "a k-means pass would refine them; centroid CHOICE is orthogonal to
# the plan shape". This is that pass: batch Lloyd iterations as pure
# DataFrame ops — assign (broadcast centroids, min_by argmin with
# map-side partials) then update (one groupBy(cell) with DIM sum
# aggregates). The portability trick that makes an ITERATIVE float
# algorithm oracle-exact: everything runs on the 1e-6 integer lattice
# (q_i = floor(v_i·1e6 + 0.5)). Integer sums are associative — immune
# to partitioning/visit order, unlike float sums, which differ between
# Spark's partial aggregation tree and DuckDB's sequential scan — so
# distances, argmins and the floor(sum/n + 0.5) centroid update are
# bit-identical in both engines at every iteration, no rounding
# tolerance needed.

KMEANS_ITER = 2


def _quant_vec(v):
    """v → 1e-6 lattice as array<long> (exact, portable)."""
    return F.transform(v, lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long"))


def _int_l2(a, b):
    """Exact squared L2 between two array<long> lattice vectors,
    unrolled to codegen arithmetic (integer adds are associative, so
    ordering is moot here — the unroll is purely the interpreted-HOF
    removal). Bounded: |q| ≤ ~1e7 ⇒ Σ64·(Δq)² ≤ ~6.4e15 < 2^63."""
    acc = F.lit(0).cast("long")
    for i in range(DIM):
        d = F.element_at(a, i + 1) - F.element_at(b, i + 1)
        acc = acc + d * d
    return acc


def kmeans_refine_frames(
    vecs: DataFrame, init_ids: list[int] | None = None, n_iter: int = KMEANS_ITER
) -> DataFrame:
    """``n_iter`` Lloyd rounds from the deterministic seed centroids
    (default: the IVF CENTROID_IDS rows); returns the final
    assignment (vec_id, cell).

    Per round: one broadcast of K centroid rows against a narrow map
    (K·N distance rows collapse map-side into one argmin row per
    vector before the single vec_id shuffle), then one
    groupBy(cell) with DIM exact integer sums (map-side combine) and
    the lattice mean floor(sum/n + 0.5). Cells that lose every member
    drop out (standard Lloyd); centroids are localCheckpoint'ed per
    round so lineage stays flat (wave-loop discipline). At 10^10
    vectors each round is one scan + two key-only shuffles."""
    ids = init_ids if init_ids is not None else CENTROID_IDS
    q = vecs.select("vec_id", _quant_vec(F.col("v")).alias("q")).localCheckpoint(
        eager=True
    )
    cents = q.filter(F.col("vec_id").isin(ids)).select(
        ((F.col("vec_id") / 10).cast("int")).alias("cell"), F.col("q").alias("cq")
    )
    assign = None
    for _ in range(n_iter):
        d = q.crossJoin(F.broadcast(cents)).select(
            "vec_id", "q", "cell", _int_l2(F.col("q"), F.col("cq")).alias("d")
        )
        assign = d.groupBy("vec_id").agg(
            F.min_by("cell", F.struct(F.col("d"), F.col("cell"))).alias("cell"),
            F.first("q").alias("q"),
        )
        sums = assign.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(DIM)],
        )
        cents = sums.select(
            "cell",
            F.array(
                *[
                    F.floor(F.col(f"s{i}") / F.col("n") + F.lit(0.5)).cast("long")
                    for i in range(DIM)
                ]
            ).alias("cq"),
        ).localCheckpoint(eager=True)
    return assign.select("vec_id", "cell")


def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle query: cell assignment after KMEANS_ITER Lloyd rounds."""
    return kmeans_refine_frames(_vecs(spark, sf_dir, spread=True)).orderBy("vec_id")


def _kmeans_sql(n_iter: int = KMEANS_ITER) -> str:
    """DuckDB twin, iterations unrolled as CTE pairs (exact integer
    lattice arithmetic — see the module comment)."""
    l2 = (
        "list_aggregate(list_transform(range(0, {dim}), i -> "
        "(q[i + 1] - cq[i + 1]) * (q[i + 1] - cq[i + 1])), 'sum')"
    ).format(dim=DIM)
    parts = [
        f"""qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS q
  FROM embeddings),
c0 AS (
  SELECT CAST(vec_id / 10 AS INTEGER) AS cell, q AS cq FROM qv
  WHERE vec_id IN ({", ".join(str(i) for i in CENTROID_IDS)}))"""
    ]
    for it in range(n_iter):
        sums_cols = ", ".join(f"SUM(q[{i + 1}]) AS s{i}" for i in range(DIM))
        mean_cols = ", ".join(
            f"CAST(floor(s{i} / CAST(n AS DOUBLE) + 0.5) AS BIGINT)" for i in range(DIM)
        )
        parts.append(
            f"""a{it} AS (
  SELECT vec_id, q, cell FROM (
    SELECT vec_id, q, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {l2}, cell) AS rn
    FROM qv CROSS JOIN c{it}) t
  WHERE rn = 1)"""
        )
        parts.append(
            f"""c{it + 1} AS (
  SELECT cell, [{mean_cols}] AS cq FROM (
    SELECT cell, COUNT(*) AS n, {sums_cols} FROM a{it} GROUP BY cell) t)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, cell FROM a{n_iter - 1} ORDER BY vec_id"
    )


KMEANS_CELLS_SQL = _kmeans_sql()


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune (Abbas et al. 2023)
# --------------------------------------------------------------------------

SEMDEDUP_TAU = 0.3
# raw-double cut equivalent to round(x, 6) >= SEMDEDUP_TAU — see the
# threshold note inside semdedup_keep (derived, not tuned: τ − 5e-7
# parsed as a double; any x at or above it rounds to ≥ τ at 6dp, any
# x below it rounds below τ)
_SEMDEDUP_CUT = float("0.2999995")


def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication: assign every embedding to its coarse
    cell (the IVF assignment — broadcast centroids, max_by partial
    agg), then within each cell prune any vector that has an
    earlier-id cell-mate with cosine ≥ τ. The survivors are the
    semantically-deduplicated corpus.

    This is the embedding-space analog of minhash-LSH dedup with the
    candidate generator swapped: cluster cells instead of hash bands
    (SemDeDup's observation is that near-duplicates land in the same
    k-means cluster, so the pairwise pass is bounded per-cell and the
    all-pairs join never materializes). Keep-lowest-id is the same
    deterministic canonical-representative rule the exact/minhash
    dedup family uses.

    r6 shape (guide §4.2/§8 — the r5 shape was a per-cell pair
    SELF-JOIN whose cosine expression evaluated ~50M times in the JVM
    at sf1.0, 62 s warm): one shuffle of the (vec_id, v, cell) rows on
    the cell key into a cogrouped Arrow pass that computes the whole
    per-cell cosine matrix in numpy and emits the survivors directly —
    the corpus crosses the Python boundary ONCE (N rows, never N²
    pairs), and the pair work is 64 vectorized rank-1 updates per
    cell. Bit-exactness is preserved by construction:

    - dots accumulate SEQUENTIALLY in d (``P += outer(m[:,d], m[:,d])``
      — the exact left-fold order of the JVM/DuckDB spelling) and
      cos = P / (nv_i · nv_j) uses the same multiply-then-divide;
    - the τ filter uses the raw-double cut ``cos >= _SEMDEDUP_CUT``
      (τ − 5e-7 as a parsed double), exactly equivalent to
      ``round(cos, 6) >= τ`` for every double because shortest-repr
      HALF_UP rounding is monotone (boundary doubles verified in
      test_semdedup_threshold_equivalence); NaN cosines (zero-norm
      vectors) count as ≥ τ, matching Spark's NaN-is-largest ordering;
    - prune rule unchanged: j is pruned iff ANY i < j in its cell has
      cos(i, j) at or above the cut.

    At 10^10 vectors a cell is one Arrow task and the matrix loops in
    column blocks (bounded memory); the same block key could shard a
    mega-cell across tasks — the per-cell work is quadratic in cell
    size under EITHER shape, this one just does it at numpy speed."""
    vecs = _vecs(spark, sf_dir, spread=True)
    _, assign = _cells(vecs.select("vec_id", "v"))
    va = vecs.join(assign, "vec_id").select(
        "vec_id", F.col("v").cast("array<double>").alias("v"), "cell"
    )

    cut = _SEMDEDUP_CUT

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pdf[["vec_id", "cell"]]
        m = np.stack(pdf["v"].to_numpy())  # (n, DIM) float64
        dim = m.shape[1]
        # transpose once so each dim's column is CONTIGUOUS: the
        # rank-1 updates below read one dim across all rows, which in
        # row-major (n, DIM) layout is a 512-byte-stride gather —
        # measured 10× slower than the same loop over (DIM, n)
        mt = np.ascontiguousarray(m.T)
        nv = np.zeros(n, dtype=np.float64)
        for d in range(dim):
            nv = nv + mt[d] * mt[d]  # sequential in d == left fold
        nv = np.sqrt(nv)
        pruned = np.zeros(n, dtype=bool)
        # blocked rank-1 accumulation: the naive `p += outer(...)` per
        # dim allocates and streams the full n×n matrix 64 times
        # (measured DRAM-bound, ~6 s at sf1.0); an (i, j) block small
        # enough to stay cache-resident across the 64 d-updates brings
        # the traffic down to one write of the matrix. d stays the
        # INNERMOST sequential loop — the bit-exact fold order.
        jblk, iblk = 4096, 128
        for j0 in range(0, n, jblk):
            j1 = min(j0 + jblk, n)
            hit_any = np.zeros(j1 - j0, dtype=bool)
            jidx = np.arange(j0, j1)
            for i0 in range(0, n, iblk):
                i1 = min(i0 + iblk, n)
                pb = np.zeros((i1 - i0, j1 - j0), dtype=np.float64)
                tmp = np.empty_like(pb)
                for d in range(dim):
                    np.multiply(mt[d, i0:i1, None], mt[d, None, j0:j1], out=tmp)
                    pb += tmp  # sequential in d == left fold
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = pb / np.outer(nv[i0:i1], nv[j0:j1])
                hit = (cos >= cut) | np.isnan(cos)  # NaN ≥ τ (Spark ordering)
                # j pruned iff any i < j (global index) hits
                rows = np.arange(i0, i1)[:, None] < jidx[None, :]
                hit_any |= (hit & rows).any(axis=0)
            pruned[j0:j1] = hit_any
        return pdf.loc[~pruned, ["vec_id", "cell"]]

    # pin the exchange width: the grouped rows are only ~500 bytes per
    # vector, so AQE's size-based coalescing folds the whole corpus
    # into ONE post-shuffle partition and the per-cell Arrow passes
    # run serially in a single Python task (the wave-width lesson,
    # plans/wave.py). An explicit repartition on the group key keeps
    # the cells spread; groupBy reuses the partitioning, so this is
    # still exactly one exchange.
    n_part = int(va.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        va.repartition(n_part, "cell")
        .groupBy("cell")
        .applyInPandas(_prune, "vec_id long, cell int")
        .orderBy("vec_id")
    )


SEMDEDUP_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_CELLS_SQL},
vb AS (SELECT a.vec_id, a.cell, vecs.v
       FROM assign a JOIN vecs ON vecs.vec_id = a.vec_id)
SELECT j.vec_id, j.cell FROM vb j
WHERE NOT EXISTS (
  SELECT 1 FROM vb i
  WHERE i.cell = j.cell AND i.vec_id < j.vec_id
    AND round(list_dot_product(i.v, j.v)
              / (sqrt(list_dot_product(i.v, i.v))
                 * sqrt(list_dot_product(j.v, j.v))), 6) >= {SEMDEDUP_TAU})
ORDER BY j.vec_id
"""


QUERIES = {
    "semdedup_keep": semdedup_keep,
    "cosine_topk": cosine_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "ivf_cells": ivf_cells,
    "ivf_topk": ivf_topk,
    "embedding_quantize": embedding_quantize,
    "pq_codes": pq_codes,
    "pq_adc_topk": pq_adc_topk,
    "kmeans_cells": kmeans_cells,
}

ORACLES = {
    "semdedup_keep": SEMDEDUP_SQL,
    "cosine_topk": COSINE_TOPK_SQL,
    "ann_lsh_buckets": ANN_BUCKETS_SQL,
    "ann_lsh_topk": ANN_TOPK_SQL,
    "embedding_neardup_pairs": EMB_NEARDUP_SQL,
    "ivf_cells": IVF_CELLS_SQL,
    "ivf_topk": IVF_TOPK_SQL,
    "embedding_quantize": EMB_QUANTIZE_SQL,
    "pq_codes": PQ_CODES_SQL,
    "pq_adc_topk": PQ_ADC_TOPK_SQL,
    "kmeans_cells": KMEANS_CELLS_SQL,
}
