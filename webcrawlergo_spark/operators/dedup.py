"""Deduplication operators for the training-data pipeline.

Four tiers, all expressed with built-in (codegen'd) column functions —
no Python in the hot path:

- exact:        md5 content hash → groupBy (the J2/U1 dedup idea
                applied to content instead of URLs)
- minhash+LSH:  word-shingles → 8 minhashes → 4 bands → bucket
                self-join → verified Jaccard
- simhash:      16-bit sign-aggregated token hash, groupBy-sum shaped
                (map-side combine ⇒ scales)
- n-gram Jaccard: exact Jaccard over word-bigram sets, candidates
                from the same banded LSH generator (independent seeds)

Portability note: every hash is md5 (bit-identical in Spark, DuckDB
and Python), never xxhash/murmur, so each op has an exact DuckDB
oracle twin. Minhash uses the *lexicographic* min of fixed-length md5
hex digests — order-isomorphic to numeric min over uniform hashes,
and portable without bigint hex casts.

At 100 TB: exact/simhash are single-shuffle groupBys; minhash-LSH
shuffles once on (band_id, band_key) and the bucket self-join is
bounded by bucket size (skewed mega-buckets are broken by AQE skew
split; a salt column is threaded through for pathological cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH / N_BANDS = 2
SHINGLE = 3  # word 3-gram shingles


def gram_pattern(n: int) -> str:
    """The single-codegen-pass word n-gram regex (see _shingles for
    the semantics vs split-on-space). regexp_extract_all(col, pat, 1)
    yields the NON-distinct ordered gram list; _shingles adds the
    distinct for set-shaped consumers."""
    return r"(?=(" + " ".join([r"[^ ]+"] * n) + r"))[^ ]+ ?"


def _shingles(col, n: int = SHINGLE):
    """Word n-gram shingles as a distinct array column — ONE
    whole-stage-codegen regex pass: a lookahead capture grabs the
    n-token window at every token start, so overlapping shingles fall
    out of a single `regexp_extract_all`.

    This replaced an r3 `transform(sequence(...), i ->
    concat_ws(element_at×n))` HOF: higher-order functions run
    INTERPRETED (no codegen, no common-subexpr elimination) and that
    shape measured 2.8 s for 5,000 sf0.1 docs where the regex does
    0.3 s — it was the single largest cost in minhash_lsh_pairs.
    Semantics: identical to split-on-space shingling (the DuckDB
    oracle's definition) for CLEAN single-space-delimited text —
    `[^ ]+` treats ONLY the space as delimiter, like split(' ') —
    except wherever split would produce EMPTY tokens: leading/
    trailing spaces are ignored (split(' a b c') yields an empty
    first token and the shingle ' a b'; the regex starts at 'a'), and
    a run of 2+ spaces is a HARD BREAK — the window needs n tokens
    separated by single spaces, so no shingle spans it. The corpus
    contains none of these (asserted by test_dedup_ops, which also
    pins the divergence behavior on boundary-space strings
    explicitly). Docs shorter
    than n tokens yield [] (the lookahead never matches).
    """
    pat = gram_pattern(n)
    # NULL text → [] (not NULL): the pre-r4 split/transform spelling
    # returned [] for NULL input and downstream explode/minhash relies
    # on that contract (ADVICE r4); regexp_extract_all propagates NULL.
    return F.coalesce(
        F.array_distinct(F.regexp_extract_all(col, F.lit(pat), F.lit(1))),
        F.array().cast("array<string>"),
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keeper = min doc_id.

    One shuffle on the 16-byte digest (never on the full text — at
    100 TB the text column stays un-shuffled, only the hash moves).
    """
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keeper_doc_id
"""


def _minhash_agg(docs: DataFrame, n: int = SHINGLE, seed_prefix: str = "") -> DataFrame:
    """(doc_id, mh0..mh7) via explode + groupBy-min.

    NOT array_min(transform(shingles, ...)) per seed: Catalyst's
    project-collapse inlines the (expensive) shingle-construction
    expression into every one of the 8 transforms, rebuilding the
    shingle set 8× per row. Exploding once and taking 8 mins in one
    aggregation computes shingles exactly once and gets map-side
    partial mins for free — the shuffle moves 8 hex strings per doc.
    Docs with no shingles (shorter than the shingle width) keep a row
    with NULL mins via the left join.
    """
    exploded = docs.select("doc_id", F.explode(_shingles(F.col("text"), n=n)).alias("g"))
    aggd = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{seed_prefix}{i}:"), F.col("g")))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )
    return docs.select("doc_id").join(aggd, "doc_id", "left")


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc minhash signature: for seed i, min(md5(i || ':' || shingle)).

    Emitted as columns mh0..mh7 so the full signature computation is
    oracle-checkable row by row.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return _minhash_agg(docs).orderBy("doc_id")


def _shingles_sql(n: int = SHINGLE) -> str:
    """DuckDB twin of _shingles (1-based list indexing)."""
    parts = " || ' ' || ".join(f"s[i + {j + 1}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(0, len(s) - {n - 1}), i -> {parts}))"
    )


MINHASH_SIG_SQL = f"""
SELECT doc_id,
       {", ".join(
           f"list_aggregate(list_transform(sh, x -> md5('{i}:' || x)), 'min') AS mh{i}"
           for i in range(N_MINHASH))}
FROM (SELECT doc_id, {_shingles_sql()} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) t1) t2
ORDER BY doc_id
"""


def _lsh_jaccard_pairs(
    docs: DataFrame, n: int, threshold: float, seed_prefix: str = ""
) -> DataFrame:
    """MinHash-LSH near-dup candidates + verified Jaccard over word
    n-gram shingles — the shared scale path for every shingle width:
    shingle → minhash → band → bucket self-join (one shuffle on band
    key; candidate verification touches only bucket collisions, never
    the n² cross join)."""
    sh = _shingles(F.col("text"), n=n)
    band_cols = [
        F.md5(
            F.concat(
                F.lit(f"{seed_prefix}band{b}:"),
                *[
                    F.col(f"mh{i}")
                    for i in range(b * (N_MINHASH // N_BANDS), (b + 1) * (N_MINHASH // N_BANDS))
                ],
            )
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    # melt carries ONLY (doc_id, band_id, band_key) — 3 narrow columns.
    # The r1 version kept the full shingle arrays as join payload, so
    # document content shuffled 4× and rode the self-join (its slowest
    # query). Minhashes come from the explode+agg shape (_minhash_agg:
    # shingles built exactly once); the banded table is materialized so
    # the self-join's two sides don't recompute it (at cluster scale: a
    # persisted intermediate); the verify step recomputes shingles ONLY
    # for candidate docs (semi-join pushdown).
    banded = (
        _minhash_agg(docs, n=n, seed_prefix=seed_prefix)
        .select("doc_id", *band_cols)
        .localCheckpoint(eager=True)
    )
    melted = banded.select(
        "doc_id",
        F.explode(F.array(*[F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_key")) for b in range(N_BANDS)])).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.band_key")
    left = melted.alias("l")
    right = melted.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint(eager=True)  # read twice below (cand-doc set + joins)
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # checkpointed: sh_cand feeds BOTH verify joins (sh_a and sh_b)
    # and Catalyst has no cross-branch subtree CSE, so without the
    # barrier the candidate-doc shingle regex ran twice (r6)
    sh_cand = (
        docs.join(cand_docs, "doc_id", "left_semi")
        .select("doc_id", sh.alias("sh"))
        .localCheckpoint(eager=True)
    )
    cand = (
        cand.join(sh_cand.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh_cand.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    # native array_intersect (codegen, hash-set build) — NOT the
    # filter(array_contains) HOF: higher-order functions run
    # interpreted and that shape is O(|a|·|b|) per pair. Shingle
    # arrays are distinct by construction, so |intersect| is the
    # true overlap count.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-dups over word 3-gram shingles."""
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    return _lsh_jaccard_pairs(docs, n=SHINGLE, threshold=threshold)


def _band_key_sql(b: int, seed_prefix: str = "") -> str:
    rows = range(b * (N_MINHASH // N_BANDS), (b + 1) * (N_MINHASH // N_BANDS))
    concat = " || ".join(
        f"list_aggregate(list_transform(sh, x -> md5('{seed_prefix}{i}:' || x)), 'min')"
        for i in rows
    )
    return f"md5('{seed_prefix}band{b}:' || {concat})"


def _lsh_sql(n: int, threshold: float, seed_prefix: str = "") -> str:
    """DuckDB twin of _lsh_jaccard_pairs, parameterized the same way."""
    return f"""
WITH sigs AS (
  SELECT doc_id, sh FROM (
    SELECT doc_id, {_shingles_sql(n)} AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) t1) t2),
melted AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, sh, {b} AS band_id, {_band_key_sql(b, seed_prefix)} AS band_key FROM sigs"
      for b in range(N_BANDS))}),
cand AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
         ANY_VALUE(l.sh) AS sh_a, ANY_VALUE(r.sh) AS sh_b
  FROM melted l JOIN melted r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id)
SELECT doc_a, doc_b,
       round(len(list_filter(sh_a, x -> list_contains(sh_b, x)))
             / (len(sh_a) + len(sh_b)
                - len(list_filter(sh_a, x -> list_contains(sh_b, x)))), 6) AS jaccard
FROM cand
WHERE round(len(list_filter(sh_a, x -> list_contains(sh_b, x)))
            / (len(sh_a) + len(sh_b)
               - len(list_filter(sh_a, x -> list_contains(sh_b, x)))), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


MINHASH_LSH_SQL = _lsh_sql(SHINGLE, 0.5)

N_SIMHASH_BITS = 16


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash, groupBy-sum shaped.

    explode distinct tokens → per-bit ±1 contributions from md5 hex
    digits → one groupBy(doc_id) with 16 sums (map-side combine) →
    sign-assemble. Scales as a single shuffle keyed on doc_id.
    """
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    contribs = []
    for b in range(N_SIMHASH_BITS):
        digit = F.conv(F.substring("h", 1 + b // 4, 1), 16, 10).cast("int")
        bit = F.shiftright(digit, b % 4).bitwiseAND(F.lit(1))
        contribs.append(F.sum(bit * 2 - 1).alias(f"c{b}"))
    agg = toks.groupBy("doc_id").agg(*contribs)
    sh = None
    for b in range(N_SIMHASH_BITS):
        term = F.when(F.col(f"c{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return agg.select("doc_id", sh.cast("long").alias("simhash")).orderBy("doc_id")


def _simhash_bit_sql(b: int) -> str:
    return (
        f"SUM(((CAST('0x' || substr(h, {1 + b // 4}, 1) AS INTEGER) >> {b % 4}) & 1) * 2 - 1)"
        f" AS c{b}"
    )


SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, md5(tok) AS h FROM (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
    FROM documents) t),
agg AS (
  SELECT doc_id, {", ".join(_simhash_bit_sql(b) for b in range(N_SIMHASH_BITS))}
  FROM toks GROUP BY doc_id)
SELECT doc_id,
       CAST({" + ".join(f"CASE WHEN c{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(N_SIMHASH_BITS))}
            AS BIGINT) AS simhash
FROM agg ORDER BY doc_id
"""


CONTAM_NGRAM = 8  # word 8-grams — the standard decontamination width
BENCH_MOD = 20  # synthetic held-out "benchmark": docs with doc_id % 20 == 0


def contamination_check_df(
    docs: DataFrame, n: int = CONTAM_NGRAM, mod: int = BENCH_MOD
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``n``-gram with a held-out benchmark set (here the
    deterministic ``doc_id % mod == 0`` subset — real pipelines
    substitute the eval-suite text).

    Per non-benchmark doc: distinct-gram count, benchmark-hit count,
    contamination fraction, and a ``contaminated`` flag (any hit —
    the conservative decontamination rule).

    At 100 TB: the benchmark gram set is small BY CONSTRUCTION
    (benchmarks are MBs of text against TBs of corpus), so it is
    broadcast — the probe join never shuffles the corpus. Grams are
    md5-hashed before moving (16-byte digests, never gram text), and
    the per-doc rollup is one map-side-combining groupBy(doc_id).
    For a benchmark set too big to broadcast, drop the hint and the
    same plan becomes a shuffle hash join — semantics unchanged.
    """
    bench_cond = F.col("doc_id") % mod == 0
    hashed = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), n=n)).alias("g")
    ).select("doc_id", F.md5("g").alias("h"))
    bench_set = hashed.filter(bench_cond).select("h").distinct()
    corpus = hashed.filter(~bench_cond)
    joined = corpus.join(
        F.broadcast(bench_set.withColumn("is_hit", F.lit(1))), "h", "left"
    )
    agg = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("is_hit"), F.lit(0))).alias("n_hits"),
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return (
        docs.filter(~bench_cond)
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_hits.alias("n_hits"),
            # portable HALF_UP at 6dp (floor(x*1e6+0.5)/1e6): ratios of
            # small ints can land ON a 6dp tie where Spark round() and
            # DuckDB round() disagree — see repetition_score_df
            F.when(n_grams > 0, F.floor(n_hits / n_grams * 1e6 + F.lit(0.5)) / 1e6)
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
            (n_hits > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return contamination_check_df(docs)


def _contamination_sql(n: int = CONTAM_NGRAM, mod: int = BENCH_MOD) -> str:
    """DuckDB twin of contamination_check_df (same grams, same hash,
    same zero-gram COALESCE contract)."""
    return f"""
WITH s0 AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
g AS (SELECT doc_id, md5(gr) AS h FROM
      (SELECT doc_id, unnest({_shingles_sql(n)}) AS gr FROM s0) t),
bench AS (SELECT DISTINCT h FROM g WHERE doc_id % {mod} = 0),
cg AS (SELECT doc_id,
              CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END AS is_hit
       FROM g WHERE doc_id % {mod} <> 0),
a AS (SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(is_hit) AS BIGINT) AS n_hits
      FROM cg GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN COALESCE(a.n_grams, 0) > 0
            THEN floor(COALESCE(a.n_hits, 0) / a.n_grams * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS contam_frac,
       COALESCE(a.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0) d
LEFT JOIN a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


CONTAMINATION_SQL = _contamination_sql()


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected edge list — the step a
    dedup pipeline needs BETWEEN near-dup pairs and "keep one copy":
    LSH emits pairs, but a duplicate GROUP is the transitive closure
    of those pairs, and the canonical survivor must be picked per
    group, not per pair (A~B, B~C must keep exactly one of {A,B,C}).

    Hash-min label propagation WITH pointer jumping: every node starts
    labeled with its own id; each round it takes the min label across
    itself and its neighbors, then follows its label's label
    (shortcutting — the label always names a node in the same
    component, so jumping stays correct and monotone). The jump
    squares the propagation distance per round: a path-graph chain —
    the adversarial worst case for plain hash-min, which needs
    O(diameter) rounds — converges in O(log diameter). Fixpoint ⇔
    every node carries the min node id of its component.

    Pure DataFrame ops per round: one shuffle hash join
    (edges ⋈ labels on node id), one map-side-combining groupBy(min),
    one labels self-join for the jump; labels localCheckpoint'ed each
    round so lineage never grows (the wave-loop discipline).

    Convergence detection is O(1) driver-side: labels are monotone
    non-increasing, so sum(label) is stationary exactly at the
    fixpoint — one scalar agg per round, no change-count join.

    Scale: near-dup clusters are tiny-diameter by construction
    (members pairwise-similar ⇒ dense), so dedup graphs converge in
    2-3 rounds at any data size; the log-diameter bound means even a
    pathological 10^7-link chain fits in ``max_iter=25``. If a graph
    still trips it we raise loudly rather than return a half-merged
    labeling (the keep-rule would silently keep extra copies).
    """
    e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    # pre-partitioned on src (the per-round join key) before the
    # one-time checkpoint, so each round's labels⋈sym join sheds the
    # edge-side exchange (r6, the pagerank_frame trick)
    n_shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(n_shuf, F.col("src"))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum: object = object()  # sentinel ≠ any sum (incl. None on empty input)
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "component"
        )
        merged = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: component → that node's own (≤) component.
        # Every label IS a node id, so the inner equi-join always hits.
        jumps = merged.select(
            F.col("id").alias("component"), F.col("component").alias("jump")
        )
        # decimal sum: an int64 sum could wrap at 10^10-node scale and
        # (theoretically) alias two different label states; decimal(38)
        # holds sum(10^10 ids < 10^19) exactly. r6: the sum rides an
        # Observation on the round's own checkpoint job (the
        # hits_scores trick) — one job per round instead of two.
        from pyspark.sql import Observation

        obs = Observation()
        labels = (
            merged.join(jumps, "component")
            .select("id", F.col("jump").alias("component"))
            .observe(obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)
        )
        total = obs.get["s"]
        if total == prev_sum:
            return labels
        prev_sum = total
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: LSH pairs → transitive closure →
    (doc_id, cluster_id = min doc_id in cluster, is_canonical).
    Every doc that collided with ANY near-dup appears exactly once;
    the dedup "keep" rule is ``is_canonical`` (min-id survivor per
    cluster — deterministic, no tie-break needed)."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    comp = connected_components(pairs, a="doc_a", b="doc_b")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    ).orderBy("doc_id")


# DuckDB twin: the same transitive closure as a recursive CTE — reach
# propagates node ids along symmetric edges until closure; min reached
# id per node = the component's min node id (what hash-min converges
# to). Only viable at oracle scale, which is the point of an oracle.
NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_SQL}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
reach(id, r) AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.b AS id, reach.r AS r FROM reach JOIN edges e ON e.a = reach.id)
SELECT id AS doc_id,
       CAST(MIN(r) AS BIGINT) AS cluster_id,
       MIN(r) = id AS is_canonical
FROM reach GROUP BY id ORDER BY doc_id
"""


N_RUNGRAM = 8  # word 8-grams — the duplicate-run probe width
MIN_RUN_TOKENS = 15  # report runs of ≥15 shared consecutive tokens
MAX_GRAM_DF = 16  # grams in more docs than this are boilerplate — dropped


def duplicate_runs_df(
    docs: DataFrame,
    n: int = N_RUNGRAM,
    min_run: int = MIN_RUN_TOKENS,
    max_df: int = MAX_GRAM_DF,
) -> DataFrame:
    """Exact substring dedup (the suffix-array style of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally): for every doc pair sharing a verbatim
    run of ≥ ``min_run`` consecutive tokens, report the longest run
    and the run count.

    Shape — no suffix array needed, runs fall out of join diagonals:

    1. positional word ``n``-grams per doc (ONE codegen regex pass —
       the same lookahead trick as ``_shingles``, but posexploded so
       each gram keeps its token offset), hashed to md5 before any
       shuffle (16-byte digests move, text never does);
    2. **df band-pass [2, max_df]**: a gram in one doc can't witness a
       cross-doc run (the bulk of all grams — pruned BEFORE the
       self-join), and a gram in > ``max_df`` docs is boilerplate
       whose bucket would go quadratic (the hot-key guard; real
       pipelines drop over-represented substrings for the same
       reason). One shuffle on the digest.
    3. bucket self-join on the digest (doc_a < doc_b) → match points
       (pos_a, pos_b); consecutive matching grams share a join
       **diagonal** (pos_a − pos_b), so a shared k-token run is a
       gapless island of k−n+1 points on one diagonal;
    4. gaps-and-islands per (doc_a, doc_b, diagonal): island id =
       pos_a − row_number(order by pos_a) — window keys are
       per-pair-per-diagonal, so no mega-partition at any corpus
       size; run_tokens = island size + n − 1.

    At 100 TB every shuffle payload is (digest, doc_id, pos); the df
    band-pass caps bucket width at ``max_df`` so the join output is
    ≤ C(max_df,2) rows per shared gram — linear in corpus size, never
    the n² of all-pairs.
    """
    pat = gram_pattern(n)
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.coalesce(
                F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(1)),
                F.array().cast("array<string>"),
            )
        ).alias("pos", "g"),
    ).select("doc_id", "pos", F.md5("g").alias("h"))
    # checkpointed: grams feeds the df band-pass AND the probe side of
    # the semi-join below — without the barrier the gram regex + md5
    # pass over the corpus executed twice (r6; the shuffle payload is
    # (16-byte digest, doc_id, pos) — text never moves)
    grams = grams.localCheckpoint(eager=True)
    eligible = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("gdf"))
        .filter((F.col("gdf") >= 2) & (F.col("gdf") <= max_df))
        .select("h")
    )
    shared = grams.join(eligible, "h", "left_semi").localCheckpoint(eager=True)
    a, b = shared.alias("a"), shared.alias("b")
    m = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = (
        m.withColumn("island", F.col("pos_a") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg((F.count("*") + F.lit(n - 1)).alias("run_tokens"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run_tokens").alias("max_run_tokens"),
            F.count("*").alias("n_runs"),
        )
        .filter(F.col("max_run_tokens") >= min_run)
        .orderBy("doc_a", "doc_b")
    )


def duplicate_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    return duplicate_runs_df(docs)


def _duplicate_runs_sql(
    n: int = N_RUNGRAM, min_run: int = MIN_RUN_TOKENS, max_df: int = MAX_GRAM_DF
) -> str:
    """DuckDB twin of duplicate_runs_df (same grams, same df band-pass,
    same diagonal-island arithmetic)."""
    gram = " || ' ' || ".join(f"s[i + {j + 1}]" for j in range(n))
    return f"""
WITH s0 AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
g AS (SELECT doc_id, i AS pos, md5({gram}) AS h
      FROM s0, unnest(range(0, len(s) - {n - 1})) t(i)),
eligible AS (SELECT h FROM g GROUP BY h
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {max_df}),
shared AS (SELECT * FROM g WHERE h IN (SELECT h FROM eligible)),
m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
             a.pos - b.pos AS diag
      FROM shared a JOIN shared b ON a.h = b.h AND a.doc_id < b.doc_id),
isl AS (SELECT doc_a, doc_b, diag,
               pos_a - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
        FROM m),
runs AS (SELECT doc_a, doc_b, COUNT(*) + {n - 1} AS run_tokens
         FROM isl GROUP BY doc_a, doc_b, diag, island)
SELECT doc_a, doc_b,
       CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens,
       COUNT(*) AS n_runs
FROM runs GROUP BY doc_a, doc_b
HAVING MAX(run_tokens) >= {min_run}
ORDER BY doc_a, doc_b
"""


DUPLICATE_RUNS_SQL = _duplicate_runs_sql()


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.3) -> DataFrame:
    """Word-bigram Jaccard near-dups through the SAME banded LSH
    candidate generator as minhash_lsh_pairs (independent seed space,
    lower verify threshold — bigrams admit looser matches than
    3-gram shingles). The r2 version verified Jaccard arithmetic on an
    artificial (doc i, doc i+1) pairing; candidates now come from
    bucket collisions, the shape that scales (never n²)."""
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    return _lsh_jaccard_pairs(docs, n=2, threshold=threshold, seed_prefix="ng")


NGRAM_JACCARD_SQL = _lsh_sql(2, 0.3, seed_prefix="ng")


# --------------------------------------------------------------------------
# Winnowing fingerprints — guaranteed-detection local fingerprinting
# --------------------------------------------------------------------------

WIN_K = 4  # tokens per k-gram
WIN_W = 4  # winnowing window (selection guarantee: runs >= W+K-1 = 7)
WIN_MIN_SHARED = 2  # pairs must share >= this many fingerprints
WIN_MAX_DF = 16  # stop-gram guard: drop hashes in more docs (hot keys)
_POS_BITS = 20  # key = h40 * 2^20 + pos (lexicographic (h, pos) min)


def winnowing_fps(docs: DataFrame) -> DataFrame:
    """Per-doc winnowing fingerprint set (Schleimer, Wilkerson &
    Aiken 2003, MOSS): hash every overlapping K-token gram, slide a
    W-wide window over the hash sequence and keep each window's
    minimum — ties broken leftmost via a packed (hash, pos) key. Any
    token run of length >= W+K-1 shared by two documents is
    GUARANTEED to share a selected gram hash — the deterministic
    complement to minhash-LSH's probabilistic recall.

    Portability: the gram hash is the md5-derived 40-bit int (the
    HLL/CMS convention — identical in Spark conv() and DuckDB
    CAST('0x'||...)); packing pos into the low 20 bits makes the
    window MIN itself the leftmost-min arg-selection, one window
    function, no arg_min (DuckDB's lacks a composite key). Docs with
    more than 2^20 grams fail loudly rather than mis-order.

    Scale shape: one codegen regex pass emits the gram stream; the
    only exchange is the doc_id window partitioning (map-side nothing
    to combine, but the stream is (doc, pos, 8-byte key) — never
    text); selection + distinct happen inside that partitioning."""
    grams = F.regexp_extract_all(
        F.col("text"), F.lit(gram_pattern(WIN_K)), F.lit(1)
    )
    g = docs.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).select(
        "doc_id",
        "pos",
        F.expr(
            f"conv(substring(md5(gram), 1, 10), 16, 10)"
        ).cast("bigint").alias("h40"),
    )
    key = F.expr(
        f"h40 * {1 << _POS_BITS} + if(pos < {1 << _POS_BITS}, pos,"
        f" raise_error('winnowing: doc exceeds 2^{_POS_BITS} grams'))"
    )
    from pyspark.sql import Window

    wsel = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WIN_W - 1), 0)
    )
    wdoc = Window.partitionBy("doc_id")
    sel = (
        g.select(
            "doc_id",
            "pos",
            F.min(key).over(wsel).alias("selkey"),
            F.count("*").over(wdoc).alias("n_grams"),
        )
        # valid window ends; short docs keep their last (full-prefix)
        # window so a < W-gram doc still fingerprints
        .filter(
            (F.col("pos") >= WIN_W - 1) | (F.col("pos") == F.col("n_grams") - 1)
        )
        .select(
            "doc_id", F.expr(f"selkey DIV {1 << _POS_BITS}").alias("h40")
        )
        .distinct()
    )
    return sel


def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= WIN_MIN_SHARED winnowing
    fingerprints. Candidate generation is the fingerprint equi-join —
    bounded per hash by the WIN_MAX_DF stop-gram guard (a boilerplate
    gram shared by hundreds of docs is evidence of nothing and would
    otherwise be a quadratic hot key — the duplicate_runs band-pass
    convention), so the join never goes n²."""
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    # checkpointed: fps feeds the df guard AND both sides of the pair
    # join — without the barrier the gram regex + window selection ran
    # up to three times (r6)
    fps = winnowing_fps(docs).localCheckpoint(eager=True)
    df_h = fps.groupBy("h40").agg(F.count("*").cast("bigint").alias("df"))
    fps = fps.join(
        df_h.filter((F.col("df") >= 2) & (F.col("df") <= WIN_MAX_DF)), "h40"
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "h40")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= WIN_MIN_SHARED)
        .orderBy(F.col("n_shared").desc(), "doc_a", "doc_b")
    )


def _winnowing_sql() -> str:
    parts = " || ' ' || ".join(f"s[i + {j + 1}]" for j in range(WIN_K))
    p = 1 << _POS_BITS
    return f"""
WITH gl AS (
  SELECT doc_id,
         list_transform(range(0, len(s) - {WIN_K - 1}), i -> {parts}) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)),
gr AS (
  SELECT doc_id, unnest(range(0, len(g))) AS pos, unnest(g) AS gram FROM gl),
keyed AS (
  SELECT doc_id, pos,
         CAST('0x' || substr(md5(gram), 1, 10) AS BIGINT) * {p}
           + CASE WHEN pos < {p} THEN pos ELSE error('winnowing overflow') END
           AS key
  FROM gr),
win AS (
  SELECT doc_id, pos,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {WIN_W - 1} PRECEDING AND CURRENT ROW)
           AS selkey,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM keyed),
fps AS (
  SELECT DISTINCT doc_id, selkey // {p} AS h40
  FROM win WHERE pos >= {WIN_W - 1} OR pos = n_grams - 1),
kept AS (
  SELECT f.doc_id, f.h40 FROM fps f JOIN (
      SELECT h40 FROM fps GROUP BY h40
      HAVING COUNT(*) BETWEEN 2 AND {WIN_MAX_DF}) d USING (h40))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h40 = b.h40 AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {WIN_MIN_SHARED}
ORDER BY n_shared DESC, doc_a, doc_b
"""


WINNOWING_PAIRS_SQL = _winnowing_sql()


QUERIES = {
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash": simhash,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "contamination_check": contamination_check,
    "neardup_clusters": neardup_clusters,
    "duplicate_runs": duplicate_runs,
    "winnowing_pairs": winnowing_pairs,
}

ORACLES = {
    "minhash_signatures": MINHASH_SIG_SQL,
    "minhash_lsh_pairs": MINHASH_LSH_SQL,
    "simhash": SIMHASH_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "contamination_check": CONTAMINATION_SQL,
    "neardup_clusters": NEARDUP_CLUSTERS_SQL,
    "duplicate_runs": DUPLICATE_RUNS_SQL,
    "winnowing_pairs": WINNOWING_PAIRS_SQL,
}
