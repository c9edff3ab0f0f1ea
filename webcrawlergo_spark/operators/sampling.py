"""Training-data sampling / mixing operators.

What a pretraining-data pipeline does between dedup and tokenization:
pick HOW MUCH of each stratum to keep and WHICH rows, deterministically
(a re-run must emit the same sample — no rand()). All built-in column
functions; each op ships a DuckDB oracle twin.

- salted_topk_per_group: the scale-shaped top-K-per-group primitive —
  a plain ``row_number() OVER (PARTITION BY group)`` serializes a
  mega-stratum into one task (a real corpus is 90% one language), so
  phase 1 ranks within (group, salt) — n_salt-way parallel per group —
  and keeps each salt's top-K (a superset of the true top-K); phase 2
  ranks the ≤ n_salt·K survivors exactly. Identical selection, bounded
  partitions. Same pattern as the crawl's politeness cap
  (plans/wave.py), exposed as a reusable operator.
- stratified_sample: K docs per language, chosen by a uniform
  deterministic hash (md5 of the doc id) — "hash sampling", the
  standard reproducible substitute for bernoulli sampling.
- domain_mix_weights: per-source corpus share and temperature-scaled
  mixing weight share^T / Σ share^T. T=0.5 so the scaling is sqrt():
  sqrt is IEEE correctly rounded in BOTH engines, where pow() is only
  1-ulp accurate (JVM Math.pow vs libm) — a 1-ulp divergence can flip
  round(x, 6) at a 5e-7 boundary and fail the type-exact oracle hash.
  The repo's portability rule: oracle formulas stick to md5, integer
  math, division and sqrt.
- user_event_seq: per-key event sequence via the DISTRIBUTED rank
  (plans/rank.py::with_host_seq — range partition + prefix-sum
  offsets, no per-key single task), oracle-checked against
  ROW_NUMBER() so the machinery itself sits under the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.rank import with_host_seq

SAMPLE_K = 40      # docs kept per language stratum
MIX_TEMP = 0.5     # domain-balancing temperature (sqrt — see note below)
N_SALT = 16


def salted_topk_split(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rk",
    n_salt: int = N_SALT,
    salt_on=None,
) -> tuple[DataFrame, DataFrame]:
    """(top, overflow): exact top-K per group without a per-group
    single-task window, plus ALL remaining rows (unranked, original
    columns) — the shape the crawl's politeness cap consumes (top =
    this wave's batch, overflow = deferred to the next wave).

    ``salt_on`` is the column whose hash spreads a group's rows over
    salts (defaults to the first order column). Phase-1 keeps ≤ K per
    (group, salt) — a superset of the group's true top-K because
    dropping a row ranked > K within its own salt can never promote
    it globally; phase-2 ranks the bounded survivor set exactly. A
    mega-group (25% of the crawl bench's frontier is one host) ranks
    n_salt-way parallel in phase 1; phase 2 sees ≤ n_salt·K rows per
    group.
    """
    salt_src = salt_on if salt_on is not None else order_cols[0]
    order = [c if not isinstance(c, str) else F.col(c) for c in order_cols]
    pre = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salt)).cast("int"))
    w_salt = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    pre = pre.withColumn("_lrk", F.row_number().over(w_salt))
    cands = pre.filter(F.col("_lrk") <= k)
    w_group = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = cands.withColumn(rank_col, F.row_number().over(w_group))
    top = ranked.filter(F.col(rank_col) <= k).drop("_salt", "_lrk")
    overflow = (
        pre.filter(F.col("_lrk") > k)
        .drop("_salt", "_lrk")
        .unionByName(ranked.filter(F.col(rank_col) > k).drop("_salt", "_lrk", rank_col))
    )
    return top, overflow


def salted_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rk",
    n_salt: int = N_SALT,
    salt_on=None,
) -> DataFrame:
    """The keep-only-top-K view of salted_topk_split (ranked rows)."""
    top, _ = salted_topk_split(df, group_cols, order_cols, k, rank_col, n_salt, salt_on)
    return top


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K docs per language by deterministic hash order (md5(doc_id)):
    an unbiased, reproducible stratified sample — rerank-stable under
    re-execution and appends of non-sampled rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    out = salted_topk_per_group(
        docs, ["lang"], [F.col("h"), F.col("doc_id")], SAMPLE_K, salt_on=F.col("doc_id")
    )
    return out.select("lang", "doc_id", "rk").orderBy("lang", "rk")


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) t
WHERE rk <= {SAMPLE_K}
ORDER BY lang, rk
"""


def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus share + temperature-scaled mixing weight
    w_s = share_s^T / Σ share^T. The unpartitioned windows run over
    the AGGREGATED frame — #sources rows, never the corpus — so the
    single-partition stage is a few rows by construction."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.col("n_docs") / F.sum("n_docs").over(w_all)
    scaled = F.sqrt(share)  # share^MIX_TEMP with MIX_TEMP=0.5, correctly rounded
    return counts.select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round(scaled / F.sum(scaled).over(w_all), 6).alias("mix_weight"),
    ).orderBy("source")


DOMAIN_MIX_SQL = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
s AS (
  SELECT source, n_docs,
         n_docs / CAST(SUM(n_docs) OVER () AS DOUBLE) AS share
  FROM c),
p AS (
  SELECT source, n_docs, share, sqrt(share) AS sc FROM s)
SELECT source, n_docs, round(share, 6) AS share,
       round(sc / SUM(sc) OVER (), 6) AS mix_weight
FROM p ORDER BY source
"""


def user_event_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequence via the distributed per-key rank
    (plans/rank.py::with_host_seq). n_rows is deliberately NOT passed:
    the range-partition + prefix-sum-offsets path runs even at oracle
    scale, so the driver gate checks the distributed machinery —
    not the small-batch window shortcut — against ROW_NUMBER()."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    out = with_host_seq(ev, "user_id", ["ts", "event_id"], "seq")
    return out.select("user_id", "event_id", "seq").orderBy("user_id", "seq")


USER_EVENT_SEQ_SQL = """
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
ORDER BY user_id, seq
"""


def resample_to_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the temperature mix: downsample every stratum to its
    mix-weight quota — the operator that turns ``domain_mix_weights``
    from a report into a corpus.

    The output size is the largest N with no stratum upsampled:
    N = min_s floor(n_s / w_s); each stratum keeps
    quota_s = floor(N·w_s) docs, chosen by the deterministic hash
    order md5(doc_id) (same reproducible-sample rule as
    stratified_sample — a re-run or a backfill emits the identical
    corpus).

    Strata are LANGUAGES, not sources: the corpus's sources are
    uniform by construction (quota = n_s for every source — a
    vacuous resample), while the language mix is skewed (en ≈ 44%),
    so the operator provably drops rows: sqrt-temperature boosts the
    small languages' weights and the dominant language is cut to its
    quota (en 218 → 117 at sf0.01). Real corpora look like the lang
    axis (90% one language), which is also why the rank is the
    distributed one.

    Scale shape: weights/quotas are #strata rows (broadcast); the
    per-stratum rank is the DISTRIBUTED with_host_seq (range partition
    + prefix-sum offsets — a mega-stratum never serializes into one
    window task); the quota filter is a broadcast-join + codegen
    comparison. One effective shuffle over the corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.col("n_docs") / F.sum("n_docs").over(w_all)
    scaled = F.sqrt(share)
    weights = counts.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(scaled / F.sum(scaled).over(w_all), 6).alias("mw"),
    )
    n_out = weights.agg(
        F.min(F.floor(F.col("n_docs") / F.col("mw"))).cast("long").alias("n_out")
    )
    quota = weights.crossJoin(F.broadcast(n_out)).select(
        "lang", F.floor(F.col("n_out") * F.col("mw")).cast("long").alias("quota")
    )
    ranked = with_host_seq(
        docs.select(
            "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        ),
        "lang",
        ["h", "doc_id"],
        "rk",
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("quota"))
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


RESAMPLE_TO_MIX_SQL = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
s AS (
  SELECT lang, n_docs,
         n_docs / CAST(SUM(n_docs) OVER () AS DOUBLE) AS share
  FROM c),
w AS (
  SELECT lang, n_docs,
         round(sqrt(share) / SUM(sqrt(share)) OVER (), 6) AS mw
  FROM s),
nout AS (SELECT CAST(MIN(floor(n_docs / mw)) AS BIGINT) AS n_out FROM w),
q AS (SELECT lang, CAST(floor(n_out * mw) AS BIGINT) AS quota FROM w, nout),
r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT r.lang, r.doc_id, CAST(r.rk AS BIGINT) AS rk
FROM r JOIN q ON r.lang = q.lang
WHERE r.rk <= q.quota
ORDER BY r.lang, r.rk
"""


WS_K = 20  # sample size
WS_SEED = "ws0"  # hash-domain tag — vary to draw independent samples


def weighted_sample_frame(
    docs, weight_col, k: int = WS_K, seed: str = WS_SEED
):
    """Efraimidis-Spirakis (A-ES) weighted sampling WITHOUT
    replacement, the quality-weighted corpus-selection primitive:
    draw ``k`` docs where inclusion probability tracks the weight.

    A-ES reduces weighted sampling to a plain top-k: key_i =
    u_i^(1/w_i) with u_i uniform; the k largest keys ARE a weighted
    sample without replacement (Efraimidis & Spirakis 2006). Here:

    - u_i is md5-derived (seed-tagged), so the "randomness" is a
      deterministic column — reproducible across engines and re-runs,
      and drawing another independent sample is just another seed
      string (no RNG state to ship);
    - the monotone form ln(u)/w replaces the pow() (one libm call,
      same order statistics);
    - the cut orders by the 6dp floor-rounded key with doc_id
      tiebreak, so a sub-6dp libm ln() divergence cannot reorder it
      (the bm25 convention);
    - the top-k compiles to TakeOrderedAndProject — per-partition
      heaps of k, one k·#partitions driver merge, no global sort.
      The whole plan is a narrow codegen map + top-k: at 10^10 docs
      nothing shuffles but the per-partition winners.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "-"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.log(u) / w
    return (
        docs.select(
            "doc_id",
            w.alias("weight"),
            (F.floor(key * 1e6 + F.lit(0.5)) / 1e6).alias("key_6"),
        )
        .orderBy(F.col("key_6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted A-ES sample of the documents corpus (weight =
    character count — the stand-in for any per-doc quality score)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return weighted_sample_frame(docs, "n_chars")


WEIGHTED_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         greatest(CAST(n_chars AS DOUBLE), 1.0e0) AS weight,
         (CAST(CAST('0x' || substr(md5('{WS_SEED}-' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5e0)
           / 1152921504606846976.0e0 AS u
  FROM documents)
SELECT doc_id, weight,
       floor(ln(u) / weight * 1e6 + 0.5) / 1e6 AS key_6
FROM d ORDER BY key_6 DESC, doc_id ASC LIMIT {WS_K}
"""


QUERIES = {
    "stratified_sample": stratified_sample,
    "domain_mix_weights": domain_mix_weights,
    "user_event_seq": user_event_seq,
    "resample_to_mix": resample_to_mix,
    "weighted_sample_topk": weighted_sample_topk,
}

ORACLES = {
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "domain_mix_weights": DOMAIN_MIX_SQL,
    "user_event_seq": USER_EVENT_SEQ_SQL,
    "resample_to_mix": RESAMPLE_TO_MIX_SQL,
    "weighted_sample_topk": WEIGHTED_SAMPLE_SQL,
}
