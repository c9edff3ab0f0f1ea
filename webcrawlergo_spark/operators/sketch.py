"""Distributed cardinality sketch — HyperLogLog with md5-derived
hashing, reproducible bit-for-bit across Spark, DuckDB and Python.

The 100 TB primitive behind "how many distinct canonical URLs /
users / shingles do we have": exact countDistinct shuffles every
distinct key; the HLL register table is 1024 small ints TOTAL,
partial-aggregates map-side (per-partition register max), and merges
with a per-register max — the shuffle is ≤ 1024 rows per partition
no matter the corpus size. Spark ships this as
``approx_count_distinct``; it is reimplemented here relationally so
(a) the sketch itself is an inspectable DataFrame an engine user can
checkpoint/merge incrementally, and (b) the whole computation is
deterministic and oracle-checkable — no RNG, no implementation-
defined hash:

- hash: first 15 hex digits of md5(value-as-string) → a 60-bit int
  (identical in Spark ``conv``, DuckDB ``CAST('0x'||…)``, Python
  ``int(…,16)``);
- register index = top 10 bits (m=1024), rho = leading zeros of the
  50-bit suffix + 1 (via ``length(bin(w))`` — string length of the
  binary rendering, exact in both engines; never floating log2);
- the harmonic sum is kept INTEGER: Σ 2^(51−M_j) as a BIGINT
  (≤ 1024·2^51 < 2^63), because a float Σ 2^−M_j is order-dependent
  under parallel aggregation — division by 2^51 happens once, at the
  end, as a single deterministic double op;
- small-range correction (linear counting m·ln(m/V) when the raw
  estimate ≤ 2.5m and zero registers exist) matches Flajolet et al.
  2007; the large-range correction is omitted — a 60-bit hash space
  makes collisions negligible below ~2^29 distinct keys and the
  fixture exercises both live branches.

Standard error at m=1024 is 1.04/√1024 ≈ 3.3%; the unit test pins
the shipped estimates against a pure-Python golden EXACTLY and
against the true counts at a 12% ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
W_BITS = 50  # 60-bit hash = 10 index bits + 50 rho bits
RHO_MAX = W_BITS + 1

# every literal in e0 form: a bare `0.7213` parses as DECIMAL in
# Spark SQL (and decimal division truncates — ~430 ulps off at sf0.1)
# while `0.7213e0` is DOUBLE in both Spark and DuckDB, keeping the
# whole estimate inside exactly-specified IEEE ops
_RAW_EST = (
    "(0.7213e0 / (1.0e0 + 1.079e0 / 1024.0e0)) * 1048576.0e0 * 2251799813685248.0e0"
    " / CAST(s_scaled AS DOUBLE)"
)
_EST = (
    "CASE WHEN raw <= 2560.0e0 AND zero_registers > 0"
    " THEN 1024.0e0 * ln(1024.0e0 / CAST(zero_registers AS DOUBLE))"
    " ELSE raw END"
)


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The sketch itself: (idx, m_reg) with idx ∈ [0, 1024), one row
    per non-zero register. Mergeable: union two sketches and
    groupBy(idx).max(m_reg) — the incremental-maintenance shape."""
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("h"))
        .select(
            F.shiftrightunsigned("h", W_BITS).alias("idx"),
            F.col("h").bitwiseAND(F.lit((1 << W_BITS) - 1)).alias("w"),
        )
        .select(
            "idx",
            F.when(F.col("w") == 0, F.lit(RHO_MAX))
            .otherwise(F.lit(RHO_MAX) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("idx")
        .agg(F.max("rho").alias("m_reg"))
    )


def hll_estimate_frame(df: DataFrame, col: str, name: str) -> DataFrame:
    """1-row frame: (col_name, n_exact, hll_est_6, zero_registers).
    n_exact is the exact countDistinct — shipped alongside so the
    oracle row doubles as an accuracy record."""
    regs = hll_registers(df, col)
    s = regs.agg(
        (F.lit(HLL_M) - F.count("*")).cast("bigint").alias("zero_registers"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_MAX} - m_reg)")),
            F.lit(0).cast("bigint"),
        ).alias("s_present"),
    )
    exact = df.filter(F.col(col).isNotNull()).agg(
        F.countDistinct(col).cast("bigint").alias("n_exact")
    )
    return (
        s.crossJoin(exact)
        .withColumn(
            "s_scaled",
            F.col("s_present")
            + F.col("zero_registers") * F.lit(1 << RHO_MAX).cast("bigint"),
        )
        .withColumn("raw", F.expr(_RAW_EST))
        .withColumn("est", F.expr(_EST))
        .select(
            F.lit(name).alias("col_name"),
            "n_exact",
            (F.floor(F.col("est") * 1e6 + F.lit(0.5)) / 1e6).alias("hll_est_6"),
            "zero_registers",
        )
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketch over two live columns of the events stream:
    user_id (small set → exercises the linear-counting branch at low
    sf) and event_id (large set → the raw harmonic-mean branch)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        hll_estimate_frame(ev, "user_id", "user_id")
        .unionByName(hll_estimate_frame(ev, "event_id", "event_id"))
        .orderBy("col_name")
    )


def _hll_sql_one(table: str, col: str, name: str) -> str:
    return f"""
SELECT '{name}' AS col_name, e.n_exact,
       floor({_EST.replace("raw", "s.raw").replace("zero_registers", "s.zero_registers")} * 1e6 + 0.5) / 1e6 AS hll_est_6,
       s.zero_registers
FROM (
  SELECT zero_registers, {_RAW_EST} AS raw
  FROM (
    SELECT CAST(1024 - COUNT(*) AS BIGINT) AS zero_registers,
           COALESCE(CAST(SUM(CAST(1 AS BIGINT) << (51 - m_reg)) AS BIGINT), 0)
             + (1024 - COUNT(*)) * 2251799813685248 AS s_scaled
    FROM (
      SELECT idx, MAX(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS m_reg
      FROM (
        SELECT h >> 50 AS idx, h & 1125899906842623 AS w
        FROM (SELECT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
              FROM {table} WHERE {col} IS NOT NULL)
      ) GROUP BY idx
    )
  )
) s, (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_exact
      FROM {table} WHERE {col} IS NOT NULL) e
"""


HLL_DISTINCT_SQL = (
    "SELECT * FROM (" + _hll_sql_one("events", "user_id", "user_id") + ")"
    " UNION ALL SELECT * FROM ("
    + _hll_sql_one("events", "event_id", "event_id")
    + ") ORDER BY col_name"
)


# --------------------------------------------------------------------------
# Count-min sketch — bounded-memory frequency estimation / heavy hitters
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row — deliberately < vocabulary so collisions
#             are real and min-over-rows provably earns its keep
CMS_PHI_DEN = 64  # heavy hitter ⇔ cms_est ≥ N DIV 64

# md5-derived row hashes (the HLL/LSH convention): row r, key t →
# first 8 hex digits of md5('r:t') mod W — identical in Spark conv(),
# DuckDB CAST('0x'||…), and Python int(…, 16).


def _cms_bucket(r, tok):
    """Bucket of key ``tok`` under row ``r`` (both columns)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(r.cast("string"), F.lit(":"), tok)), 1, 8
        ),
        16,
        10,
    )
    return (h.cast("bigint") % CMS_W).cast("bigint")


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """The sketch itself: (r, b, cnt) with ≤ D·W rows TOTAL no matter
    the stream size. groupBy partial-aggregates map-side, so the
    shuffle carries ≤ D·W rows per input partition — the
    bounded-memory counter for a 10^10-token stream (Cormode &
    Muthukrishnan 2005). Mergeable: union two sketches and
    groupBy(r, b).sum(cnt) — the incremental/windowed shape."""
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"),
        F.col(col).alias("t"),
    )
    return (
        rows.select("r", _cms_bucket(F.col("r"), F.col("t")).alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter vocabulary tokens over the document corpus via a
    count-min sketch: build the D×W sketch, probe each candidate
    token's D buckets, estimate = min over rows, keep tokens whose
    estimate ≥ N/64. The exact count ships alongside so the row
    doubles as the accuracy record (est ≥ exact always; equality
    unless all D buckets collided) — the hll_distinct convention.

    Scale shape: the sketch is ≤256 rows (broadcast side of the
    probe join); the candidate frame is the per-token exact groupBy —
    at 10^10 tokens the candidate set would itself be pre-filtered by
    a per-partition local top-k, but the probe plan (broadcast sketch
    + min-over-rows agg) is unchanged."""
    from webcrawlergo_spark.sources.tpch import spread_scan

    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    # ONE corpus pass: aggregate the token stream to the vocabulary
    # first (map-side combine), then derive the sketch, the probes AND
    # the stream total from that small frame (guide §2.3 "aggregate
    # before you shuffle"). The sketch bucket count over occurrences
    # equals the sum of per-token exact counts grouped by bucket —
    # integer arithmetic, bit-identical — so md5 runs once per
    # (row, vocab entry) instead of once per (row, token OCCURRENCE),
    # and the corpus explode executes once instead of three times
    # (sketch / candidates / total were three separate scans in r5:
    # 12.9 s warm at sf1.0, almost all of it the triple explode+md5).
    cand = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
        .localCheckpoint(eager=True)  # vocabulary-sized; scanned 3×
    )
    rows = cand.select(
        "tok",
        "n_exact",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"),
    ).withColumn("b", _cms_bucket(F.col("r"), F.col("tok")))
    sketch = rows.groupBy("r", "b").agg(F.sum("n_exact").cast("bigint").alias("cnt"))
    est = (
        rows.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("tok", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
    )
    total = cand.agg(F.sum("n_exact").cast("bigint").alias("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("cms_est") >= F.expr(f"n_total DIV {CMS_PHI_DEN}"))
        .select("tok", "n_exact", "cms_est")
        .orderBy("tok")
    )


_CMS_B_SQL = (
    "CAST('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || {t}), 1, 8) AS BIGINT) % 64"
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
rws AS (SELECT unnest(range(0, {CMS_D})) AS r),
sk AS (
  SELECT r, {_CMS_B_SQL.format(r="r", t="tok")} AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN rws GROUP BY 1, 2),
cand AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY tok),
probe AS (
  SELECT c.tok, c.n_exact, MIN(sk.cnt) AS cms_est
  FROM cand c CROSS JOIN rws
  JOIN sk ON sk.r = rws.r
         AND sk.b = {_CMS_B_SQL.format(r="rws.r", t="c.tok")}
  GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
SELECT tok, n_exact, CAST(cms_est AS BIGINT) AS cms_est
FROM probe, tot WHERE cms_est >= n_total // {CMS_PHI_DEN}
ORDER BY tok
"""


QUERIES = {"hll_distinct": hll_distinct, "cms_heavy_hitters": cms_heavy_hitters}
ORACLES = {
    "hll_distinct": HLL_DISTINCT_SQL,
    "cms_heavy_hitters": CMS_HEAVY_HITTERS_SQL,
}
