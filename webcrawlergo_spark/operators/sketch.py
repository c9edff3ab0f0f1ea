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


QUERIES = {"hll_distinct": hll_distinct}
ORACLES = {"hll_distinct": HLL_DISTINCT_SQL}
