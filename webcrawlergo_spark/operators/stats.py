"""Exact distributed order statistics — percentiles without a global
sort.

`approx_percentile` trades accuracy for one pass; a naive exact
spelling (`ORDER BY value` + pick rows, or `percent_rank` over the
corpus) collapses into a single-partition sort. This operator is
exact AND stays parallel:

1. `groupBy(value).count()` — one shuffle, map-side combine; the
   working set shrinks from rows to DISTINCT values;
2. global inclusive prefix sum of the counts in value order via the
   range-partition recipe (`plans/rank.py::with_running_sum`: 3
   passes, per-partition offsets from a #partitions-sized driver
   cumsum — never `SUM() OVER (ORDER BY ...)`'s single partition);
3. target ranks = ceil(p·N) from a 1-row total (broadcast); the
   answer for p is the unique STRADDLING value — the one whose
   exclusive..inclusive cumulative range contains the target
   (cum − cnt < target ≤ cum). The ≤|pcts|-row broadcast join
   therefore emits exactly one row per percentile (never the
   ~N·(1−p) rows a bare `cum >= target` + min-agg would shuffle).

This is the discrete (type-1 / inverted-CDF) quantile: the returned
value is always an element of the input. At 10^10 rows the plan
moves one counts-shuffle plus a #distinct-values prefix sum; the
percentile list never grows with data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

PCTS = (0.5, 0.95, 0.99)


def _bucket_expr(v, bounds: list[float]):
    """Bucket index of ``v`` under sorted separator ``bounds`` —
    #{i : bounds[i] <= v} — as a BALANCED binary CASE tree
    (log2(#bounds) comparisons per row, whole-stage codegen; a linear
    chain or an array HOF would be interpreted / O(#bounds))."""

    def rec(lo: int, hi: int):
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(v < F.lit(bounds[mid]), rec(lo, mid)).otherwise(rec(mid + 1, hi))

    return rec(0, len(bounds))


def _offset_expr(b, offs: list[int]):
    """offs[b] as a balanced binary CASE tree over the bucket id."""

    def rec(lo: int, hi: int):
        if lo == hi:
            return F.lit(offs[lo])
        mid = (lo + hi) // 2
        return F.when(b <= F.lit(mid), rec(lo, mid)).otherwise(rec(mid + 1, hi))

    return rec(0, len(offs) - 1)


def exact_percentiles_frame(
    df: DataFrame, col: str, pcts: tuple[float, ...] = PCTS
) -> DataFrame:
    """(pct, value, rank_at, n_rows) per requested percentile —
    value is the smallest input element whose cumulative count
    reaches ceil(pct · n).

    r6 recipe — sketch-bounded bucket prefix sum. The previous
    spelling (groupBy(value) → repartitionByRange prefix-sum recipe)
    executed the scan+groupBy subtree TWICE (RangePartitioner's
    sampling pass is a full execution) plus a localCheckpoint of the
    millions-of-distinct-values frame. Now:

    1. one no-shuffle quantile-sketch pass picks ~4×parallelism
       value-ordered bucket bounds (balance only affects task skew,
       never results);
    2. one cheap pass counts rows per bucket (map-side collapse to
       ≤#buckets rows/task) — the driver cumsum over ≤#buckets ints
       yields every bucket's exclusive offset AND the exact total, so
       the percentile target ranks become plan literals;
    3. one exchange + per-bucket sort ranks the raw rows (row_number
       + bucket offset = exact global rank), and a codegen isin
       filter + tiny broadcast equi-join picks the target order
       statistics — no aggregation, no distinct-value frame.

    Exactness is unchanged: bucket bounds only partition the value
    axis; every count, offset and target is integer arithmetic."""
    spark = df.sparkSession
    src = df.filter(F.col(col).isNotNull())
    n_shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_buckets = max(64, 4 * n_shuf)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(src.stat.approxQuantile(col, probs, 0.01)))
    bucket_of = _bucket_expr(F.col("v"), bounds)
    # pass 2: per-bucket row counts straight off the raw rows
    # (Σ_{v∈bucket} cnt(v) ≡ raw row count per bucket — no groupBy(v))
    btot = {
        r["_b"]: r["c"]
        for r in src.select(_bucket_expr(F.col(col), bounds).alias("_b"))
        .groupBy("_b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    offs, acc = [], 0
    for b in range(len(bounds) + 1):
        offs.append(acc)
        acc += int(btot.get(b, 0))
    n = acc
    targets = [(p, math.ceil(p * n)) for p in pcts]
    # pass 3: with the target ranks known as literals, the percentile
    # for target t is simply the t-th order statistic — no groupBy at
    # all. The raw (value, bucket) rows (~12 B each) hash-repartition
    # on _b straight off the scan (a single-row-group file's 1-task
    # scan does only the bucket map), a per-bucket row_number plus the
    # bucket's exclusive offset IS the global rank (buckets are
    # value-ordered intervals; rows tying on v are interchangeable, so
    # the value at any rank is deterministic), and a codegen isin
    # filter keeps exactly the |pcts| target rows before a tiny
    # broadcast equi-join attaches (pct, n). One exchange, one sort,
    # no aggregation — the straddle join over per-value counts is
    # equivalent (the value whose cumulative range contains t is the
    # t-th smallest element) and this spelling never materializes the
    # distinct-value frame.
    glob_rank = (
        F.row_number().over(Window.partitionBy("_b").orderBy("v"))
        + _offset_expr(F.col("_b"), offs)
    ).cast("long")
    ranked = (
        src.select(F.col(col).alias("v"))
        .withColumn("_b", bucket_of)
        .repartition(n_shuf, "_b")
        .withColumn("_gr", glob_rank)
        .filter(F.col("_gr").isin([t for _, t in targets]) if targets else F.lit(False))
    )
    tdf = F.broadcast(
        spark.createDataFrame(targets, "pct double, target long").withColumn(
            "n", F.lit(n).cast("bigint")
        )
    )
    return (
        ranked.join(tdf, ranked["_gr"] == tdf["target"])
        .select("pct", F.col("v").alias("value"), F.col("target").alias("rank_at"), F.col("n").alias("n_rows"))
        .orderBy("pct")
    )


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of lineitem extended price, exactly.

    (r6 negative result: spreading the 1-task lineitem scan on the
    groupBy key — so the exchange doubles as the groupBy distribution
    — measured cold 4.5 → 5.7 s, warm 3.3 → 3.5 s at sf1.0: the
    values are near-unique, so the spread trades the serialized
    1-task partial agg for a FULL raw-row shuffle with no map-side
    collapse. Left on the raw scan; the cost here is the multi-pass
    prefix-sum recipe, not the scan.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return exact_percentiles_frame(li, "l_extendedprice")


def _percentiles_sql(col: str = "l_extendedprice", pcts: tuple[float, ...] = PCTS) -> str:
    vals = ", ".join(f"({p}e0)" for p in pcts)
    return f"""
WITH c AS (SELECT {col} AS v, COUNT(*) AS cnt FROM lineitem
           WHERE {col} IS NOT NULL GROUP BY v),
cum AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM c),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
t AS (SELECT pct, CAST(ceil(pct * n) AS BIGINT) AS target, n
      FROM (VALUES {vals}) p(pct), tot)
SELECT t.pct, cum.v AS value, t.target AS rank_at, t.n AS n_rows
FROM t JOIN cum ON cum.cum - cum.cnt < t.target AND t.target <= cum.cum
ORDER BY t.pct
"""


EXACT_PERCENTILES_SQL = _percentiles_sql()


QUERIES = {"exact_percentiles": exact_percentiles}
ORACLES = {"exact_percentiles": EXACT_PERCENTILES_SQL}
