"""Bucketed range (interval-overlap) join — "which point events fall
inside which time windows" without a quadratic plan.

Spark compiles a raw range predicate (``p.ts >= i.start AND p.ts <
i.end``) to BroadcastNestedLoopJoin — per-pair evaluation, O(|P|·|I|)
at scale (DuckDB's IEJoin handles it, which is exactly what makes it
the right ORACLE and the wrong production plan). The distributed
shape maps both sides onto fixed-width time buckets first:

1. intervals explode to the buckets they overlap (`sequence` of
   bucket ids — for windows ≤ the bucket width that is ≤ 2 rows per
   interval, and in general len/width + 1: bounded, chosen, never
   data-dependent);
2. points map to exactly ONE bucket — so after the bucket equi-join
   each (interval, point) pair occurs at most once and needs no
   dedup;
3. the bucket equi-join (shuffle on bucket id) carries the exact
   range predicate as a residual condition; LEFT join keeps
   zero-match windows alive through the final per-interval rollup
   (`count(point)` ignores the null probe rows of unmatched bucket
   replicas).

Time moves as integer microseconds end-to-end (`unix_micros` /
`epoch_us`) — no float timestamps anywhere. At 100 TB the only
shuffle key is the bucket id; a hot hour is ordinary key skew (AQE
skew-split territory), never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

HOUR_US = 3_600_000_000  # window length AND bucket width, microseconds


def range_join_agg(
    intervals: DataFrame,  # (id, s_us, e_us) — e exclusive
    points: DataFrame,  # (pid, t_us)
    bucket_us: int = HOUR_US,
) -> DataFrame:
    """Per interval: how many points land in [s_us, e_us), and the
    smallest such point id (NULL when none)."""
    ib = intervals.select(
        "id",
        "s_us",
        "e_us",
        # integer `div`, never float division: a double quotient can
        # misplace an exact-boundary timestamp by one bucket
        F.explode(
            F.sequence(
                F.expr(f"s_us div {bucket_us}"),
                F.expr(f"(e_us - 1) div {bucket_us}"),
            )
        ).alias("bucket"),
    )
    pb = points.select(
        "pid", "t_us", F.expr(f"t_us div {bucket_us}").alias("bucket")
    )
    joined = ib.join(
        pb,
        (ib["bucket"] == pb["bucket"])
        & (pb["t_us"] >= ib["s_us"])
        & (pb["t_us"] < ib["e_us"]),
        "left",
    )
    return (
        joined.groupBy("id")
        .agg(
            F.count("pid").alias("n_points"),
            F.min("pid").alias("first_pid"),
        )
        .orderBy("id")
    )


def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the signups inside the following hour —
    the incident-impact query (zero-signup windows included)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # parquet ts loads as TIMESTAMP_NTZ; the session timezone is
    # pinned UTC (session.py), so the NTZ→LTZ cast is the identity
    # on the wall clock and unix_micros == DuckDB's epoch_us(naive)
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))")
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"),
        us.alias("s_us"),
        (us + F.lit(HOUR_US)).alias("e_us"),
    )
    points = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("pid"), us.alias("t_us")
    )
    out = range_join_agg(intervals, points)
    return out.select(
        F.col("id").alias("error_id"),
        F.col("n_points").alias("n_signups"),
        F.col("first_pid").alias("first_signup_id"),
    )


RANGE_JOIN_SQL = f"""
WITH e AS (SELECT event_id AS error_id, epoch_us(ts) AS s,
                  epoch_us(ts) + {HOUR_US} AS en
           FROM events WHERE event_type = 'error'),
     p AS (SELECT event_id AS signup_id, epoch_us(ts) AS t
           FROM events WHERE event_type = 'signup')
SELECT e.error_id, CAST(COUNT(p.signup_id) AS BIGINT) AS n_signups,
       MIN(p.signup_id) AS first_signup_id
FROM e LEFT JOIN p ON p.t >= e.s AND p.t < e.en
GROUP BY e.error_id ORDER BY e.error_id
"""


QUERIES = {"range_join_error_windows": range_join_error_windows}
ORACLES = {"range_join_error_windows": RANGE_JOIN_SQL}
