"""OLAP query shapes beyond the reference's own surface — the
patterns a crawl-analytics user runs over the harvested tables
(sessionization, pivot, rollup, window pagination, date formatting).
All built-in Catalyst operators; each has a DuckDB-oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SESSION_GAP_S = 1800


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) per user → new-session flag on gap >
    30min → cumulative session index → per-session aggregates. Two
    window passes over one shuffle on user_id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_S}
                 THEN 1 ELSE 0 END AS new_session
  FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events) t),
sess AS (
  SELECT *, CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       ROUND(SUM(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: user × event_type counts. Implemented with the pivot
    operator (Catalyst rewrites to conditional aggregation — the
    oracle states the rewrite explicitly)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = ["click", "view", "purchase", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )


PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY user_id ORDER BY user_id
"""


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total
    rows, the grouping-sets path in Catalyst."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def window_paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2's window-variant pagination (reference models/page.go:44):
    row_number over a deterministic total order, page 3 of size 25."""
    from .relational import paginate_window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return paginate_window(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey", "o_totalprice", page=3, size=25
    ).orderBy("o_totalprice", "o_orderkey")


WINDOW_PAGINATE_SQL = """
SELECT o_orderkey, o_totalprice FROM (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
    FROM orders) t
WHERE rn > 50 AND rn <= 75
ORDER BY o_totalprice, o_orderkey
"""


def date_format_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 date formatting (reference settings.go:21-22 layouts
    2006-01-02 / 15-04-05) + F12 page math (ceil(count/pageSize))."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.ceil(F.count("*") / 20).cast("long").alias("total_pages"),
            F.date_format(F.min("ts"), "yyyy-MM-dd_HH-mm-ss").alias("first_ts_fmt"),
        )
        .orderBy("day")
    )


DATE_FORMAT_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS n,
       CAST(ceil(COUNT(*) / 20.0) AS BIGINT) AS total_pages,
       strftime(MIN(ts), '%Y-%m-%d_%H-%M-%S') AS first_ts_fmt
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES = {
    "sessionize_events": sessionize_events,
    "pivot_event_counts": pivot_event_counts,
    "rollup_lineitem": rollup_lineitem,
    "window_paginate_orders": window_paginate_orders,
    "date_format_events": date_format_events,
}

ORACLES = {
    "sessionize_events": SESSIONIZE_SQL,
    "pivot_event_counts": PIVOT_SQL,
    "rollup_lineitem": ROLLUP_SQL,
    "window_paginate_orders": WINDOW_PAGINATE_SQL,
    "date_format_events": DATE_FORMAT_SQL,
}
