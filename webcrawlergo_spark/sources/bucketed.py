"""Bucketed storage for co-located joins (SURVEY §4 physical notes).

At 10^10 URLs the flagship J1 join (pages ⋈ urls ON url_id) and the
W1 window (PARTITION BY url_id) each shuffle the pages log unless the
tables are stored pre-partitioned on the join key. Spark's native
bucketing does exactly that: `bucketBy(N, key)` writes hash-bucketed,
optionally sorted files; a read-side join of two tables bucketed the
same way runs exchange-free (SortMergeJoin with zero Exchange nodes),
and the window reuses the same layout.

This module wraps the write/read pattern; tests/test_bucketed.py
asserts the exchange-free plan property rather than trusting it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed parquet table.
    Idempotent: replaces the table if it exists."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous SESSION's managed location survives the in-memory
    # catalog; Spark refuses to reuse it — clear the orphan dir
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the final (adaptive) physical plan —
    the property bucketing is supposed to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


def bucketed_latest_pages(spark: SparkSession, urls_table: str, pages_table: str) -> DataFrame:
    """The flagship W1+J1 over bucketed tables: with both tables
    bucketed on the key, neither the window nor the join shuffles."""
    from ..operators.window import latest_pages

    return latest_pages(spark.table(pages_table), spark.table(urls_table))
