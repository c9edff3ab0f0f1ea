"""Deterministic crawl-shaped views derived from the testdata.

The driver's correctness harness runs over TPC-H-ish tables, which
carry no ``urls``/``pages`` tables. To check the reference's query API
(SURVEY §2 S4, W1, P2-P16, J1-J5) against the DuckDB oracle we derive
crawl-shaped views *deterministically* from ``events`` with pure
SQL-expressible arithmetic — the identical derivation is emitted as
SQL for the oracle side (``URLS_VIEW_SQL`` / ``PAGES_VIEW_SQL``), so
both engines see bit-identical inputs.

Mapping: each distinct ``user_id`` becomes a registered URL
(reference models/url.go:50-59); each event becomes a fetched-page
row (reference models/page.go:49-54) with ``added_at = ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def urls_view(events: DataFrame) -> DataFrame:
    """One row per distinct user_id → the `urls` registry analog.

    Flags are deterministic functions of the key, mirroring the
    fixture mix in FIXTURES.md §2 (monitored/alive combinations).
    """
    u = events.select("user_id").distinct()
    return u.select(
        F.col("user_id").alias("id"),
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 10).cast("string"),
            F.lit(".test/u/"),
            F.col("user_id").cast("string"),
        ).alias("url"),
        (F.col("user_id") % 3 == 0).alias("is_monitored"),
        (F.col("user_id") % 7 != 0).alias("is_alive"),
    )


# Identical derivation in ANSI SQL for the DuckDB oracle.
URLS_VIEW_SQL = """
    SELECT user_id AS id,
           'https://host' || CAST(user_id % 10 AS VARCHAR) || '.test/u/'
               || CAST(user_id AS VARCHAR) AS url,
           (user_id % 3 = 0) AS is_monitored,
           (user_id % 7 <> 0) AS is_alive
    FROM (SELECT DISTINCT user_id FROM events) t
"""


def pages_view(events: DataFrame) -> DataFrame:
    """Each event → one fetched-page row (append-only log analog)."""
    return events.select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("url_id"),
        F.col("ts").alias("added_at"),
        F.concat(F.lit("doc"), (F.col("event_id") % 500).cast("string")).alias("doc_id"),
    )


PAGES_VIEW_SQL = """
    SELECT event_id AS id,
           user_id AS url_id,
           ts AS added_at,
           'doc' || CAST(event_id % 500 AS VARCHAR) AS doc_id
    FROM events
"""
