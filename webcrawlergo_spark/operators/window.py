"""Window operators.

W1 — latest-page-per-URL, the reference's only window function and
its flagship export query (reference models/page.go:20-44,
NOTES.md:50-63):

    ROW_NUMBER() OVER (PARTITION BY u.id ORDER BY p.added_at DESC) AS rn
    ... WHERE rn = 1

Spark shape: one shuffle on ``url_id`` feeds both the window and the
join when the join key matches the window key; Catalyst reuses the
exchange. Join strategy is left to AQE: at the 10^10-URL design point
the urls registry is NOT broadcastable (a forced broadcast is a
driver OOM, not a hint — r1 verdict), while at small scale AQE picks
the broadcast on its own from runtime stats. A deterministic
tie-break on ``id DESC`` is added — the reference relies on rowid
insertion order for equal timestamps; Spark must not rely on
accidental order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_pages(pages: DataFrame, urls: DataFrame) -> DataFrame:
    """Latest fetched page per URL: J1 join + W1 latest-row-per-key +
    rn=1 semantics.

    Mirrors reference models/page.go:20-44 (QueryGetLatestPagesCount /
    QueryGetLatestPages): pages ⋈ urls ON p.url_id = u.id, keep newest
    row per url.

    r6 shape: the ROW_NUMBER window + rn=1 filter is spelled as a
    ``max(struct(added_at, id, doc_id))`` aggregate — identical row
    selection (struct ordering compares added_at, then the unique page
    id, exactly the window's DESC/DESC tie-break; doc_id merely rides
    along), but a hash aggregate with a MAP-SIDE PARTIAL: the exchange
    carries at most one row per url per input partition and no sort
    runs at all, where the window shape paid a per-partition sort +
    post-shuffle sort even with its WindowGroupLimit top-1 push-down
    (guide §2.3/§2.4 — at sf1.0 the flagship's warm time dropped ~2×).
    """
    latest = (
        pages.groupBy("url_id")
        .agg(F.max(F.struct("added_at", "id", "doc_id")).alias("_top"))
        .select(
            "url_id",
            F.col("_top.added_at").alias("added_at"),
            F.col("_top.doc_id").alias("doc_id"),
        )
    )
    return (
        latest.join(urls, latest.url_id == urls.id, "inner")
        .select("url_id", "url", "added_at", "doc_id", "is_monitored", "is_alive")
    )


def widen_cutoff(date_str: str):
    """F10 (reference cmd/webcrawlerGo/cmdFlags.go:160-166): the CLI's
    day-granular cutoff date widens to the end of that day
    (+24h − 1s) so the export includes the whole date."""
    return (
        F.to_timestamp(F.lit(date_str), "yyyy-MM-dd")
        + F.expr("INTERVAL 24 HOURS")
        - F.expr("INTERVAL 1 SECOND")
    )


def latest_pages_filtered(
    pages: DataFrame,
    urls: DataFrame,
    cutoff: str | None = None,
    base_prefix: str | None = None,
    marked_substr: str | None = None,
    with_id: bool = False,
) -> DataFrame:
    """Full export-query shape (reference models/page.go:24-44):
    cutoff P15 (`added_at <= ?`) + prefix/substring P16
    (`url LIKE base||'%' AND url LIKE '%'||marked||'%'`) applied
    *inside* the CTE, before the window — filters push to the scan.
    """
    if cutoff is not None:
        pages = pages.filter(F.col("added_at") <= F.lit(cutoff).cast("timestamp"))
    if base_prefix is not None:
        urls = urls.filter(F.col("url").startswith(base_prefix))
    if marked_substr is not None:
        urls = urls.filter(F.col("url").contains(marked_substr))
    # the urls side has just been filtered by prefix+substring — often
    # tiny, but let AQE decide from the measured post-filter size
    extra = [c for c in ("doc_id",) if c in pages.columns]
    joined = pages.join(urls, pages.url_id == urls.id, "inner").select(
        pages.id.alias("id"), "url_id", "url", "added_at", *extra
    )
    w = Window.partitionBy("url_id").orderBy(F.col("added_at").desc(), F.col("id").desc())
    keep = ["url_id", "url", "added_at", *extra] + (["id"] if with_id else [])
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*keep)
    )
