"""Relational query API — the reference's REST/model surface as
DataFrame functions (SURVEY §2.1 S4, §2.2 P1-P16, §2.6 O1-O2).

Everything here is built-in Catalyst territory: filters push down to
the parquet scan, projections prune columns, sorts+limits become
TakeOrderedAndProject. The only engine logic is the *dynamic* filter
chain (reference models/url.go:211-217 appends WHERE clauses only
when flags are present) and the sort-key safelist validation
(reference models/utils.go:15-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def validate_sort_key(sort: str, allowed: list[str]) -> tuple[str, bool]:
    """Reference models/utils.go:15-39 + models/filters.go:20-27:
    a sort key from a safelist, '-' prefix = DESC. Raises on
    non-safelisted keys exactly as the reference 422s."""
    desc = sort.startswith("-")
    key = sort[1:] if desc else sort
    if key not in allowed:
        raise ValueError(f"invalid sort key {sort!r}; allowed: {allowed}")
    return key, desc


def list_urls(
    urls: DataFrame,
    like: str | None = None,
    is_alive: bool | None = None,
    is_monitored: bool | None = None,
    sort: str = "id",
    page: int = 1,
    page_size: int = 10,
) -> DataFrame:
    """S4 — scan+filter+sort+paginate (reference models/url.go:201-267).

    LIKE '%s%' → contains (P3); dynamic boolean predicates appended
    only when present (P4, models/url.go:211-217); LIMIT/OFFSET with
    Offset=(Page-1)*PageSize (O2, models/filters.go:12-18). A unique
    tie-break column (id) is always appended to the user sort so
    pagination is deterministic under parallel execution — the
    reference gets this implicitly from sqlite rowid order.
    """
    df = urls
    if like is not None:
        df = df.filter(F.col("url").contains(like))
    if is_alive is not None:
        df = df.filter(F.col("is_alive") == F.lit(is_alive))
    if is_monitored is not None:
        df = df.filter(F.col("is_monitored") == F.lit(is_monitored))
    key, desc = validate_sort_key(sort, allowed=["id", "url", "is_monitored", "is_alive"])
    order = [F.col(key).desc() if desc else F.col(key).asc(), F.col("id").asc()]
    offset = (page - 1) * page_size
    return df.orderBy(*order).offset(offset).limit(page_size)


def get_url_by_id(urls: DataFrame, url_id: int) -> DataFrame:
    """P2 point predicate (reference models/url.go:30, QueryGetById)."""
    return urls.filter(F.col("id") == F.lit(url_id))


def monitored_alive(urls: DataFrame) -> DataFrame:
    """P5 (reference models/url.go:43-45): is_monitored AND is_alive."""
    return urls.filter(F.col("is_monitored") & F.col("is_alive")).orderBy("id")


def pages_by_url(pages: DataFrame, urls: DataFrame, url_id: int) -> DataFrame:
    """Pages for one URL with manual column pruning — the reference's
    QueryGetAllPageByURL deliberately drops `content`
    (models/page.go:17); here we drop doc_id the same way and let
    Catalyst prune it out of the scan."""
    return (
        pages.filter(F.col("url_id") == F.lit(url_id))
        .join(urls.select("id"), pages.url_id == urls.id, "left_semi")
        .select("id", "url_id", "added_at")
        .orderBy(F.col("added_at").desc(), F.col("id").desc())
    )


def urls_never_fetched(urls: DataFrame, pages: DataFrame) -> DataFrame:
    """J2-shaped anti-join: registry rows with no fetch log. The same
    plan shape as the frontier's seen-set dedup (queue/queue.go:99-110
    'insert only on first encounter')."""
    return urls.join(pages.select(F.col("url_id").alias("id")), "id", "left_anti").orderBy("id")


def urls_fetched(urls: DataFrame, pages: DataFrame) -> DataFrame:
    """J4-shaped semi-join: registry rows that have ≥1 fetch."""
    return urls.join(pages.select(F.col("url_id").alias("id")), "id", "left_semi").orderBy("id")


def union_with_retries(new_links: DataFrame, retries: DataFrame) -> DataFrame:
    """U2 (reference crawler.go:200 + queue/queue.go:112-126): failed
    URLs re-enter alongside new discoveries; dedup U1 keeps lifetime
    uniqueness."""
    return new_links.unionByName(retries).dropDuplicates(["url"])


def top_k(df: DataFrame, order_col: str, k: int, tie_break: str) -> DataFrame:
    """O1/O2 — ORDER BY ... LIMIT k with deterministic tie-break;
    Spark physical plan is TakeOrderedAndProject (no full sort)."""
    return df.orderBy(F.col(order_col).desc(), F.col(tie_break).asc()).limit(k)


def frontier_view(df: DataFrame, order_cols: list[str], n: int) -> list:
    """O5 — Queue.View(n) (reference queue/queue.go:176-198): the
    first n items in FIFO order; asking for more than the queue holds
    raises, mirroring ErrOutOfRange. The limit+collect ships n rows,
    never the queue."""
    rows = df.orderBy(*[F.col(c) for c in order_cols]).limit(n + 1).collect()
    if n > len(rows):
        raise IndexError(f"view({n}) out of range: queue holds {len(rows)}")
    return rows[:n]


def get_map_value(flags: DataFrame, url: str, url_col: str = "url") -> bool:
    """Queue.GetMapValue (reference queue/queue.go:63-74): the fetch
    flag for a key; a never-inserted key raises (ErrItemNotFound)."""
    rows = flags.filter(F.col(url_col) == F.lit(url)).limit(1).collect()
    if not rows:
        raise KeyError(url)
    return bool(rows[0]["flag"])


def paginate_window(df: DataFrame, part_col: str, order_col: str, page: int, size: int) -> DataFrame:
    """O2 window-variant pagination (reference models/page.go:44 pages
    LIMIT/OFFSET inside the windowed CTE).

    Global row numbers come from the distributed zipWithIndex recipe
    (plans/rank.py) — an unpartitioned ``row_number() OVER (ORDER BY)``
    moves ALL data to one partition (r1 bench logged Spark's own
    warning 7×); this shape range-partitions the sort instead."""
    from ..plans.rank import with_global_rank

    lo, hi = (page - 1) * size, page * size
    ranked = with_global_rank(df, [order_col, part_col], "_rn")
    return ranked.filter((F.col("_rn") >= lo) & (F.col("_rn") < hi)).drop("_rn")
