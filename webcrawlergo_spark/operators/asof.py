"""As-of (temporal) join — attach to each probe row the most recent
build row at or before its timestamp, per key.

Spark's DataFrame API has no native ASOF JOIN (DuckDB does — the
oracle uses it verbatim), and the naive spellings are scale-broken:
a range join (``p.ts >= b.ts``) explodes to the full per-key cross
product before aggregating, and a per-key ``applyInPandas`` drags
every row through Python. The union trick used here is the canonical
distributed shape:

1. tag build rows 0 and probe rows 1, union them into ONE frame
   (each side's payload wrapped in a struct, NULL on the other side);
2. window ``last(build_payload, ignorenulls=True)`` over
   (key ORDER BY ts, tag, payload ROWS UNBOUNDED PRECEDING..CURRENT):
   each probe row picks up the latest build struct at ts' <= ts —
   builds sorting before probes at equal ts makes the match
   INCLUSIVE, matching DuckDB's ``ASOF JOIN ON p.ts >= b.ts``;
3. filter back to probe rows and unpack.

Cost: ONE shuffle on the key (both inputs together), one in-partition
sort, zero Python. At 100 TB the frontier analog — "state of URL u as
of fetch time t" — runs at sort-merge throughput; a skewed key (one
mega-user) lands one sorted partition, the same skew profile the
crawl's mega-host salting handles, and never a cross product.

Determinism: peers tied on (ts, tag) are further ordered by the build
payload struct, so the window frame is total-ordered; probe peers
sharing a timestamp each still see the identical build prefix (their
NULL payloads are invisible to ``last(ignorenulls)``), so output
never depends on physical row order. Duplicate build timestamps
within a key resolve to the struct-lexicographically last payload —
callers wanting DuckDB-ASOF-identical output on tied builds should
dedup first (the shipped query's stream is tie-free; the unit test
pins inclusive-equality and no-prior-build edges against a golden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

ASOF_PREFIX = "asof_"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    prefix: str = ASOF_PREFIX,
) -> DataFrame:
    """Left as-of join: every probe row, plus the build row with the
    greatest ``build_ts`` <= the probe's ``probe_ts`` sharing the
    ``on`` key (NULLs if none). Build columns (including its ts)
    come back renamed ``{prefix}{col}``."""
    bpay = [c for c in build.columns if c != on]
    ppay = list(probe.columns)
    b = build.select(
        F.col(on),
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in bpay]).alias("_b"),
    )
    b_type = b.schema["_b"].dataType
    p = probe.select(
        F.col(on),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(b_type).alias("_b"),
        F.struct(*[F.col(c) for c in ppay]).alias("_p"),
    )
    p_type = p.schema["_p"].dataType
    u = b.withColumn("_p", F.lit(None).cast(p_type)).unionByName(p)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag", "_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_b", ignorenulls=True).over(w)
    ).filter(F.col("_tag") == 1)
    return matched.select(
        *[F.col("_p")[c].alias(c) for c in ppay],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in bpay],
    )


def purchases_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent click at or
    before the purchase instant (the attribution query every event
    pipeline runs) — NULL click columns for purchases with no prior
    click. Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        probe, build, on="user_id", probe_ts="purchase_ts", build_ts="click_ts"
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col(f"{ASOF_PREFIX}click_id").alias("click_id"),
        F.col(f"{ASOF_PREFIX}click_ts").alias("click_ts"),
    ).orderBy("purchase_id")


PURCHASES_ASOF_CLICKS_SQL = """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id, c.click_ts
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
ORDER BY purchase_id
"""


QUERIES = {"purchases_asof_clicks": purchases_asof_clicks}
ORACLES = {"purchases_asof_clicks": PURCHASES_ASOF_CLICKS_SQL}
