"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name]`` (spark, sf_dir) → DataFrame is compared against
``oracle_sql()[name]`` run by DuckDB on the same parquet tables
(row-count + schema + order-insensitive value-hash).

Every query maps to an operator row in SURVEY.md §2 (IDs cited in
the lambdas' docstrings / comments). Crawl-shaped inputs (`urls`,
`pages`) are derived deterministically from `events` by
webcrawlergo_spark.sources.crawlviews — the identical derivation is
inlined in the oracle SQL as CTEs, so both engines see the same rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from webcrawlergo_spark.multimodal import (
    FRAME_SAMPLE_SQL,
    IMAGE_DECODE_STATS_SQL,
    MULTIMODAL_META_SQL,
    VIDEO_DECODE_STATS_SQL,
    WAV_DECODE_STATS_SQL,
    frame_sample_plan,
    image_decode_stats,
    multimodal_meta,
    video_decode_stats,
    wav_decode_stats,
)
from webcrawlergo_spark.operators import asof as asf
from webcrawlergo_spark.operators import dedup as dd
from webcrawlergo_spark.operators import graph as gr
from webcrawlergo_spark.operators import interval as itv
from webcrawlergo_spark.operators import olap
from webcrawlergo_spark.operators import sketch as sk
from webcrawlergo_spark.operators import stats as st
from webcrawlergo_spark.operators import relational as rel
from webcrawlergo_spark.operators import retrieval as ret
from webcrawlergo_spark.operators import sampling as smp
from webcrawlergo_spark.operators import similarity as sim
from webcrawlergo_spark.operators import text as tx
from webcrawlergo_spark.operators import window as win
from webcrawlergo_spark.operators.crawl_queries import (
    anchor_text_agg,
    crawl_bfs_depth,
    crawl_delta,
    link_extract_spans,
    recrawl_priority,
)
from webcrawlergo_spark.sources import crawlviews as cv
from webcrawlergo_spark.sources.tpch import load_table
from webcrawlergo_spark.streaming.windowed import TUMBLING_SQL, tumbling_event_counts

# Shared CTE prelude for every oracle that touches the derived views.
_VIEWS_CTE = f"""
WITH urls AS ({cv.URLS_VIEW_SQL}),
     pages AS ({cv.PAGES_VIEW_SQL})
"""

_CUTOFF = "2024-01-04 00:00:00"


def _views(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    return cv.urls_view(ev), cv.pages_view(ev)


# --------------------------------------------------------------------------
# Query implementations (Spark side)
# --------------------------------------------------------------------------

def q_latest_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1 + J1 (reference models/page.go:20-44) — the flagship.
    urls, pages = _views(spark, sf_dir)
    return win.latest_pages(pages, urls).orderBy("url_id")


def q_latest_pages_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 (reference models/page.go:205-226).
    urls, pages = _views(spark, sf_dir)
    return win.latest_pages(pages, urls).agg(F.count("*").alias("n_latest"))


def q_latest_pages_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §3.2 export pipeline: P15 cutoff + P16 prefix/substring + W1.
    urls, pages = _views(spark, sf_dir)
    return win.latest_pages_filtered(
        pages, urls, cutoff=_CUTOFF, base_prefix="https://host1", marked_substr="/u/1"
    ).orderBy("url_id")


def q_list_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4 = P3 + P4 + O1 + O2 (reference models/url.go:201-267).
    urls, _ = _views(spark, sf_dir)
    return rel.list_urls(urls, like="1", is_alive=True, sort="-url", page=2, page_size=10)


def q_url_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P2 point lookup (reference models/url.go:30).
    urls, _ = _views(spark, sf_dir)
    return rel.get_url_by_id(urls, 7)


def q_monitored_alive(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5 (reference models/url.go:43-45).
    urls, _ = _views(spark, sf_dir)
    return rel.monitored_alive(urls)


def q_pages_by_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4-analog with manual column pruning P1 (reference models/page.go:17).
    urls, pages = _views(spark, sf_dir)
    return rel.pages_by_url(pages, urls, url_id=3)


def q_urls_never_fetched(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2-shaped anti-join — the dedup plan shape (queue/queue.go:99-110).
    # Pages restricted to an early window so the anti-join is non-trivial.
    urls, pages = _views(spark, sf_dir)
    early = pages.filter(F.col("added_at") <= F.lit("2024-01-01 02:00:00").cast("timestamp"))
    return rel.urls_never_fetched(urls, early)


def q_urls_fetched(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4-shaped semi-join (queue/queue.go:67-74).
    urls, pages = _views(spark, sf_dir)
    return rel.urls_fetched(urls, pages)


def q_union_retries_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1 + U2 (crawler.go:200; queue/queue.go:99-126).
    urls, _ = _views(spark, sf_dir)
    a = urls.filter(F.col("url").contains("/u/1"))
    b = urls.filter(F.col("url").contains("/u/2"))
    return rel.union_with_retries(a, b).select("id", "url").orderBy("id")


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O1/O2 top-k (TakeOrderedAndProject physical plan).
    orders = load_table(spark, sf_dir, "orders")
    return rel.top_k(orders, "o_totalprice", 10, "o_orderkey").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def q_group_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A-class aggregation headline (TPC-H Q1 shape) — exercises
    # map-side partial aggregation; sums rounded for cross-engine fp.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1 trim + trailing-slash strip, F5 prefix test, F13 lower
    # (crawler.go:382-385; internal/utils.go:38-45; models/psql/psql.go:51).
    urls, _ = _views(spark, sf_dir)
    href = F.concat(F.col("url"), F.lit("/"))
    return urls.select(
        "id",
        F.regexp_replace(F.trim(href), "/+$", "").alias("href_norm"),
        F.lower(F.col("url")).alias("url_lower"),
        F.col("url").startswith("https://host1").alias("is_host1"),
    ).orderBy("id")


def q_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F9 re-crawl expiry: last_saved + days <= now (init.go:39-46,67-75).
    _, pages = _views(spark, sf_dir)
    return (
        pages.filter(F.col("added_at") + F.expr("INTERVAL 2 DAYS") <= F.lit(_CUTOFF).cast("timestamp"))
        .select("id", "url_id", "added_at")
        .orderBy("id")
    )


def q_href_token_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # X1-shaped order-preserving token extraction via posexplode
    # (crawler.go:376-401 document-order anchor walk).
    docs = load_table(spark, sf_dir, "documents")
    return tx.token_extract(docs, prefix="s")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact dedup by content hash-groupBy (training-pipeline op).
    docs = load_table(spark, sf_dir, "documents")
    return dd.dedup_exact(docs)


def q_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S9 + J6: registry delete with FK cascade to the pages log
    # (reference models/url.go:175-198; cascade DDL sqlite.go:64).
    # Victims: id % 11 == 0. Result: surviving registry + per-URL
    # count over the CASCADED pages log (proves the cascade happened).
    from webcrawlergo_spark.operators.delete import delete_urls_cascade

    urls, pages = _views(spark, sf_dir)
    out = delete_urls_cascade(urls, pages, urls.filter(F.col("id") % 11 == 0))
    counts = out["pages"].groupBy("url_id").agg(F.count("*").alias("n_pages"))
    return (
        out["urls"]
        .join(counts, out["urls"].id == counts.url_id, "left")
        .select(
            "id", "url", "is_monitored", "is_alive",
            F.coalesce("n_pages", F.lit(0)).cast("long").alias("n_pages"),
        )
        .orderBy("id")
    )


def q_cutoff_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F10 (cmdFlags.go:160-166): date cutoff '2024-01-02' widens to
    # 2024-01-02 23:59:59 — pages from that whole day survive.
    _, pages = _views(spark, sf_dir)
    return (
        pages.filter(F.col("added_at") <= win.widen_cutoff("2024-01-02"))
        .select("id", "url_id", "added_at")
        .orderBy("id")
    )


def q_export_sanitized_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S10 + F7: db2disk filename derivation (db.go:228-263) — path
    # split, per-segment unsafe-char sanitize, QueryEscape, timestamp
    # suffix. URLs get a deterministic messy segment (space, colon,
    # ampersand) so the sanitize + encode steps genuinely transform.
    from webcrawlergo_spark.operators.export import export_paths

    urls, pages = _views(spark, sf_dir)
    latest = win.latest_pages(pages, urls)
    messy = latest.withColumn(
        "url",
        F.concat("url", F.lit("/f le:"), F.col("url_id").cast("string"), F.lit("&v")),
    )
    return export_paths(messy).select("url_id", "rel_path").orderBy("url_id")


# --------------------------------------------------------------------------
# Contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (W1 latest-pages)."""
    return q_latest_pages(spark, "/root/testdata/sf0.001")


# Redundant entries retired from the DRIVER surface (r4: the driver
# records only the first 50 queries() entries, so every slot counts).
# Each is subsumed by a live entry — latest_pages_count by
# latest_pages (same plan + trivial agg), ann_lsh_buckets by
# ann_lsh_topk, ivf_cells by ivf_topk, href_token_extract by
# link_extract_spans (same posexplode extraction machinery; X1 stays
# driver-green), urls_fetched by urls_never_fetched (complement of the
# same pages⋈urls existence join; J4 retains wave-loop parity) — and
# all remain covered by pytest + tools/compare.py (which merges
# retired_queries()). r5 additions: multimodal_meta is subsumed by the
# three real-decode stats queries (each emits the typed-metadata
# columns PLUS the decoded-payload md5 over the same table);
# token_length_buckets is a histogram over the same per-doc token
# counts token_count already proves row-by-row.
RETIRED_FROM_DRIVER = (
    "latest_pages_count",
    "ann_lsh_buckets",
    "ivf_cells",
    "href_token_extract",
    "urls_fetched",
    "multimodal_meta",
    "token_length_buckets",
    # sessionize_events' exact oracle (SESSIONIZE_SQL) is the driver
    # gate of sessionize_stateful_stream — the streaming twin — so the
    # batch row is redundant driver surface; window_paginate_orders is
    # the window-spelled O2 variant, with O2 itself gated by list_urls
    # (limit/offset) + topk_orders; stratified_sample's hash-order
    # selection rule is a fixed-quota special case of resample_to_mix
    # (its salted top-K machinery keeps wave-politeness parity + the
    # vs-plain-window unit test).
    "sessionize_events",
    "window_paginate_orders",
    "stratified_sample",
    # overflow, not redundancy: the 50 driver slots keep the
    # reference-parity rows; kmeans_cells (the IVF/PQ codebook
    # trainer) is gated by the SAME merged local comparison plus its
    # recall-improvement unit test, and its plan primitives
    # (broadcast-assign min_by partials, groupBy sum partials,
    # per-round localCheckpoint) are each driver-gated via
    # ivf_cells'/pq_codes' rows.
    "kmeans_cells",
    # r5 session 3: ngram_jaccard_pairs parameterizes the SAME
    # _lsh_jaccard_pairs/_lsh_sql pair as the driver-live
    # minhash_lsh_pairs (n=2, looser threshold, independent seeds) —
    # zero new plan machinery; timestamp_arith's F9 `added_at +
    # INTERVAL <= cutoff` predicate is a sub-expression of
    # cutoff_widening's driver-live filter and F9 keeps wave-loop
    # re-crawl-expiry parity. Slots freed for duplicate_runs +
    # bm25_topk.
    "ngram_jaccard_pairs",
    "timestamp_arith",
    # r5 session 4: url_by_id's machinery (point equi-predicate +
    # projection pruning on a registry view) is a strict subset of
    # the driver-live pages_by_url row; user_event_seq drives the
    # SAME plans/rank.py::with_host_seq distributed rank as the
    # driver-live resample_to_mix (which layers quotas on top of it).
    # Slots freed for purchases_asof_clicks + hll_distinct.
    "url_by_id",
    "user_event_seq",
    # r5 session 4b: monitored_alive's P5 machinery (AND of two
    # boolean point predicates + pruned scan) is a strict subset of
    # the driver-live list_urls (P3/P4 dynamic predicates) and the
    # flagship latest_pages row (which carries is_monitored/is_alive
    # through its join); latest_pages_export's P15 cutoff predicate
    # is cutoff_widening's live filter and its P16 prefix+substring
    # LIKEs are list_urls' live machinery — the export SINK (S10/F7)
    # keeps its own live row (export_sanitized_paths). Slots freed
    # for exact_percentiles + range_join_error_windows.
    "monitored_alive",
    "latest_pages_export",
    # r5 session 4c: date_format_events' F11/F12 strftime patterns
    # run through the same to_timestamp/date_format scalar machinery
    # the driver-live scalar_string_funcs and events_tumbling_agg
    # rows exercise (tumbling buckets ARE timestamp truncation).
    # Slot freed for weighted_sample_topk (A-ES sampling).
    "date_format_events",
    # r5 session 5: union_retries_dedup's U1/U2 (union-distinct of two
    # registry filters) is wave-loop parity-gated (retry ∪ new,
    # wave.py:634-646) and its plan pieces are live via list_urls
    # (the LIKE filters) + dedup_exact (the distinct); topk_orders'
    # TakeOrderedAndProject physical shape is plan-asserted by the
    # driver-live weighted_sample_topk (same operator, computed key)
    # with limit/offset live via list_urls; group_agg_lineitem's
    # map-side partial agg on lineitem is subsumed by rollup_lineitem
    # (ROLLUP contains the plain grouping as its finest grouping set,
    # same sum/count aggregates on the same table); domain_mix_weights'
    # share→sqrt→normalize pipeline is recomputed verbatim as the
    # first stage of the driver-live resample_to_mix. Slots freed for
    # link_pagerank + semdedup_keep + cms_heavy_hitters +
    # chunk_documents.
    "union_retries_dedup",
    "topk_orders",
    "group_agg_lineitem",
    "domain_mix_weights",
    # r5 session 5b: cosine_topk's brute scoring (zip_with fold +
    # 6dp round + window top-k) is the identical scoring stage of the
    # driver-live ann_lsh_topk / ivf_topk / pq_adc_topk rows, and the
    # ANN recall CI (tests/test_ann_quality.py) recomputes the brute
    # ground truth on every run; minhash_signatures is the signature
    # stage the driver-live minhash_lsh_pairs computes verbatim
    # (explode+groupBy-min, dedup.py:84-113) with its scalar mh0..mh7
    # convention unit-pinned. Slots freed for anchor_text_agg +
    # crawl_delta.
    "cosine_topk",
    "minhash_signatures",
    # r5 session 5c: embedding_neardup_pairs (same-LSH-bucket pairs +
    # thresholded rounded cosine) is the composition of driver-live
    # machinery — the md5-derived bucket equi-join of ann_lsh_topk and
    # the thresholded within-group cosine prune of semdedup_keep;
    # ivf_topk's probe-limited search decomposes the same way (its
    # _cells assignment stage is live inside semdedup_keep, its
    # shortlist-then-exact-rerank pattern inside pq_adc_topk) and its
    # recall stays CI-floored in tests/test_ann_quality.py. Slots
    # freed for pmi_phrases + stream_dedup_distinct.
    "embedding_neardup_pairs",
    "ivf_topk",
    # r5 session 6: pages_by_url's P1/P2 machinery (point equi-
    # predicate + projection-pruned scan + url join) is live inside
    # latest_pages (same join, wider predicate surface) and list_urls
    # (dynamic predicates + LIKE); token_count's whitespace/word-regex
    # totals are live sub-expressions of pmi_phrases (nu),
    # pack_documents (budget packing over token counts) and
    # chunk_documents (window arithmetic over the token sequence).
    # Slots freed for tfidf_topterms + dsir_logratio.
    "pages_by_url",
    "token_count",
    # r5 session 6b: simhash's bitwise groupBy-sum signature is the
    # same machinery class as the retired minhash_signatures (one
    # shingle pass, map-side-combined per-bit sums, no join); near-dup
    # coverage stays driver-live four ways (minhash_lsh_pairs,
    # neardup_clusters, duplicate_runs, semdedup_keep). Slot freed for
    # recrawl_priority.
    "simhash",
    # r5 session 7: doc_fingerprint's rolling-hash-over-text machinery
    # is live inside duplicate_runs (rolling window hashes drive the
    # diagonal join) and dedup_exact (digest groupBy);
    # cutoff_widening's F10 widen-to-midnight timestamp arithmetic is
    # live inside crawl_delta (two-cutoff snapshot windows),
    # range_join_error_windows (integer-µs bucket math) and
    # recrawl_priority (epoch-µs spans). Slots freed for hits_scores +
    # phrase_search.
    "doc_fingerprint",
    "cutoff_widening",
    # r5 session 7b: frame_sample_plan's integer frame-schedule math
    # is the planning half of video_decode_stats, which is live and
    # exercises the same schedule against REAL decoded AVI frames
    # (multimodal.py); the pure-arithmetic variant stays compare.py-
    # verified. Slot freed for winnowing_pairs.
    "frame_sample_plan",
)

# Newest / riskiest queries go FIRST: CORRECTNESS_r04 truncated at
# insertion position 50, silently dropping the two freshest entries.
EARLY_ORDER = (
    "winnowing_pairs",
    "hits_scores",
    "phrase_search",
    "recrawl_priority",
    "tfidf_topterms",
    "dsir_logratio",
    "pmi_phrases",
    "stream_dedup_distinct",
    "link_pagerank",
    "anchor_text_agg",
    "crawl_delta",
    "semdedup_keep",
    "cms_heavy_hitters",
    "chunk_documents",
    "weighted_sample_topk",
    "exact_percentiles",
    "range_join_error_windows",
    "purchases_asof_clicks",
    "hll_distinct",
    "duplicate_runs",
    "bm25_topk",
    "resample_to_mix",
    "pq_codes",
    "pq_adc_topk",
    "video_decode_stats",
    "neardup_clusters",
    "wav_decode_stats",
    "image_decode_stats",
    "repetition_score",
    "contamination_check",
    "embedding_quantize",
    "sessionize_stateful_stream",
    "events_tumbling_agg",
    "crawl_bfs_depth",
    "link_extract_spans",
    "latest_pages",
)


# CORRECTNESS_r04 proved the driver records only the first 50
# queries() entries — entry #51 would silently lose driver coverage.
DRIVER_QUERY_CAP = 50


def _reorder(full: dict) -> dict:
    out = {k: full.pop(k) for k in EARLY_ORDER if k in full}
    for k in RETIRED_FROM_DRIVER:
        full.pop(k, None)
    out.update(full)
    assert len(out) <= DRIVER_QUERY_CAP, (
        f"{len(out)} registered queries exceed the driver's {DRIVER_QUERY_CAP}-row "
        "CORRECTNESS window — retire a redundant entry (RETIRED_FROM_DRIVER) "
        "before adding new ones"
    )
    return out


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle queries kept off the driver's 50-row window but still
    exercised by tools/compare.py and pytest."""
    return {
        "latest_pages_count": q_latest_pages_count,
        "ann_lsh_buckets": sim.QUERIES["ann_lsh_buckets"],
        "ivf_cells": sim.QUERIES["ivf_cells"],
        "href_token_extract": q_href_token_extract,
        "urls_fetched": q_urls_fetched,
        "multimodal_meta": multimodal_meta,
        "token_length_buckets": tx.QUERIES["token_length_buckets"],
        "sessionize_events": olap.QUERIES["sessionize_events"],
        "window_paginate_orders": olap.QUERIES["window_paginate_orders"],
        "stratified_sample": smp.QUERIES["stratified_sample"],
        "kmeans_cells": sim.QUERIES["kmeans_cells"],
        "ngram_jaccard_pairs": dd.QUERIES["ngram_jaccard_pairs"],
        "timestamp_arith": q_timestamp_arith,
        "url_by_id": q_url_by_id,
        "user_event_seq": smp.QUERIES["user_event_seq"],
        "monitored_alive": q_monitored_alive,
        "latest_pages_export": q_latest_pages_export,
        "date_format_events": olap.QUERIES["date_format_events"],
        "union_retries_dedup": q_union_retries_dedup,
        "topk_orders": q_topk_orders,
        "group_agg_lineitem": q_group_agg_lineitem,
        "domain_mix_weights": smp.QUERIES["domain_mix_weights"],
        "cosine_topk": sim.QUERIES["cosine_topk"],
        "minhash_signatures": dd.QUERIES["minhash_signatures"],
        "embedding_neardup_pairs": sim.QUERIES["embedding_neardup_pairs"],
        "ivf_topk": sim.QUERIES["ivf_topk"],
        "pages_by_url": q_pages_by_url,
        "token_count": tx.QUERIES["token_count"],
        "simhash": dd.QUERIES["simhash"],
        "doc_fingerprint": tx.QUERIES["doc_fingerprint"],
        "cutoff_widening": q_cutoff_widening,
        "frame_sample_plan": frame_sample_plan,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "latest_pages": q_latest_pages,
        "latest_pages_count": q_latest_pages_count,
        "latest_pages_export": q_latest_pages_export,
        "list_urls": q_list_urls,
        "url_by_id": q_url_by_id,
        "monitored_alive": q_monitored_alive,
        "pages_by_url": q_pages_by_url,
        "urls_never_fetched": q_urls_never_fetched,
        "urls_fetched": q_urls_fetched,
        "union_retries_dedup": q_union_retries_dedup,
        "topk_orders": q_topk_orders,
        "group_agg_lineitem": q_group_agg_lineitem,
        "scalar_string_funcs": q_scalar_string_funcs,
        "timestamp_arith": q_timestamp_arith,
        "href_token_extract": q_href_token_extract,
        "dedup_exact": q_dedup_exact,
        "delete_cascade": q_delete_cascade,
        "export_sanitized_paths": q_export_sanitized_paths,
        "cutoff_widening": q_cutoff_widening,
    }
    q.update(asf.QUERIES)
    q.update(gr.QUERIES)
    q.update(sk.QUERIES)
    q.update(st.QUERIES)
    q.update(itv.QUERIES)
    q.update(dd.QUERIES)
    q.update(ret.QUERIES)
    q.update(sim.QUERIES)
    q.update(tx.QUERIES)
    q.update(olap.QUERIES)
    q.update(smp.QUERIES)
    q["link_extract_spans"] = link_extract_spans
    q["crawl_bfs_depth"] = crawl_bfs_depth
    q["anchor_text_agg"] = anchor_text_agg
    q["crawl_delta"] = crawl_delta
    q["recrawl_priority"] = recrawl_priority
    q["events_tumbling_agg"] = lambda spark, sf_dir: tumbling_event_counts(
        load_table(spark, sf_dir, "events")
    )
    # genuine Structured Streaming stateful operator
    # (applyInPandasWithState); a single-file source drains in one
    # micro-batch, so the update-mode emissions ARE the final sessions
    # and the batch sessionizer's SQL oracle applies verbatim
    from webcrawlergo_spark.streaming.stateful import sessionize_stream

    q["sessionize_stateful_stream"] = sessionize_stream
    # streaming first-encounter dedup (the crawl seen-set contract as
    # a Structured Streaming state-store operator; batch twin =
    # SELECT DISTINCT)
    from webcrawlergo_spark.streaming.dedup_stream import stream_dedup_distinct

    q["stream_dedup_distinct"] = stream_dedup_distinct
    q["multimodal_meta"] = multimodal_meta
    q["frame_sample_plan"] = frame_sample_plan
    # real audio decode end-to-end: JVM-built WAV container, numpy
    # RIFF parser in mapInPandas, decoded-PCM md5 vs the oracle's
    # md5 of the original payload (multimodal.py r4)
    q["wav_decode_stats"] = wav_decode_stats
    # real image decode end-to-end (r5): JVM-built P6 container,
    # numpy PNM parser in mapInPandas, decoded-raster md5 vs oracle
    q["image_decode_stats"] = image_decode_stats
    # real video decode end-to-end (r5): JVM-built AVI container
    # (uncompressed 8-bit DIB frames), numpy RIFF/AVI parser in
    # mapInPandas, decoded-frame-stack md5 vs oracle
    q["video_decode_stats"] = video_decode_stats
    return _reorder(q)


def oracle_sql() -> dict[str, str]:
    o = {
        "latest_pages": _VIEWS_CTE
        + """
        , latest AS (
            SELECT p.*, ROW_NUMBER() OVER (
                PARTITION BY p.url_id ORDER BY p.added_at DESC, p.id DESC) AS rn
            FROM pages p)
        SELECT l.url_id, u.url, l.added_at, l.doc_id, u.is_monitored, u.is_alive
        FROM latest l JOIN urls u ON l.url_id = u.id
        WHERE l.rn = 1 ORDER BY l.url_id
        """,
        "latest_pages_count": _VIEWS_CTE
        + """
        , latest AS (
            SELECT p.*, ROW_NUMBER() OVER (
                PARTITION BY p.url_id ORDER BY p.added_at DESC, p.id DESC) AS rn
            FROM pages p)
        SELECT COUNT(*) AS n_latest
        FROM latest l JOIN urls u ON l.url_id = u.id WHERE l.rn = 1
        """,
        "latest_pages_export": _VIEWS_CTE
        + f"""
        , fp AS (SELECT * FROM pages WHERE added_at <= TIMESTAMP '{_CUTOFF}'),
        fu AS (SELECT * FROM urls
               WHERE url LIKE 'https://host1%' AND url LIKE '%/u/1%'),
        j AS (SELECT fp.id, fp.url_id, fu.url, fp.added_at, fp.doc_id
              FROM fp JOIN fu ON fp.url_id = fu.id),
        latest AS (SELECT j.*, ROW_NUMBER() OVER (
              PARTITION BY url_id ORDER BY added_at DESC, id DESC) AS rn FROM j)
        SELECT url_id, url, added_at, doc_id FROM latest WHERE rn = 1
        ORDER BY url_id
        """,
        "list_urls": _VIEWS_CTE
        + """
        SELECT * FROM urls
        WHERE url LIKE '%1%' AND is_alive = TRUE
        ORDER BY url DESC, id ASC LIMIT 10 OFFSET 10
        """,
        "url_by_id": _VIEWS_CTE + "SELECT * FROM urls WHERE id = 7",
        "monitored_alive": _VIEWS_CTE
        + "SELECT * FROM urls WHERE is_monitored AND is_alive ORDER BY id",
        "pages_by_url": _VIEWS_CTE
        + """
        SELECT p.id, p.url_id, p.added_at FROM pages p
        WHERE p.url_id = 3 AND EXISTS (SELECT 1 FROM urls u WHERE u.id = p.url_id)
        ORDER BY p.added_at DESC, p.id DESC
        """,
        "urls_never_fetched": _VIEWS_CTE
        + """
        SELECT u.* FROM urls u
        WHERE NOT EXISTS (SELECT 1 FROM pages p
                          WHERE p.url_id = u.id
                            AND p.added_at <= TIMESTAMP '2024-01-01 02:00:00')
        ORDER BY u.id
        """,
        "urls_fetched": _VIEWS_CTE
        + """
        SELECT u.* FROM urls u
        WHERE EXISTS (SELECT 1 FROM pages p WHERE p.url_id = u.id)
        ORDER BY u.id
        """,
        "union_retries_dedup": _VIEWS_CTE
        + """
        SELECT id, url FROM (
            SELECT id, url FROM urls WHERE url LIKE '%/u/1%'
            UNION
            SELECT id, url FROM urls WHERE url LIKE '%/u/2%') t
        ORDER BY id
        """,
        "topk_orders": """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "group_agg_lineitem": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        "scalar_string_funcs": _VIEWS_CTE
        + """
        SELECT id,
               regexp_replace(trim(url || '/'), '/+$', '') AS href_norm,
               lower(url) AS url_lower,
               (url LIKE 'https://host1%') AS is_host1
        FROM urls ORDER BY id
        """,
        "timestamp_arith": _VIEWS_CTE
        + f"""
        SELECT id, url_id, added_at FROM pages
        WHERE added_at + INTERVAL 2 DAY <= TIMESTAMP '{_CUTOFF}'
        ORDER BY id
        """,
        "href_token_extract": tx.TOKEN_EXTRACT_SQL,
        "dedup_exact": dd.DEDUP_EXACT_SQL,
        "delete_cascade": _VIEWS_CTE
        + """
        , kept AS (SELECT * FROM urls WHERE id % 11 <> 0),
        kp AS (SELECT * FROM pages WHERE url_id NOT IN
               (SELECT id FROM urls WHERE id % 11 = 0)),
        c AS (SELECT url_id, COUNT(*) AS n_pages FROM kp GROUP BY url_id)
        SELECT k.id, k.url, k.is_monitored, k.is_alive,
               COALESCE(c.n_pages, 0) AS n_pages
        FROM kept k LEFT JOIN c ON k.id = c.url_id ORDER BY k.id
        """,
        "cutoff_widening": _VIEWS_CTE
        + """
        SELECT id, url_id, added_at FROM pages
        WHERE added_at <= TIMESTAMP '2024-01-02 00:00:00'
                          + INTERVAL 24 HOUR - INTERVAL 1 SECOND
        ORDER BY id
        """,
        "export_sanitized_paths": _VIEWS_CTE
        + r"""
        , latest AS (
            SELECT p.*, u.url, ROW_NUMBER() OVER (
                PARTITION BY p.url_id ORDER BY p.added_at DESC, p.id DESC) AS rn
            FROM pages p JOIN urls u ON p.url_id = u.id)
        SELECT url_id,
               '/u/' || url_id || '/' ||
               replace(regexp_replace('f le:' || url_id || '&v',
                                      '[<>:"/\\|?* ]', '_', 'g'),
                       '&', '%26')
               || '_' || strftime(added_at, '%Y-%m-%d_%H-%M-%S') || '.html'
                   AS rel_path
        FROM latest WHERE rn = 1 ORDER BY url_id
        """,
    }
    o.update(asf.ORACLES)
    o.update(gr.ORACLES)
    o.update(sk.ORACLES)
    o.update(st.ORACLES)
    o.update(itv.ORACLES)
    o.update(dd.ORACLES)
    o.update(ret.ORACLES)
    o.update(sim.ORACLES)
    o.update(tx.ORACLES)
    o.update(olap.ORACLES)
    o.update(smp.ORACLES)
    from webcrawlergo_spark.operators.crawl_queries import CRAWL_ORACLES

    o.update(CRAWL_ORACLES)
    o["events_tumbling_agg"] = TUMBLING_SQL
    o["sessionize_stateful_stream"] = olap.SESSIONIZE_SQL
    from webcrawlergo_spark.streaming.dedup_stream import STREAM_DEDUP_SQL

    o["stream_dedup_distinct"] = STREAM_DEDUP_SQL
    o["multimodal_meta"] = MULTIMODAL_META_SQL
    o["frame_sample_plan"] = FRAME_SAMPLE_SQL
    o["wav_decode_stats"] = WAV_DECODE_STATS_SQL
    o["image_decode_stats"] = IMAGE_DECODE_STATS_SQL
    o["video_decode_stats"] = VIDEO_DECODE_STATS_SQL
    return o
