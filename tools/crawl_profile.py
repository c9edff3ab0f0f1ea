"""One profiled crawl leg (bench.py's exact-mode workload) with
per-phase debug timing + an explicit tail-accounting split.

Usage: python tools/crawl_profile.py [n_pages] [seen_mode]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import crawl_bench, make_spark  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "exact"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cpus)
    # JIT warmup at quarter scale, exactly like bench.py
    crawl_bench(spark, max(10_000, n_pages // 4), seen_mode=mode)
    print("=== measured leg ===", flush=True)

    # replicate crawl_bench but with debug_timing + a tail split
    from pyspark.sql import functions as F

    from webcrawlergo_spark.plans.wave import CrawlConfig, CrawlEngine
    from webcrawlergo_spark.sources.synthweb import scale_web_df

    web = scale_web_df(spark, n_pages=n_pages, links_per_page=16).localCheckpoint(eager=True)
    filler = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("page_id"), i), 99991).cast("string")),
        ),
    )
    docs = web.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.concat_ws(
                    " ",
                    filler,
                    F.concat_ws(
                        " ",
                        F.transform(F.col("links"), lambda l: F.concat(F.lit('some text <a href="'), l, F.lit('"> anchor'))),
                    ),
                    filler,
                ).alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    ).localCheckpoint(eager=True)
    index = web.select("url", "doc_id", F.lit(200).alias("status"), F.lit(0).alias("fail_times"))
    index = index.localCheckpoint(eager=True)
    seed_url = web.filter(F.col("page_id") == 0).select("url").collect()[0]["url"]
    seeds = (
        web.filter((F.col("page_id") % 20 == 0) & (F.col("page_id") != 0))
        .select(
            "url", "host", F.lit(0).alias("depth"),
            F.lit(-1).cast("long").alias("parent_rank"),
            F.col("page_id").cast("int").alias("span_offset"),
            F.lit(0).alias("link_pos"),
            F.lit(False).alias("should_fetch"), F.lit(0).alias("retry_count"),
        )
        .localCheckpoint(eager=True)
    )
    cfg = CrawlConfig(
        base_url=seed_url, marked_paths=[], ignore_patterns=[], retry_times=0,
        same_host_only=False, seen_mode=mode, analyze_pages=True, content_minhash=True,
    )
    eng = CrawlEngine(spark, index, docs, [], cfg)
    t0 = time.time()
    res = eng.run(extra_frontier=seeds, debug_timing=True)
    t_loop = time.time()
    n_events = res.events.count()
    t_ev = time.time()
    n_stats = res.page_stats.count()
    t_st = time.time()
    print(
        f"loop={t_loop-t0:.2f}s events.count={t_ev-t_loop:.2f}s "
        f"page_stats.count={t_st-t_ev:.2f}s total={t_st-t0:.2f}s "
        f"events={n_events} stats={n_stats} waves={res.waves} "
        f"urls_per_sec={n_events/(t_st-t0):.1f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
