"""Bucketed co-located join/window: the flagship plan over tables
bucketed on the key must contain FEWER shuffles than over plain
parquet — asserted on the physical plan, not assumed."""

from pyspark.sql import functions as F

from webcrawlergo_spark.sources.bucketed import (
    bucketed_latest_pages,
    n_exchanges,
    write_bucketed,
)
from webcrawlergo_spark.operators.window import latest_pages
from webcrawlergo_spark.sources.crawlviews import pages_view, urls_view
from webcrawlergo_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_flagship_sheds_exchanges(spark):
    ev = load_table(spark, SF_DIR, "events")
    urls, pages = urls_view(ev), pages_view(ev)
    write_bucketed(urls.withColumnRenamed("id", "url_id"), "b_urls", ["url_id"], 8, ["url_id"])
    write_bucketed(pages, "b_pages", ["url_id"], 8, ["url_id"])

    plain = latest_pages(pages, urls)
    bucketed = latest_pages(
        spark.table("b_pages"), spark.table("b_urls").withColumnRenamed("url_id", "id")
    )
    # same result rows
    key = lambda rows: sorted((r["url_id"], r["doc_id"], r["added_at"]) for r in rows)
    assert key(bucketed.collect()) == key(plain.collect())
    # and strictly fewer exchanges (the pages-side window/join shuffle
    # is satisfied by the bucket layout)
    n_plain, n_bucketed = n_exchanges(plain), n_exchanges(bucketed)
    assert n_bucketed < n_plain, (n_bucketed, n_plain)


def test_bucketed_join_is_exchange_free_on_join_side(spark):
    ev = load_table(spark, SF_DIR, "events")
    pages = pages_view(ev)
    write_bucketed(pages, "b_pages2", ["url_id"], 8, ["url_id"])
    agg = spark.table("b_pages2").groupBy("url_id").agg(F.count("*").alias("n"))
    agg.collect()
    # a groupBy on the bucket key needs no exchange at all
    assert n_exchanges(agg) == 0, agg._jdf.queryExecution().executedPlan().toString()
