"""X1 extraction order: the posexplode pipeline must yield hrefs in
exact document order (span offset, then anchor position) — equal to
the golden's sequential anchor walk per doc."""

from pyspark.sql import functions as F

from webcrawlergo_spark.golden import extract_hrefs
from webcrawlergo_spark.operators.linkextract import extract_links


def test_extraction_order_matches_golden(spark, web, web_dfs):
    got = (
        extract_links(web_dfs["docs"])
        .orderBy("doc_id", "span_offset", "link_pos")
        .select("doc_id", "raw_href")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["raw_href"])
    for page in web.pages.values():
        want = extract_hrefs(page["spans"])
        assert by_doc.get(page["doc_id"], []) == want


def test_media_spans_yield_no_links(spark, web_dfs):
    media_only = web_dfs["docs"].select(
        "doc_id", F.filter("spans", lambda s: s["kind"] == "media").alias("spans")
    )
    assert extract_links(media_only).count() == 0
