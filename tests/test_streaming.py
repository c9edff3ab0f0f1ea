"""Structured Streaming surface: the streaming tumbling-window query
must agree with its batch twin on the same input (memory sink drained
synchronously via processAllAvailable)."""

from webcrawlergo_spark.sources.tpch import load_table
from webcrawlergo_spark.streaming.windowed import (
    tumbling_event_counts,
    tumbling_event_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    batch = tumbling_event_counts(load_table(spark, SF_DIR, "events"))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    stream = tumbling_event_counts_stream(spark, SF_DIR, query_name="t_out")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream.collect()
    }
    assert got == want
    assert len(got) > 10
