"""Structured-Streaming surface (SURVEY §2.9).

The reference's crawl loop is a continuous pull-loop; the engine's
primary re-expression is the batch wave loop (plans/wave.py). This
module adds the genuinely-streaming surface for event-log analytics:
watermarked tumbling-window aggregation over the ``events`` table,
runnable either as a batch plan (for the DuckDB oracle) or as a
``readStream`` → memory-sink streaming query (tested for equality
with the batch result in tests/test_streaming.py).

At scale the source is Kafka/files and the sink is the checkpoint
store; locally the parquet file source drives the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WINDOW_SECONDS = 300


def tumbling_event_counts(events: DataFrame) -> DataFrame:
    """Batch shape: 5-minute tumbling windows per event_type.

    Window start is computed as epoch arithmetic (not F.window) so the
    identical expression exists in ANSI SQL for the oracle; values are
    bit-equal to F.window's bucketing for positive epochs.
    """
    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / WINDOW_SECONDS) * WINDOW_SECONDS
    ).alias("window_start")
    return (
        events.groupBy(bucket, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = f"""
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / {WINDOW_SECONDS}) * {WINDOW_SECONDS} AS BIGINT))
           AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def tumbling_event_counts_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "tumbling_out"
) -> "DataFrame":
    """The same aggregation as a Structured Streaming query: parquet
    file source → watermark → window agg → complete-mode memory sink.
    Returns the in-memory result table after draining all available
    input (synchronous for local testing)."""
    import hashlib
    import os

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file streaming source wants a *directory*; stage the single
    # parquet file behind a symlink dir (read-only testdata untouched)
    stage = os.path.join(
        "/tmp", "webcrawlergo_stream_src", hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    stream = (
        spark.readStream.schema(batch_schema)
        .parquet(stage)
        # watermarks require TIMESTAMP (tz-aware); parquet stores NTZ —
        # session tz is pinned UTC so the cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{WINDOW_SECONDS} seconds").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "approx_users")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
