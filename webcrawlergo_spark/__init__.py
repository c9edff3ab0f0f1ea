"""webcrawlergo_spark — a PySpark-native crawl-analytics engine.

A from-scratch re-expression of the capabilities of the Go reference
``0x00f00bar/webcrawlerGo`` (URL frontier + fetch scheduler + link
extraction + relational query API) as idiomatic Spark: DataFrame/SQL
plans optimized by Catalyst, vectorized pandas/Arrow UDFs on the few
paths built-ins cannot express, and an iterative wave-loop frontier
engine with Parquet-manifest checkpointing (Iceberg-compatible
interface; the sandbox image carries no Iceberg jar).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``schemas``    explicit StructTypes for every engine table
- ``sources``    testdata loaders + deterministic synthetic-web generator
- ``functions``  scalar/vectorized function library (URL canonicalizer,
                 text analysis, portable hashes)
- ``operators``  relational + dedup/similarity operator library
- ``plans``      the crawl wave-loop driver, checkpoint store, lineage
- ``streaming``  structured-streaming wrappers
"""

__version__ = "0.1.0"
