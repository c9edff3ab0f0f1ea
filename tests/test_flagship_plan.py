"""Flagship (W1 latest-pages) physical-plan assertions.

BENCH.md's plan claims, enforced by CI instead of narrated:
- the rn=1 window filter is pushed into the shuffle as a
  WindowGroupLimit (per-partition top-1 before the exchange — the
  property that keeps the window linear at 10^10 pages);
- no side of the join carries a forced broadcast hint (the urls
  registry is NOT broadcastable at the design point; strategy choice
  belongs to AQE, which picks broadcast at small scale from runtime
  stats — a hint would hard-code a driver OOM);
- the pages scan is pruned to the columns the query needs, not the
  full events schema (column pruning reached the reader).
"""

from webcrawlergo_spark.operators.window import latest_pages
from webcrawlergo_spark.sources.crawlviews import pages_view, urls_view
from webcrawlergo_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _flagship(spark):
    ev = load_table(spark, SF_DIR, "events")
    return latest_pages(pages_view(ev), urls_view(ev))


def test_flagship_latest_is_partial_aggregate(spark):
    """r6: the latest-row-per-url selection must be a max(struct)
    AGGREGATE with a map-side partial (one surviving row per url per
    input partition crosses the exchange, no sort) — not a window,
    which even with its WindowGroupLimit top-1 push-down paid a
    per-partition sort plus a post-shuffle sort."""
    df = _flagship(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_flagship_no_forced_broadcast(spark):
    df = _flagship(spark)
    # a user-forced broadcast() shows up as hint NODES in the logical
    # plans; AQE's own runtime broadcast choice does not. Assert on the
    # structural markers only — a bare 'broadcast' substring scan broke
    # on any column/relation name containing the word (ADVICE r3).
    analyzed = df._jdf.queryExecution().analyzed().toString()
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in analyzed and "ResolvedHint" not in analyzed, analyzed
    # post-optimization a hint survives as Join ... Hint=(strategy=broadcast)
    assert "strategy=broadcast" not in optimized, optimized


def test_flagship_scan_is_pruned(spark):
    df = _flagship(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # events carries the full crawl-event schema; the flagship needs
    # only the page/url projection — the reader schema must not
    # mention event-only payload columns
    assert "event_type" not in plan, plan


def test_ivf_assignment_is_partial_aggregate(spark):
    """The IVF cell assignment must be a max_by AGGREGATE with a
    map-side partial (corpus×cells rows collapse before the exchange)
    — not a Window.partitionBy(vec_id) pushing every row through the
    shuffle (the r2 shape)."""
    from webcrawlergo_spark.operators.similarity import ivf_cells

    df = ivf_cells(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan


def test_dedup_family_partial_aggregates(spark):
    """The dedup/minhash/simhash shapes must show map-side partial
    aggregation in the physical plan — the property that bounds their
    shuffle volume to one combined row per key per input partition
    (BENCH.md's 'map-side combine' claims, enforced)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    # merged surface: retired-from-driver entries keep their plan gates
    qs = {**entry.retired_queries(), **entry.queries()}
    for name, marker in (
        ("minhash_signatures", "partial_min"),
        ("simhash", "partial_sum"),
        ("dedup_exact", "partial_min"),  # min(doc_id) keeper per fp
    ):
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert marker in plan, (name, plan)


def test_bucket_udf_equals_jvm_fold(spark):
    """The vectorized Arrow bucket/norm twin must agree with the
    JVM-expression fold BIT-FOR-BIT over the whole testdata corpus
    (the urlnorm dual-path pattern: same op order, CI-pinned)."""
    from pyspark.sql import functions as F

    from webcrawlergo_spark.operators.similarity import (
        _bucket_col,
        _bucket_nv_struct,
        _dot,
        _vecs,
    )

    vecs = _vecs(spark, SF_DIR)
    both = vecs.withColumn("_bn", _bucket_nv_struct(F.col("v"))).select(
        "vec_id",
        F.col("_bn.bucket").alias("b_udf"),
        F.col("_bn.nv").alias("nv_udf"),
        _bucket_col(F.col("v")).cast("int").alias("b_jvm"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nv_jvm"),
    )
    bad = both.filter(
        (F.col("b_udf") != F.col("b_jvm")) | (F.col("nv_udf") != F.col("nv_jvm"))
    ).count()
    assert bad == 0


def test_pq_plan_shapes(spark):
    """PQ plan claims (COVERAGE.md), enforced:
    - the encode's per-subspace argmins are min_by AGGREGATES with a
      map-side partial (vec×codeword rows collapse before the single
      vec_id exchange — the IVF assignment argument ×8);
    - ADC scoring never shuffles on a plain per-query window: the
      shortlist cut is the salted two-phase top-K, so every Window in
      the plan partitions on a salt column too or sees only bounded
      survivor rows;
    - the codebook and distance-table sides are broadcast (the codes
      table is the only large join input)."""
    from webcrawlergo_spark.operators.similarity import pq_adc_topk, pq_codes

    enc_plan = pq_codes(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in enc_plan, enc_plan
    assert "Window" not in enc_plan, enc_plan

    df = pq_adc_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # the corpus-sized ADC scan must reach its shortlist cut through
    # the salted phase-1 window, not one window partitioned on
    # query_id alone over every candidate
    assert "_salt" in plan, plan
