"""Link-graph analytics over the crawl's deterministic edge set.

``link_pagerank`` is the frontier-prioritization operator the
reference's FIFO queue does not have but any large crawler grows
into (reference queue/queue.go:99-141 processes strictly
first-encounter order; a 10^10-URL frontier wants authority-biased
scheduling): fixed-iteration PageRank over the same deterministic
link graph crawl_bfs_depth walks (operators/crawl_queries.py
``edges_df``).

Determinism across Spark / DuckDB / Python is the hard part — a
float power-iteration sums contributions in shuffle order, and IEEE
addition is not associative, so two runs (let alone two engines)
disagree in the last ulps. The whole iteration therefore runs on an
exact INTEGER lattice (the kmeans-codebook trick, similarity.py):

- ranks are BIGINTs in units of 10^-12 (SCALE = 10^12);
- a node's per-edge contribution is ``rank DIV out_degree`` —
  integer floor division, exact in Spark (``DIV``), DuckDB (``//``)
  and Python (``//``) for non-negative operands;
- the damped update is ``base + (85 * Σcontrib) DIV 100`` with
  ``base = (15 * (SCALE DIV n)) DIV 100`` — all BIGINT ops
  (Σcontrib ≤ total mass ≈ 10^12, so 85·Σ < 2^63);
- integer sums are order-independent under parallel aggregation, so
  the result is bit-identical regardless of partitioning.

The floor divisions leak ≤1 ulp of mass per node per iteration —
PageRank-with-quantization, converging to the same ordering; the
oracle replays the identical lattice so the gate is exact equality,
not a tolerance.

Scale shape (10^10 nodes): the edge set is checkpointed once and
re-partitioned by src; each iteration is one join on the rank key +
one map-side-combining groupBy(dst) — two key-only shuffles per
iteration, no driver state beyond n (metadata). The per-iteration
eager localCheckpoint truncates the 5-deep lineage exactly like the
wave loop (plans/wave.py) and the BFS (crawl_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .crawl_queries import _EDGE_MULS, edges_df

PR_SCALE = 10**12
PR_ITER = 5
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def pagerank_frame(nodes: DataFrame, edges: DataFrame, n_nodes: int,
                   n_iter: int = PR_ITER) -> DataFrame:
    """Fixed-iteration integer-lattice PageRank.

    ``nodes``: (node bigint); ``edges``: (src, dst) — every src must
    have out-degree ≥ 1 (true for the crawl graph: each doc links
    out; a dangling-mass term would otherwise be added to ``base``).
    """
    r0 = PR_SCALE // n_nodes
    base = (15 * r0) // 100
    edges = edges.localCheckpoint(eager=True)
    odeg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("odeg"))
    # out-degree travels with the rank so each iteration joins once
    state = nodes.join(odeg, nodes.node == odeg.src).select(
        "node", "odeg", F.lit(r0).cast("bigint").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = (
            state.join(edges, state.node == edges.src)
            .select("dst", F.expr("r DIV odeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        carried = state.select("node", "odeg")
        state = (
            carried.join(contrib, carried.node == contrib.dst, "left")
            .select(
                "node",
                "odeg",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(f"({_DAMP_NUM} * coalesce(s, CAST(0 AS BIGINT))) DIV {_DAMP_DEN}")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("node", F.col("r").alias("pr_scaled"))


def link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the deterministic doc link graph; ranks in exact
    10^-12 units (BIGINT) so the oracle gate is bit-equality."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return pagerank_frame(nodes, edges_df(docs), n).orderBy("node")


def _pagerank_sql(n_iter: int = PR_ITER) -> str:
    """The identical lattice unrolled as chained CTEs."""
    edges_union = " UNION ".join(
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" CAST((doc_id * {a} + {b}) % (SELECT n_docs FROM n) AS BIGINT) AS dst"
        f" FROM documents"
        for a, b in _EDGE_MULS
    )
    r0 = f"CAST({PR_SCALE} // (SELECT n_docs FROM n) AS BIGINT)"
    base = f"CAST((15 * ({PR_SCALE} // (SELECT n_docs FROM n))) // 100 AS BIGINT)"
    ctes = [
        f"n AS (SELECT COUNT(*) AS n_docs FROM documents)",
        f"edges AS ({edges_union})",
        "nodes AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        "odeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, {r0} AS r FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
  SELECT nd.node,
         CAST({base} + ({_DAMP_NUM} * COALESCE(s.c, 0)) // {_DAMP_DEN} AS BIGINT) AS r
  FROM nodes nd LEFT JOIN (
      SELECT e.dst AS node, CAST(SUM(p.r // o.odeg) AS BIGINT) AS c
      FROM {prev} p JOIN odeg o ON o.src = p.node
      JOIN edges e ON e.src = p.node
      GROUP BY e.dst) s ON nd.node = s.node)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS pr_scaled FROM r{n_iter} ORDER BY node"
    )


LINK_PAGERANK_SQL = _pagerank_sql()

QUERIES = {"link_pagerank": link_pagerank}
ORACLES = {"link_pagerank": LINK_PAGERANK_SQL}
