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
    # pre-partition the edge set on the per-iteration join key BEFORE
    # the one-time checkpoint (r6): LogicalRDD keeps the hash(src)
    # partitioning, so every iteration's state⋈edges join sheds the
    # edge-side exchange — measured 2.7 → 1.7 s warm at sf1.0 (and the
    # variance collapses). Partition count = shuffle.partitions so
    # EnsureRequirements recognizes the distribution.
    n_shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.repartition(n_shuf, F.col("src")).localCheckpoint(eager=True)
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


# --------------------------------------------------------------------------
# HITS hubs & authorities — the complementary link-analysis signal
# --------------------------------------------------------------------------

HITS_SCALE = 10**9
HITS_ITER = 5


def hits_frame(nodes: DataFrame, edges: DataFrame, n_nodes: int,
               n_iter: int = HITS_ITER) -> DataFrame:
    """Fixed-iteration integer-lattice HITS (Kleinberg 1999): a good
    hub links to good authorities (h ← Σ a over out-edges), a good
    authority is linked from good hubs (a ← Σ h over in-edges).
    Complements PageRank for crawl scheduling: authority ranks WHERE
    to spend fetch budget, hub ranks which pages to re-parse for
    frontier discovery.

    Same determinism discipline as ``pagerank_frame``: scores are
    BIGINTs in 10^-9 units; the classical per-iteration L2
    normalization (a float sqrt) is replaced by exact L1 rescaling
    onto the lattice, ``(raw * SCALE) DIV Σraw`` — same fixed point
    up to the norm choice, and every op is order-independent integer
    arithmetic, so Spark/DuckDB/Python agree bit-for-bit.

    Overflow audit (why SCALE is 10^9 here, not PageRank's 10^12):
    after rescaling Σh = Σa ≤ SCALE, so every raw score ≤ SCALE and
    the rescale numerator raw·SCALE ≤ 10^18 < 2^63; the L1 totals are
    ≤ SCALE·max_degree. At 10^12 the numerator would overflow.

    Scale shape: per iteration, two rank-key joins against the
    checkpointed edge set + two map-side-combining groupBys + two
    1-row L1 totals (crossJoin-broadcast) — no driver state, lineage
    truncated per iteration exactly like the wave loop."""
    from pyspark.sql import Observation

    # two pre-partitioned copies of the edge set, one per join
    # orientation (r6, the pagerank_frame trick doubled): the hub
    # half-step joins on src, the authority half-step on dst — each
    # iteration sheds BOTH edge-side exchanges for the price of
    # checkpointing the (small, key-only) edge list twice. At 10^10
    # edges this is the standard both-ways edge partitioning
    # trade — storage for per-round network.
    n_shuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e_src = edges.repartition(n_shuf, F.col("src")).localCheckpoint(eager=True)
    e_dst = edges.repartition(n_shuf, F.col("dst")).localCheckpoint(eager=True)
    zero = F.lit(0).cast("bigint")
    h = nodes.select(
        "node", F.lit(HITS_SCALE // n_nodes).cast("bigint").alias("h")
    ).localCheckpoint(eager=True)
    a = None
    # zero-score nodes are dropped from the in-flight state, not
    # carried: a missing row contributes exactly 0 to every Σ (the
    # groupBy sums and the L1 totals alike), so the per-iteration
    # left-join against the node universe would buy nothing but two
    # extra exchanges per iteration — zeros rejoin once at the end.
    #
    # r6 (VERDICT item 3): each half-step's L1 total rides an
    # OBSERVATION on the raw-score checkpoint job — the crawl_bfs
    # trick — so the rescale is a narrow literal division over the
    # checkpointed frame instead of a crossJoin-broadcast whose
    # subquery re-aggregated the half-step, and the rescaled frame
    # needs no checkpoint of its own (its lineage is one projection
    # deep). Two jobs per iteration instead of four; identical
    # integers (the total is the same BIGINT sum either way).
    def _rescale(raw: DataFrame, col: str, out: str) -> DataFrame:
        obs = Observation()
        raw = raw.observe(obs, F.sum(col).cast("bigint").alias("tot")).localCheckpoint(
            eager=True
        )
        tot = obs.get["tot"]  # None only on an empty edge set
        tot_sql = "NULL" if tot is None else str(int(tot))
        return raw.select(
            "node",
            F.expr(
                f"({col} * CAST({HITS_SCALE} AS BIGINT)) DIV CAST({tot_sql} AS BIGINT)"
            ).alias(out),
        )

    for _ in range(n_iter):
        ar = (
            h.join(e_src, h.node == e_src.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").cast("bigint").alias("ar"))
        )
        a = _rescale(ar, "ar", "a")
        hr = (
            a.join(e_dst, a.node == e_dst.dst)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").cast("bigint").alias("hr"))
        )
        h = _rescale(hr, "hr", "h")
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", zero).alias("hub_9"),
            F.coalesce("a", zero).alias("auth_9"),
        )
    )


def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the deterministic doc link graph; hub/authority in
    exact 10^-9 units (BIGINT) so the oracle gate is bit-equality."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    return hits_frame(nodes, edges_df(docs), n).orderBy("node")


def _hits_sql(n_iter: int = HITS_ITER) -> str:
    """The identical HITS lattice unrolled as chained CTEs."""
    edges_union = " UNION ".join(
        f"SELECT CAST(doc_id AS BIGINT) AS src,"
        f" CAST((doc_id * {a} + {b}) % (SELECT n_docs FROM n) AS BIGINT) AS dst"
        f" FROM documents"
        for a, b in _EDGE_MULS
    )
    # MATERIALIZED is load-bearing: each a{i}r/h{i}r is referenced
    # twice (rescale + its L1 total) and each level references the
    # previous one, so DuckDB's default CTE inlining re-expands the
    # tree 2^(2·n_iter) times — measured as "Too many open files" on
    # the documents parquet before the first row.
    ctes = [
        "n AS MATERIALIZED (SELECT COUNT(*) AS n_docs FROM documents)",
        f"edges AS MATERIALIZED ({edges_union})",
        "nodes AS MATERIALIZED"
        " (SELECT CAST(doc_id AS BIGINT) AS node FROM documents)",
        f"h0 AS (SELECT node, CAST({HITS_SCALE} // (SELECT n_docs FROM n)"
        f" AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""a{i}r AS MATERIALIZED (
  SELECT nd.node, CAST(COALESCE(s.c, 0) AS BIGINT) AS ar
  FROM nodes nd LEFT JOIN (
      SELECT e.dst AS node, CAST(SUM(p.h) AS BIGINT) AS c
      FROM h{i - 1} p JOIN edges e ON e.src = p.node GROUP BY e.dst) s
    ON nd.node = s.node)"""
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT node, CAST((ar * {HITS_SCALE}) //"
            f" (SELECT CAST(SUM(ar) AS BIGINT) FROM a{i}r) AS BIGINT) AS a"
            f" FROM a{i}r)"
        )
        ctes.append(
            f"""h{i}r AS MATERIALIZED (
  SELECT nd.node, CAST(COALESCE(s.c, 0) AS BIGINT) AS hr
  FROM nodes nd LEFT JOIN (
      SELECT e.src AS node, CAST(SUM(p.a) AS BIGINT) AS c
      FROM a{i} p JOIN edges e ON e.dst = p.node GROUP BY e.src) s
    ON nd.node = s.node)"""
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT node, CAST((hr * {HITS_SCALE}) //"
            f" (SELECT CAST(SUM(hr) AS BIGINT) FROM h{i}r) AS BIGINT) AS h"
            f" FROM h{i}r)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT h.node, h.h AS hub_9, a.a AS auth_9
FROM h{n_iter} h JOIN a{n_iter} a ON h.node = a.node ORDER BY h.node"""
    )


HITS_SCORES_SQL = _hits_sql()

QUERIES = {"link_pagerank": link_pagerank, "hits_scores": hits_scores}
ORACLES = {"link_pagerank": LINK_PAGERANK_SQL, "hits_scores": HITS_SCORES_SQL}
