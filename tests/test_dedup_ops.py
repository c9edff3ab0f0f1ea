"""Dedup-operator guards that the SQL oracle can't express: the LSH
candidate generators must actually GENERATE candidates on the fixture
corpora (an empty bucket-collision set would make the oracle
comparison pass vacuously without exercising the Jaccard arithmetic),
and the codegen regex shingler must equal the split-based definition
the oracle uses."""

from pyspark.sql import functions as F

from webcrawlergo_spark.operators.dedup import (
    _shingles,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_candidate_sets_nonvacuous(spark):
    for fn in (minhash_lsh_pairs, ngram_jaccard_pairs):
        df = fn(spark, SF_DIR)
        rows = df.collect()
        assert rows, f"{fn.__name__} produced no verified pairs on the fixture"
        # verified scores are true Jaccards: bounded and positive
        assert all(0.0 < r["jaccard"] <= 1.0 for r in rows)


def _split_shingles(col, n):
    """The r3 split+transform definition — the DuckDB oracle's exact
    semantics, kept here as the reference the regex impl must match."""
    toks = F.split(col, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def test_regex_shingles_equal_split_definition(spark):
    """The regex-lookahead shingler (one codegen pass, ~9× the HOF
    speed) is bit-identical to the split-based oracle definition on
    clean single-space-delimited text — the entire documents corpus
    plus hand-picked edge strings (short docs, exactly-n tokens,
    repeats). Null-safe comparison so a NULL shingle array can never
    pass vacuously (review r4)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    # the corpus must BE clean, or the oracle equivalence claim is void
    assert (
        docs.filter(
            F.col("text").rlike("  ")
            | F.col("text").startswith(" ")
            | F.col("text").endswith(" ")
        ).count()
        == 0
    )
    edges = spark.createDataFrame(
        [("",), ("one",), ("a b",), ("a b c",), ("a b c d",), ("x x x x x",)],
        "text string",
    )
    for n in (2, 3):
        for frame in (docs, edges):
            bad = (
                frame.select(
                    F.array_sort(_shingles(F.col("text"), n=n)).alias("a"),
                    F.array_sort(_split_shingles(F.col("text"), n=n)).alias("b"),
                )
                .filter(~F.col("a").eqNullSafe(F.col("b")))
                .count()
            )
            assert bad == 0, f"n={n}: {bad} mismatching docs"


def test_regex_shingles_boundary_space_divergence_is_as_documented(spark):
    """Where split would produce EMPTY tokens (leading/trailing/double
    spaces) the regex diverges from the split definition — pin the
    exact behavior so it can never silently widen: leading/trailing
    spaces are ignored, and a MULTI-space run is a hard break (no
    shingle spans it — the window needs n tokens separated by single
    spaces)."""
    frame = spark.createDataFrame(
        [(" a b c",), ("a b c ",), ("a  b c d",)], "text string"
    )
    rows = frame.select(
        "text", F.array_sort(_shingles(F.col("text"), n=3)).alias("got")
    ).collect()
    want = {
        " a b c": ["a b c"],
        "a b c ": ["a b c"],
        "a  b c d": ["b c d"],  # 'a' is cut off by the double space
    }
    for r in rows:
        assert sorted(r["got"]) == want[r["text"]], (r["text"], r["got"])


def test_shingles_null_text_yields_empty_array(spark):
    """ADVICE r4: NULL text must shingle to [] (the pre-regex split/
    transform contract), not NULL — downstream explode/minhash relies
    on empty-not-null."""
    from pyspark.sql import functions as F

    from webcrawlergo_spark.operators.dedup import _shingles

    df = spark.createDataFrame(
        [("a b c d e f",), (None,), ("",)], "text string"
    ).select(_shingles(F.col("text")).alias("sh"))
    rows = df.collect()
    assert all(r["sh"] is not None for r in rows)
    assert rows[1]["sh"] == [] and rows[2]["sh"] == []
    assert len(rows[0]["sh"]) > 0


# --------------------------------------------------------------------------
# Connected components (r5): hash-min label propagation vs union-find
# --------------------------------------------------------------------------


def _union_find_components(edges):
    """Pure-python oracle: classic union-find, relabeled to min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for x in list(parent):
        roots.setdefault(find(x), []).append(x)
    out = {}
    for members in roots.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_connected_components_hand_graph(spark):
    """Two components incl. a transitive chain (A~B, B~C must merge)
    plus an isolated pair; labels must be the min id per component."""
    from webcrawlergo_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 5: 5, 6: 5}


def test_connected_components_random_vs_union_find(spark):
    """Seeded random graph (chains, stars, singleton pairs) against the
    union-find oracle — exercises multi-round convergence."""
    import random

    from webcrawlergo_spark.operators.dedup import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    # add a long chain: worst-case diameter for hash-min propagation
    edges += [(1000 + i, 1000 + i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


def test_connected_components_nonconvergence_raises(spark):
    """A chain longer than max_iter must raise loudly, never return a
    half-merged labeling (the dedup keep-rule would silently keep
    extra copies)."""
    import pytest

    from webcrawlergo_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_neardup_clusters_consistent_with_pairs(spark):
    """Every LSH pair must land in the same cluster; every cluster id
    must be the min doc_id of its members; canonical flags mark
    exactly the min."""
    from webcrawlergo_spark.operators.dedup import minhash_lsh_pairs, neardup_clusters

    pairs = minhash_lsh_pairs(spark, SF_DIR).collect()
    assert pairs, "fixture produced no near-dup pairs"
    clusters = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(spark, SF_DIR).collect()}
    for p in pairs:
        assert clusters[p["doc_a"]] == clusters[p["doc_b"]]
    members = {}
    for doc, c in clusters.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)
