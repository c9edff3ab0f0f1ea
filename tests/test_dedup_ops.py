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


def _golden_duplicate_runs(texts, n, min_run, max_df):
    """Pure-Python reference for duplicate_runs_df: grams → df
    band-pass → match diagonals → maximal islands."""
    grams = {}  # gram -> list[(doc, pos)]
    for doc, text in texts:
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            grams.setdefault(" ".join(toks[i : i + n]), []).append((doc, i))
    matches = {}  # (doc_a, doc_b) -> set[(pos_a, pos_b)]
    for occ in grams.values():
        if not 2 <= len({d for d, _ in occ}) <= max_df:
            continue
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    matches.setdefault((da, db), set()).add((pa, pb))
    out = {}
    for pair, pts in matches.items():
        runs = []
        for pa, pb in sorted(pts):
            for r in runs:
                if (pa - 1, pb - 1) in r:
                    r.add((pa, pb))
                    break
            else:
                runs.append({(pa, pb)})
        lens = [len(r) + n - 1 for r in runs]
        if max(lens) >= min_run:
            out[pair] = (max(lens), len(lens))
    return out


def test_duplicate_runs_matches_python_golden(spark):
    """Crafted corpus covering every branch: a known 12-token shared
    run, a run split by a one-token edit (two islands), a within-doc
    repeated gram (multiple diagonals), a boilerplate gram shared by
    MORE than max_df docs (must be band-passed away), and a
    below-min_run pair (must be filtered)."""
    from webcrawlergo_spark.operators.dedup import duplicate_runs_df

    run12 = " ".join(f"w{i}" for i in range(12))
    boiler = "b0 b1 b2 b3"  # 4-gram shared by ALL docs below (> max_df=3)
    texts = [
        (1, f"{boiler} x1 {run12} y1"),
        (2, f"{boiler} x2 {run12} y2"),  # shares the 12-run with 1 and 3
        (3, f"{boiler} {run12[:-4]} zz {run12} q"),  # within-doc repeat
        (4, f"{boiler} a b c d e f a b c d e f"),  # self-repeat only
        (5, f"{boiler} p q r s t u v w only five"),
    ]
    golden = _golden_duplicate_runs(texts, n=4, min_run=8, max_df=3)
    assert golden, "fixture produced no golden runs — test is vacuous"
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["max_run_tokens"], r["n_runs"])
        for r in duplicate_runs_df(docs, n=4, min_run=8, max_df=3).collect()
    }
    assert got == golden
    # the boilerplate 4-gram alone must never create a pair: docs 4/5
    # share ONLY it, and no (4,·)/(5,·) pair may appear
    assert not any(4 in p or 5 in p for p in got)


def test_duplicate_runs_fixture_nonvacuous(spark):
    """The sf0.001 corpus must actually contain qualifying runs and
    every reported run must be a VERBATIM shared substring of both
    docs (the exactness claim that distinguishes this from minhash)."""
    from webcrawlergo_spark.operators.dedup import (
        MIN_RUN_TOKENS,
        duplicate_runs,
    )

    rows = duplicate_runs(spark, SF_DIR).collect()
    assert rows, "no duplicate runs on the fixture corpus"
    texts = dict(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    for r in rows[:10]:
        ta, tb = texts[r["doc_a"]].split(" "), texts[r["doc_b"]].split(" ")
        k = r["max_run_tokens"]
        assert k >= MIN_RUN_TOKENS
        subs = {" ".join(ta[i : i + k]) for i in range(len(ta) - k + 1)}
        assert any(
            " ".join(tb[j : j + k]) in subs for j in range(len(tb) - k + 1)
        ), f"reported {k}-token run between {r['doc_a']}/{r['doc_b']} is not verbatim-shared"
