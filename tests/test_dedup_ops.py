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
