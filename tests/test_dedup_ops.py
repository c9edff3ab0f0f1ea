"""Dedup-operator guards that the SQL oracle can't express: the LSH
candidate generators must actually GENERATE candidates on the fixture
corpora (an empty bucket-collision set would make the oracle
comparison pass vacuously without exercising the Jaccard arithmetic)."""

from pyspark.sql import functions as F

from webcrawlergo_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_candidate_sets_nonvacuous(spark):
    for fn in (minhash_lsh_pairs, ngram_jaccard_pairs):
        df = fn(spark, SF_DIR)
        rows = df.collect()
        assert rows, f"{fn.__name__} produced no verified pairs on the fixture"
        # verified scores are true Jaccards: bounded and positive
        assert all(0.0 < r["jaccard"] <= 1.0 for r in rows)
