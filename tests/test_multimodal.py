"""Multimodal plumbing: binary column + typed metadata round-trip,
mapInPandas feature extraction (deterministic fake decode), and the
strict decode stub's failure path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from webcrawlergo_spark.multimodal import (
    FEAT_DIM,
    attach_blob,
    extract_features,
    fake_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_blob_metadata_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m = attach_blob(docs)
    row = m.orderBy("doc_id").first()
    text = docs.orderBy("doc_id").first()["text"]
    assert bytes(row["blob"]) == text.encode("utf-8")
    assert row["meta"]["n_bytes"] == len(text.encode("utf-8"))
    assert row["meta"]["media_type"] == "text-blob"


def test_mapinpandas_features(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = extract_features(attach_blob(docs)).collect()
    assert len(feats) == docs.count()
    by_id = {r["doc_id"]: r for r in feats}
    first = docs.orderBy("doc_id").first()
    want = fake_features(first["text"].encode("utf-8"))
    got = by_id[first["doc_id"]]
    assert list(got["feat"]) == want
    assert len(got["feat"]) == FEAT_DIM
    assert got["n_bytes"] == len(first["text"].encode("utf-8"))


def test_strict_decode_stub_raises(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(4)
    with pytest.raises(PythonException, match="NotImplementedError|media decode"):
        extract_features(attach_blob(docs), strict=True).collect()


def test_feature_extraction_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    a = sorted(map(tuple, ((r["doc_id"], tuple(r["feat"])) for r in extract_features(attach_blob(docs)).collect())))
    b = sorted(map(tuple, ((r["doc_id"], tuple(r["feat"])) for r in extract_features(attach_blob(docs).repartition(7)).collect())))
    assert a == b
