"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched processing plumbing.

Policy (per the build brief): the decode libraries (PIL/librosa/ffmpeg)
are not in this container, so the *decode* step is a clearly-marked
stub — either ``NotImplementedError`` (strict mode) or a deterministic
fake feature vector derived from the bytes (test mode). Everything
Spark-side is real and tested: binary column construction, metadata
struct schema, ``mapInPandas`` batch iteration, partitioning, and the
output schema contract.

The testdata carries no real media, so ``attach_blob`` lifts the
documents table into the multimodal shape deterministically
(blob = utf-8 bytes of the text; identical construction exists in
DuckDB SQL for the oracle — ``encode()``/``octet_length``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video|text-blob
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),     # md5 of blob
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.DoubleType()), False),  # fixed-dim features
    ]
)

FEAT_DIM = 8


def attach_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, blob binary, meta struct). Deterministic,
    SQL-mirrorable (encode/md5/octet_length exist in both engines)."""
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("text-blob").alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("checksum"),
        ).alias("meta"),
    )


def decode_blob(blob: bytes, media_type: str):  # pragma: no cover - strict stub
    """The real decoder hook (image decode / audio resample / frame
    sampling). Deliberately unimplemented in this container."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg, not present in this image; "
        "use fake_features for the deterministic test path"
    )


def fake_features(blob: bytes, dim: int = FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte-sum
    folding per modulo class — stable across runs and processes."""
    acc = [0] * dim
    for i, b in enumerate(blob):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [float(x) for x in acc]


def extract_features(blobs: DataFrame, batch_hint: int = 1024, strict: bool = False) -> DataFrame:
    """The mapInPandas pipeline: per-partition Arrow batches of
    (doc_id, blob) → fixed-dim feature rows.

    This is the real plumbing a production decode would use: binary
    columns travel as Arrow buffers, the UDF sees pandas batches, the
    output schema is fixed. ``strict=True`` routes through the
    NotImplementedError decode stub (validating the failure path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                decode_blob(b"", "image")  # raises: decode not available here
            feats = [fake_features(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "feat": feats,
                }
            )

    # repartition by doc_id hash: at scale each decode batch should be
    # balanced and independent of ingest order
    return blobs.select("doc_id", "blob").repartition("doc_id").mapInPandas(run, FEATURE_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable query: the metadata projection of the
    multimodal table (blob stays columnar, only typed meta leaves)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = attach_blob(docs)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("doc_id")


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'text-blob' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum  -- DuckDB md5 hashes the utf-8 bytes of the VARCHAR,
                              -- identical to Spark's md5(encode(text,'utf-8'))
FROM documents ORDER BY doc_id
"""
