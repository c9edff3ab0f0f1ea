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


# --------------------------------------------------------------------------
# Frame-sampling schedule — the decode-free half of video ingest
# --------------------------------------------------------------------------

N_SAMPLE_FRAMES = 8


def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame-sampling schedule from typed video metadata —
    the planning math a video pipeline runs BEFORE any decoder: which
    frame indices (and their timestamps) each worker should seek to.
    The decode itself stays behind decode_blob; this op is pure
    integer column math, fully oracle-checkable.

    Deterministic synthetic metadata (no real media in testdata):
    duration_ms = n_chars × 40, fps = 24 + 6·(doc_id mod 2). Per doc,
    K = min(8, total_frames) uniformly spaced indices
    idx_k = floor(k·total_frames/K), ts_k = floor(idx_k·1000/fps).
    Scale shape: one narrow projection + a bounded (≤K) generator per
    row — no shuffle, no Python.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dur = (F.col("n_chars") * 40).cast("long")
    fps = (F.lit(24) + (F.col("doc_id") % 2) * 6).cast("long")
    total = F.floor(dur * fps / F.lit(1000.0)).cast("long")
    k_n = F.least(F.lit(N_SAMPLE_FRAMES), total)
    base = docs.select(
        "doc_id", dur.alias("duration_ms"), fps.alias("fps"), total.alias("total_frames"),
        k_n.alias("k_n"),
    ).filter(F.col("total_frames") > 0)
    out = base.select(
        "doc_id", "duration_ms", "fps",
        F.explode(F.sequence(F.lit(0), (F.col("k_n") - 1).cast("int"))).alias("k"),
        "total_frames", "k_n",
    )
    idx = F.floor(F.col("k") * F.col("total_frames") / F.col("k_n")).cast("long")
    return (
        out.select(
            "doc_id", "duration_ms", "fps", F.col("k").cast("int").alias("k"),
            idx.alias("frame_idx"),
            F.floor(idx * 1000 / F.col("fps")).cast("long").alias("ts_ms"),
        )
        .orderBy("doc_id", "k")
    )


FRAME_SAMPLE_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(n_chars * 40 AS BIGINT) AS duration_ms,
         CAST(24 + (doc_id % 2) * 6 AS BIGINT) AS fps,
         CAST(floor((n_chars * 40) * (24 + (doc_id % 2) * 6) / 1000.0) AS BIGINT) AS total_frames
  FROM documents),
b2 AS (
  SELECT *, CASE WHEN total_frames < {N_SAMPLE_FRAMES} THEN total_frames
                 ELSE {N_SAMPLE_FRAMES} END AS k_n
  FROM base WHERE total_frames > 0),
ex AS (
  SELECT doc_id, duration_ms, fps, total_frames, k_n,
         CAST(unnest(range(0, k_n)) AS INTEGER) AS k
  FROM b2)
SELECT doc_id, duration_ms, fps, k,
       CAST(floor(k * total_frames / CAST(k_n AS DOUBLE)) AS BIGINT) AS frame_idx,
       CAST(floor(CAST(floor(k * total_frames / CAST(k_n AS DOUBLE)) AS BIGINT) * 1000 / CAST(fps AS DOUBLE)) AS BIGINT) AS ts_ms
FROM ex ORDER BY doc_id, k
"""
