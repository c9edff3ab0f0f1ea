"""Multimodal plumbing: binary column + typed metadata round-trip,
mapInPandas feature extraction (deterministic fake decode), the
strict decode stub's failure path, and (r4) the REAL pure-numpy
WAV decoder: container round-trip, pinned features, and the
JVM-built container parsing end-to-end."""

import hashlib
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from webcrawlergo_spark.multimodal import (
    FEAT_DIM,
    WAV_RATE,
    attach_blob,
    audio_features,
    decode_blob,
    extract_features,
    fake_features,
    wav_blob_expr,
    wav_bytes,
    wav_features,
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


def test_wav_decoder_16bit_stereo_roundtrip():
    """decode_blob really parses the container: a struct-packed 16-bit
    stereo sine WAV decodes to the exact samples, rate and shape."""
    t = np.arange(4000)
    left = (np.sin(2 * np.pi * 440 * t / 44100) * 20000).astype(np.int16)
    right = (np.sin(2 * np.pi * 220 * t / 44100) * 15000).astype(np.int16)
    samples = np.stack([left, right], axis=1)
    blob = wav_bytes(samples, 44100)
    got, rate = decode_blob(blob, "audio/wav")
    assert rate == 44100
    assert got.shape == (4000, 2)
    assert np.array_equal(got, samples)


def test_wav_decoder_8bit_mono_payload_roundtrip():
    payload = bytes(range(256)) * 3
    blob = wav_bytes(np.frombuffer(payload, dtype=np.uint8), 8000)
    got, rate = decode_blob(blob, "audio/wav")
    assert rate == 8000 and got.shape == (768, 1)
    assert got.tobytes() == payload


def test_wav_features_pinned():
    """Feature vector pinned against an independent numpy computation
    (normalize → mono-mix → RMS per window)."""
    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, size=(1000, 2), dtype=np.int16)
    feats = wav_features(samples)
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    want = [round(float(np.sqrt(np.mean(c**2))), 6) for c in np.array_split(mono, FEAT_DIM)]
    assert feats == want
    assert len(feats) == FEAT_DIM
    # 8-bit silence (constant 128) → all-zero features
    assert wav_features(np.full(100, 128, dtype=np.uint8)) == [0.0] * FEAT_DIM


def test_image_decode_still_stubbed():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_blob(b"\x89PNG\r\n", "image/png")


def test_riff_non_wave_containers_route_correctly():
    """WEBP images and AVI video are ALSO RIFF containers — they must
    not die in the WAV parser (r4 review). WEBP still reaches the
    stub; AVI now reaches the REAL AVI parser (r5), which rejects a
    headerless container loudly."""
    webp = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBPVP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_blob(webp, "image/webp")
    avi = b"RIFF" + b"\x10\x00\x00\x00" + b"AVI " + b"\x00" * 8
    with pytest.raises(ValueError, match="missing avih/strh/strf"):
        decode_blob(avi, "video/x-msvideo")


def test_wav_bytes_rejects_unscaled_dtypes():
    """Float/int32 samples would silently truncate to garbage — the
    builder's inverse-of-decode contract only covers uint8/int16."""
    with pytest.raises(TypeError, match="uint8 or int16"):
        wav_bytes(np.sin(np.linspace(0, 6.28, 100)), 8000)
    with pytest.raises(TypeError, match="uint8 or int16"):
        wav_bytes(np.arange(100, dtype=np.int32), 8000)


def test_jvm_wav_container_matches_python_builder(spark):
    """The JVM column-expression WAV construction (wav_blob_expr —
    little-endian length fields via byte math) is byte-identical to
    the pure-Python struct builder, and audio_features runs the real
    decoder over it in mapInPandas."""
    payloads = [b"hello wav world", bytes(range(64)), b"x"]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, data binary"
    )
    rows = {
        r["doc_id"]: bytes(r["blob"])
        for r in df.select("doc_id", wav_blob_expr(F.col("data")).alias("blob")).collect()
    }
    for i, p in enumerate(payloads):
        assert rows[i] == wav_bytes(np.frombuffer(p, dtype=np.uint8), WAV_RATE)
    feats = {
        r["doc_id"]: list(r["feat"])
        for r in audio_features(
            df.select("doc_id", wav_blob_expr(F.col("data")).alias("blob"))
        ).collect()
    }
    for i, p in enumerate(payloads):
        assert feats[i] == wav_features(np.frombuffer(p, dtype=np.uint8))


def test_wav_decode_stats_recovers_payload(spark):
    """End-to-end: the decoded PCM md5 equals the md5 of the original
    text payload for every document (the oracle invariant, locally)."""
    from webcrawlergo_spark.multimodal import wav_decode_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r["doc_id"]: r for r in wav_decode_stats(spark, SF_DIR).collect()}
    for r in docs.select("doc_id", "text").collect():
        payload = r["text"].encode("utf-8")
        row = got[r["doc_id"]]
        assert row["payload_md5"] == hashlib.md5(payload).hexdigest()
        assert row["n_samples"] == len(payload)
        assert row["sample_rate"] == WAV_RATE and row["n_channels"] == 1


def test_feature_extraction_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    a = sorted(map(tuple, ((r["doc_id"], tuple(r["feat"])) for r in extract_features(attach_blob(docs)).collect())))
    b = sorted(map(tuple, ((r["doc_id"], tuple(r["feat"])) for r in extract_features(attach_blob(docs).repartition(7)).collect())))
    assert a == b


def test_wav_decoder_rejects_overrunning_chunk_size():
    """ADVICE r4: a corrupt chunk size must fail loudly, never
    silently truncate the payload or skip chunks."""
    import struct

    import numpy as np
    import pytest

    from webcrawlergo_spark.multimodal import wav_bytes

    good = wav_bytes(np.arange(100, dtype=np.uint8), 8000)
    # corrupt the data-chunk size field (last length field before the
    # payload) to claim more bytes than the container holds
    idx = good.rindex(b"data") + 4
    bad = good[:idx] + struct.pack("<I", 10_000) + good[idx + 4 :]
    with pytest.raises(ValueError, match="overruns"):
        decode_blob(bad, "audio/wav")


def test_pnm_decoder_roundtrips_p5_p6():
    """Real PNM parse: P6 RGB and P5 gray, 8- and 16-bit, plus header
    comments/whitespace — decode(encode(x)) == x."""
    from webcrawlergo_spark.multimodal import _decode_pnm, pnm_bytes

    rgb = (np.arange(2 * 5 * 3, dtype=np.uint8) * 3).reshape(2, 5, 3)
    got, maxval = decode_blob(pnm_bytes(rgb), "image/x-portable-pixmap")
    assert maxval == 255 and got.shape == (2, 5, 3) and (got == rgb).all()

    gray16 = (np.arange(12) * 999).astype(">u2").reshape(3, 4)
    got, maxval = _decode_pnm(pnm_bytes(gray16, maxval=65535))
    assert maxval == 65535 and got.dtype == np.dtype(">u2") and (got == gray16).all()

    # header grammar: comments and runs of whitespace between tokens
    blob = b"P5 # a comment\n# another\n 4\t2 #w h\n255\n" + bytes(range(8))
    got, maxval = _decode_pnm(blob)
    assert got.shape == (2, 4) and got.tobytes() == bytes(range(8))


def test_pnm_decoder_rejects_short_raster_and_bad_header():
    from webcrawlergo_spark.multimodal import _decode_pnm, pnm_bytes

    good = pnm_bytes(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="raster"):
        _decode_pnm(good[:-1])
    with pytest.raises(ValueError, match="P5/P6"):
        _decode_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM: not supported
    with pytest.raises(ValueError, match="header"):
        _decode_pnm(b"P6\n4 2")  # truncated header
    # missing separator byte after maxval: must fail loudly, never
    # consume the first raster byte and shift every pixel (review r5)
    with pytest.raises(ValueError, match="whitespace"):
        _decode_pnm(b"P6\n1 1\n255" + bytes(4))


def test_pnm_sniff_only_fires_for_image_types():
    """The weak 2-byte P5/P6 magic must not hijack non-image blobs: a
    video (or any payload starting with ASCII 'P6') still reaches the
    documented decode stub (review r5)."""
    looks_like_pnm = b"P6 is a great codename for a video codec"
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_blob(looks_like_pnm, "video/mp4")
    # but a blob TYPED as an image is sniffed and parsed for real
    rgb = np.zeros((1, 2, 3), dtype=np.uint8)
    from webcrawlergo_spark.multimodal import pnm_bytes

    got, maxval = decode_blob(pnm_bytes(rgb), "image/png")  # mislabeled but P6 magic
    assert maxval == 255 and got.shape == (1, 2, 3)


def test_image_decode_stats_recovers_padded_payload(spark):
    """End-to-end P6 path on a tiny docs frame: JVM container → numpy
    decode → md5(decoded raster) == md5(payload + pad)."""
    import pandas as pd

    from webcrawlergo_spark.multimodal import image_decode_stats

    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcde"), (3, "x")], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        rows = {r["doc_id"]: r for r in image_decode_stats(spark, d).collect()}
    assert rows[1]["width"] == 2 and rows[1]["pixels_md5"] == hashlib.md5(b"abcdef").hexdigest()
    assert rows[2]["width"] == 2 and rows[2]["pixels_md5"] == hashlib.md5(b"abcde ").hexdigest()
    assert rows[3]["width"] == 1 and rows[3]["pixels_md5"] == hashlib.md5(b"x  ").hexdigest()
    assert all(r["height"] == 1 and r["channels"] == 3 and r["maxval"] == 255 for r in rows.values())


# --------------------------------------------------------------------------
# Real AVI video decode (r5)
# --------------------------------------------------------------------------


def test_avi_decoder_roundtrips():
    """avi_bytes → _decode_avi recovers frames bit-for-bit, including
    non-multiple-of-4 widths (DIB stride padding stripped) and fps."""
    from webcrawlergo_spark.multimodal import avi_bytes, decode_blob

    rng = np.random.default_rng(11)
    for shape in [(3, 5, 7), (1, 1, 4), (4, 2, 13), (2, 8, 1)]:
        frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
        video, fps = decode_blob(avi_bytes(frames, fps=30), "video/x-msvideo")
        assert video.shape == shape and (video == frames).all()
        assert fps == 30.0


def test_avi_decoder_rejects_malformed():
    """Loud-fail contract: chunk overrun, frame-size mismatch, and a
    frame count disagreeing with strh.dwLength all raise."""
    from webcrawlergo_spark.multimodal import _decode_avi, avi_bytes

    frames = np.zeros((2, 2, 4), dtype=np.uint8)
    good = avi_bytes(frames)

    overrun = bytearray(good)
    overrun[16:20] = (10**8).to_bytes(4, "little")  # hdrl LIST size
    with pytest.raises(ValueError, match="overruns"):
        _decode_avi(bytes(overrun))

    # truncate the movi payload: last frame chunk loses bytes but its
    # size field still promises them → overrun inside movi
    with pytest.raises(ValueError):
        _decode_avi(good[:-3])

    # lie about the frame count in strh.dwLength
    bad_count = bytearray(good)
    strh_off = good.index(b"vids")
    # dwLength is the 8th dword after fccType/fccHandler: +8 fcc +4 flags
    # +4 prio/lang +4 init +4 scale +4 rate +4 start = offset 32 from 'vids'
    bad_count[strh_off + 32 : strh_off + 36] = (7).to_bytes(4, "little")
    with pytest.raises(ValueError, match="promises 7 frames"):
        _decode_avi(bytes(bad_count))


def test_avi_decoder_rejects_compressed_streams():
    """A non-BI_RGB biCompression must hit the honest
    NotImplementedError (ffmpeg territory), not decode garbage."""
    from webcrawlergo_spark.multimodal import _decode_avi, avi_bytes

    blob = bytearray(avi_bytes(np.zeros((1, 1, 4), dtype=np.uint8)))
    strf_off = blob.index(b"strf")
    # biCompression is at strf body offset 16 (after biSize/biWidth/
    # biHeight/biPlanes+biBitCount); body starts at strf_off + 8
    blob[strf_off + 24 : strf_off + 28] = b"MJPG"
    with pytest.raises(NotImplementedError, match="uncompressed 8-bit DIB"):
        _decode_avi(bytes(blob))


def test_avi_bottom_up_rows_are_flipped():
    """Positive biHeight means bottom-up row storage — the decoder
    must return top-down frames."""
    from webcrawlergo_spark.multimodal import _decode_avi, avi_bytes

    frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    blob = bytearray(avi_bytes(frames))  # written top-down (negative height)
    strf_off = blob.index(b"strf")
    # flip the sign of biHeight (strf body offset 8) → claims bottom-up
    blob[strf_off + 16 : strf_off + 20] = (3).to_bytes(4, "little", signed=True)
    video, _fps = _decode_avi(bytes(blob))
    # same bytes now interpreted bottom-up: each frame's rows reversed
    assert (video == frames[:, ::-1, :]).all()


def test_video_decode_stats_matches_direct_decode(spark):
    """The Spark query's JVM-built container decodes to exactly the
    doc text + stride padding (the oracle identity, checked here
    without DuckDB so pytest alone pins the contract)."""
    from webcrawlergo_spark.multimodal import AVI_NF, video_decode_stats

    out = {r["doc_id"]: r for r in video_decode_stats(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()
    assert out, "no rows"
    for d in docs[:50]:
        r = out[d["doc_id"]]
        n = len(d["text"].encode())
        frame_len = 4 * ((n + 15) // 16)
        pad = " " * (AVI_NF * frame_len - n)
        assert r["width"] == frame_len and r["n_frames"] == AVI_NF and r["fps"] == 25.0
        assert r["frames_md5"] == hashlib.md5((d["text"] + pad).encode()).hexdigest()
