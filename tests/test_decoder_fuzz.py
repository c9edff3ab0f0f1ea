"""Property-based robustness for the pure-numpy media decoders
(hypothesis): the loud-fail contract must hold under ARBITRARY
corruption, not just the hand-written cases in test_multimodal —
a decoder that silently returns wrong-but-plausible data on a
truncated or bit-flipped container would poison a 100 TB ingest
without a trace.

Properties:
- round-trip: decode(encode(x)) == x for random payloads/shapes;
- truncation: every strict prefix of a valid container either raises
  (ValueError / NotImplementedError) or — never — returns data;
- bit-flip: a single flipped byte either raises or returns the same
  shape (a header flip that still parses must not crash numpy with
  an unrelated error).

No Spark needed — the decoders are plain functions by design (the
mapInPandas kernels call exactly these).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from webcrawlergo_spark.multimodal import (
    _decode_avi,
    _decode_pnm,
    _decode_wav,
    avi_bytes,
    pnm_bytes,
    wav_bytes,
)

DECODE_ERRORS = (ValueError, NotImplementedError)


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    rate=st.integers(min_value=1, max_value=48000),
)
def test_wav_roundtrip_random_payload(data, rate):
    samples = np.frombuffer(data, dtype=np.uint8)
    got, got_rate = _decode_wav(wav_bytes(samples, rate))
    assert got_rate == rate
    assert got.tobytes() == data


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    rgb=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_pnm_roundtrip_random_raster(w, h, rgb, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    pix = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got, maxval = _decode_pnm(pnm_bytes(pix))
    assert maxval == 255 and got.shape == shape and (got == pix).all()


@settings(max_examples=40, deadline=None)
@given(
    nf=st.integers(min_value=0, max_value=4),
    w=st.integers(min_value=1, max_value=10),
    h=st.integers(min_value=1, max_value=6),
    fps=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_avi_roundtrip_random_frames(nf, w, h, fps, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
    got, got_fps = _decode_avi(avi_bytes(frames, fps=fps))
    assert got_fps == fps
    assert got.shape == frames.shape and (got == frames).all()


def _valid_containers():
    rng = np.random.default_rng(3)
    return [
        ("wav", wav_bytes(rng.integers(0, 256, 37, dtype=np.uint8), 8000)),
        ("wav16", wav_bytes(rng.integers(-999, 999, (20, 2)).astype(np.int16), 44100)),
        ("pnm", pnm_bytes(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8))),
        ("avi", avi_bytes(rng.integers(0, 256, (3, 2, 5), dtype=np.uint8))),
    ]


CONTAINERS = _valid_containers()
DECODERS = {"wav": _decode_wav, "wav16": _decode_wav, "pnm": _decode_pnm, "avi": _decode_avi}


@pytest.mark.parametrize("kind,blob", CONTAINERS, ids=[k for k, _ in CONTAINERS])
def test_every_strict_prefix_raises(kind, blob):
    """Truncation anywhere must fail loudly: no prefix may decode."""
    decode = DECODERS[kind]
    for cut in range(len(blob)):
        with pytest.raises(DECODE_ERRORS):
            decode(blob[:cut])


@settings(max_examples=120, deadline=None)
@given(
    which=st.integers(min_value=0, max_value=len(CONTAINERS) - 1),
    pos=st.integers(min_value=0, max_value=10**9),
    newbyte=st.integers(min_value=0, max_value=255),
)
def test_single_byte_flip_never_crashes_oddly(which, pos, newbyte):
    """A one-byte corruption either raises a decode error or parses to
    SOME array — anything else (IndexError, struct.error, segfault
    path) means an unvalidated read."""
    kind, blob = CONTAINERS[which]
    pos = pos % len(blob)
    mutated = blob[:pos] + bytes([newbyte]) + blob[pos + 1 :]
    try:
        out, meta = DECODERS[kind](mutated)
    except DECODE_ERRORS:
        return
    assert isinstance(out, np.ndarray)
