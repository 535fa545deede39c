"""Golden-byte tests for the pure-Python WAV codec (sources/wav.py) —
decoder validated against a HAND-PACKED byte layout (not just the
encoder's output) so encoder and decoder can't share a mirrored bug,
mirroring tests/test_bmp.py's method.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cli_spark.sources.wav import decode_wav, encode_wav


def _hand_packed(samples: bytes, rate: int) -> bytes:
    n = len(samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", n) + samples
    )


def test_decode_hand_packed_golden():
    samples = bytes([0, 1, 2, 253, 254, 255, 128])
    buf = _hand_packed(samples, 8000)
    out, rate = decode_wav(buf)
    assert rate == 8000
    assert out.tolist() == list(samples)


def test_encode_matches_hand_packed():
    samples = np.arange(16, dtype=np.uint8)
    assert encode_wav(samples, 4000) == _hand_packed(samples.tobytes(), 4000)


def test_roundtrip_various_lengths():
    rng = np.random.RandomState(7)
    for n in (1, 2, 15, 16, 17, 200, 1023):
        samples = rng.randint(0, 256, size=n).astype(np.uint8)
        out, rate = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(out, samples)


def test_decoder_walks_extra_chunks():
    """A LIST chunk before fmt/data must be skipped, including the
    odd-size word-alignment pad."""
    samples = bytes([9, 8, 7])
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size → pad
    body = (
        extra
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 3) + samples
    )
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav(buf)
    assert out.tolist() == list(samples)


def test_decoder_rejects_bad_magic_and_profile():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNKxxxxxxxxxxxx")
    stereo = (
        b"RIFF" + struct.pack("<I", 36 + 2) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 16000, 2, 8)
        + b"data" + struct.pack("<I", 2) + b"\x01\x02"
    )
    with pytest.raises(ValueError, match="unsupported profile"):
        decode_wav(stereo)


def test_decoder_rejects_truncated_riff_size():
    samples = bytes([1, 2, 3, 4])
    buf = _hand_packed(samples, 8000)
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(buf[:-1])
