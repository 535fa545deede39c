"""PNG codec unit tests — golden bytes, round-trips over every filter
type, and failure modes (no Spark needed)."""

import struct
import zlib

import numpy as np
import pytest

from cli_spark.sources.png import _paeth, decode_png, encode_png


def _hand_packed_png() -> tuple[bytes, np.ndarray]:
    """A 2x2 RGB PNG built byte-by-byte WITHOUT the encoder under
    test: filter 0 on both rows, raw scanlines spelled out."""
    pixels = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    raw = bytes(
        [0, 255, 0, 0, 0, 255, 0,  # row 0: filter 0 + 2 RGB pixels
         0, 0, 0, 255, 10, 20, 30]  # row 1
    )

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    return png, pixels


def test_hand_packed_golden_decodes():
    png, pixels = _hand_packed_png()
    assert np.array_equal(decode_png(png), pixels)


def test_round_trip_exercises_all_filters():
    # 7 rows -> filter sequence 0,1,2,3,4,0,1 covers every type
    rng = np.arange(7 * 5 * 3, dtype=np.int64) * 37 % 251
    pixels = rng.astype(np.uint8).reshape(7, 5, 3)
    assert np.array_equal(decode_png(encode_png(pixels)), pixels)


def test_round_trip_extremes_and_shapes():
    for h, w in [(1, 1), (5, 1), (1, 9), (16, 13)]:
        for fill in (0, 255):
            pixels = np.full((h, w, 3), fill, dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(pixels)), pixels)
    # high-entropy grid (deterministic LCG, no RNG state)
    n = 11 * 7 * 3
    vals = (np.arange(n, dtype=np.int64) * 1103515245 + 12345) % 256
    pixels = vals.astype(np.uint8).reshape(11, 7, 3)
    assert np.array_equal(decode_png(encode_png(pixels)), pixels)


def test_paeth_predictor_cases():
    # hand-computed from the RFC 2083 formula: p = a+b-c, pick the
    # of (a, b, c) closest to p, ties broken left, then up, then
    # up-left. Note when |p-a| == |p-b| with a != b, c = (a+b)/2 and
    # |p-c| = 0, so c wins — the classic mis-reading this pins.
    assert _paeth(5, 5, 5) == 5
    assert _paeth(10, 20, 15) == 15   # pa == pb == 5 but pc == 0
    assert _paeth(1, 2, 2) == 1       # pa == 0, left wins
    assert _paeth(2, 7, 2) == 7       # pa == 5, pb == 0, up wins


def test_crc_corruption_raises():
    png, _ = _hand_packed_png()
    bad = bytearray(png)
    bad[40] ^= 0xFF  # flip a byte inside IDAT data
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))


def test_bad_signature_and_unsupported_variant():
    png, _ = _hand_packed_png()
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + png[6:])

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    # grayscale (color type 0) must be rejected, not mis-decoded
    gray = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 0, 3, 4])))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(gray)


def test_inflated_size_mismatch_raises():
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    short = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
             + chunk(b"IDAT", zlib.compress(bytes([0, 1, 2])))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflated size"):
        decode_png(short)
