"""The pure-Python BMP codec behind q121/q123 — round-trip and
byte-level layout checks against an independently hand-packed file,
so encoder and decoder can't share a mirrored bug."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cli_spark.sources.bmp import decode_bmp, encode_bmp, row_stride


@given(
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=19),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_any_dims(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_layout_hand_packed():
    """Decode a BMP hand-packed here, independently of encode_bmp:
    2×2 image, bottom-up, BGR, one pad byte per row (w=2 → stride 8).
    Top-left RED, top-right GREEN, bottom-left BLUE, bottom-right
    WHITE — any row-order or channel-order bug misplaces a corner."""
    w, h = 2, 2
    stride = row_stride(w)
    assert stride == 8
    # stored first = BOTTOM row: blue(0,0,255 -> BGR ff 00 00), white
    bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    # stored second = TOP row: red(BGR 00 00 ff), green(BGR 00 ff 00)
    top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    body = bottom + top
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    arr = decode_bmp(hdr + info + body)
    assert arr[0, 0].tolist() == [255, 0, 0]      # top-left red
    assert arr[0, 1].tolist() == [0, 255, 0]      # top-right green
    assert arr[1, 0].tolist() == [0, 0, 255]      # bottom-left blue
    assert arr[1, 1].tolist() == [255, 255, 255]  # bottom-right white


def test_top_down_negative_height():
    """Negative height = top-down storage: same pixels, no flip."""
    w, h = 2, 1
    body = bytes([0, 0, 255, 255, 0, 0]) + b"\x00\x00"  # red, blue in BGR
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 0, 0, 0, 0)
    arr = decode_bmp(hdr + info + body)
    assert arr.shape == (1, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 0, 255]


def test_encode_layout_bytes():
    """encode_bmp's output checked field-by-field, not via decode."""
    arr = np.array([[[1, 2, 3], [4, 5, 6]],
                    [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
    data = encode_bmp(arr)
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 2)[0] == len(data) == 54 + 16
    assert struct.unpack_from("<I", data, 10)[0] == 54
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    assert (w, h, bpp, comp) == (2, 2, 24, 0)
    # first stored row = bottom row in BGR: (9,8,7), (12,11,10) + pad
    assert list(data[54:62]) == [9, 8, 7, 12, 11, 10, 0, 0]
    assert list(data[62:70]) == [3, 2, 1, 6, 5, 4, 0, 0]


@pytest.mark.parametrize("mutate, err", [
    (lambda b: b"XX" + b[2:], "not a BMP"),
    (lambda b: b[:40], "truncated BMP"),
    (lambda b: b[:-4], "truncated pixel array"),
    (lambda b: b[:28] + struct.pack("<H", 32) + b[30:], "only uncompressed 24-bit"),
    (lambda b: b[:30] + struct.pack("<I", 1) + b[34:], "only uncompressed 24-bit"),
])
def test_decode_rejects_malformed(mutate, err):
    good = encode_bmp(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match=err):
        decode_bmp(mutate(good))
