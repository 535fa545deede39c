"""Golden-byte tests for the pure-Python AVI codec (sources/avi.py) —
decoder validated against a HAND-PACKED byte layout (not just the
encoder's output) so encoder and decoder can't share a mirrored bug,
mirroring tests/test_bmp.py / test_wav.py's method.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cli_spark.sources.avi import decode_avi, encode_avi


def _hand_packed_2x2(frame_rows: list[bytes], fps: int = 25) -> bytes:
    """Hand-pack a 2×2 24-bit AVI. Each entry of ``frame_rows`` is the
    raw 16-byte DIB payload for one frame: two rows of (2 px × BGR +
    2 pad bytes), BOTTOM row first."""
    n = len(frame_rows)
    fs = 16
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 1_000_000 // fps, fs * fps, 0, 0, n, 0, 1, fs, 2, 2, 0, 0, 0, 0
    )
    strh = b"strh" + struct.pack("<I", 56) + struct.pack(
        "<4s4sIIIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, n, fs, 0, fs,
        0, 0, 2, 2
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, fs, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi_body = b"".join(b"00db" + struct.pack("<I", fs) + fr for fr in frame_rows)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_decode_hand_packed_golden():
    """One 2×2 frame: bottom row (BGR)= [B3 G3 R3][B4 G4 R4], top row
    [B1 G1 R1][B2 G2 R2] → decoded RGB row 0 must be pixels 1, 2."""
    frame = bytes(
        [30, 20, 10, 60, 50, 40] + [0, 0]      # stored first = BOTTOM row
        + [130, 120, 110, 160, 150, 140] + [0, 0]  # stored second = TOP row
    )
    frames, fps = decode_avi(_hand_packed_2x2([frame], fps=25))
    assert fps == 25
    assert frames.shape == (1, 2, 2, 3)
    # top-left pixel: stored-second row, first BGR triple → RGB
    assert frames[0, 0, 0].tolist() == [110, 120, 130]
    assert frames[0, 0, 1].tolist() == [140, 150, 160]
    assert frames[0, 1, 0].tolist() == [10, 20, 30]
    assert frames[0, 1, 1].tolist() == [40, 50, 60]


def test_encode_matches_hand_packed():
    px = np.array(
        [[[[110, 120, 130], [140, 150, 160]],
          [[10, 20, 30], [40, 50, 60]]]], dtype=np.uint8
    )
    frame = bytes(
        [30, 20, 10, 60, 50, 40, 0, 0, 130, 120, 110, 160, 150, 140, 0, 0]
    )
    assert encode_avi(px, fps=25) == _hand_packed_2x2([frame], fps=25)


def test_roundtrip_various_shapes():
    rng = np.random.RandomState(11)
    for n, h, w in [(1, 1, 1), (3, 4, 5), (7, 2, 2), (30, 5, 3), (2, 14, 16)]:
        frames = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
        out, fps = decode_avi(encode_avi(frames, fps=25))
        assert fps == 25
        np.testing.assert_array_equal(out, frames)


def test_decoder_skips_junk_and_idx1():
    """JUNK between LISTs and a trailing idx1 must be ignored, incl.
    an odd-size word-alignment pad."""
    frames = np.arange(2 * 2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 2, 3)
    buf = encode_avi(frames, fps=25)
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # odd size → pad
    idx1 = b"idx1" + struct.pack("<I", 16) + b"\x00" * 16
    payload = buf[12:] + junk + idx1  # original chunk list + extras
    patched = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"AVI " + payload
    out, _ = decode_avi(patched)
    np.testing.assert_array_equal(out, frames)


def test_decoder_rejects_bad_magic_profile_and_counts():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"JUNKxxxxxxxxxxxx")
    frames = np.zeros((2, 2, 2, 3), dtype=np.uint8)
    buf = bytearray(encode_avi(frames, fps=25))
    # corrupt dwTotalFrames (avih body offset: 12 RIFF + 12 LIST/hdrl
    # prefix... locate via the avih fourcc instead of hardcoding)
    i = bytes(buf).index(b"avih") + 8 + 16  # 5th dword of MainAVIHeader
    struct.pack_into("<I", buf, i, 99)
    with pytest.raises(ValueError, match="claims 99 frames"):
        decode_avi(bytes(buf))


def test_decoder_rejects_truncated_riff_size():
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    buf = encode_avi(frames, fps=25)
    with pytest.raises(ValueError, match="RIFF size"):
        decode_avi(buf[:-1])
