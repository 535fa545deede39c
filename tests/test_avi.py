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


def _hand_packed_av_interleaved(fps: int = 25, sr: int = 8000) -> tuple[bytes, bytes, list[int]]:
    """Hand-pack a two-stream (video + PCM16 audio) interleaved AVI
    with an idx1 index: one 2x2 frame, 3 audio samples split 2 + 1
    across two 01wb blocks.
    Returns (container bytes, expected DIB payload, expected samples)."""
    fs = 16
    frame = bytes(
        [30, 20, 10, 60, 50, 40, 0, 0, 130, 120, 110, 160, 150, 140, 0, 0]
    )
    samples = [-5, 7, 300]
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 1_000_000 // fps, fs * fps, 0, 0, 1, 0, 2, fs, 2, 2, 0, 0, 0, 0
    )
    strh_v = b"strh" + struct.pack("<I", 56) + struct.pack(
        "<4s4sIIIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, 1, fs, 0, fs,
        0, 0, 2, 2
    )
    strf_v = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, fs, 0, 0, 0, 0
    )
    strl_v = (b"LIST" + struct.pack("<I", 4 + len(strh_v) + len(strf_v))
              + b"strl" + strh_v + strf_v)
    strh_a = b"strh" + struct.pack("<I", 56) + struct.pack(
        "<4s4sIIIIIIIIII4H", b"auds", b"\x00" * 4, 0, 0, 0, 1, sr, 0, 3, 6, 0, 2,
        0, 0, 0, 0
    )
    strf_a = b"strf" + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, sr, sr * 2, 2, 16
    )
    strl_a = (b"LIST" + struct.pack("<I", 4 + len(strh_a) + len(strf_a))
              + b"strl" + strh_a + strf_a)
    hdrl_body = avih + strl_v + strl_a
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    wb1 = struct.pack("<2h", -5, 7)
    wb2 = struct.pack("<h", 300)
    movi_body = (
        b"01wb" + struct.pack("<I", len(wb1)) + wb1      # audio FIRST: order-free
        + b"00db" + struct.pack("<I", fs) + frame
        + b"01wb" + struct.pack("<I", len(wb2)) + wb2
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    idx_body = (
        b"01wb" + struct.pack("<III", 0x10, 4, len(wb1))
        + b"00db" + struct.pack("<III", 0x10, 4 + 8 + len(wb1), fs)
        + b"01wb" + struct.pack("<III", 0x10, 4 + 16 + len(wb1) + fs, len(wb2))
    )
    idx1 = b"idx1" + struct.pack("<I", len(idx_body)) + idx_body
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload, frame, samples


def test_decode_hand_packed_multistream_golden():
    """Video + audio streams, audio chunk preceding the frame, idx1
    present: video decode must pick stream 0 only, audio decode must
    concatenate the 01wb blocks in order."""
    from cli_spark.sources.avi import decode_avi_audio

    buf, _frame, samples = _hand_packed_av_interleaved()
    frames, fps = decode_avi(buf)
    assert fps == 25 and frames.shape == (1, 2, 2, 3)
    assert frames[0, 0, 0].tolist() == [110, 120, 130]
    assert frames[0, 1, 1].tolist() == [40, 50, 60]
    audio, sr = decode_avi_audio(buf)
    assert sr == 8000
    assert audio.tolist() == samples


def test_multistream_roundtrip_with_idx1():
    from cli_spark.sources.avi import decode_avi_audio

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(5, 3, 4, 3)).astype(np.uint8)
    audio = rng.randint(-2000, 2000, size=33).astype(np.int16)  # odd blocks
    buf = encode_avi(frames, fps=10, audio=audio, sample_rate=16000,
                     write_idx1=True)
    out, fps = decode_avi(buf)
    assert fps == 10
    np.testing.assert_array_equal(out, frames)
    samples, sr = decode_avi_audio(buf)
    assert sr == 16000
    np.testing.assert_array_equal(samples, audio)


def test_first_strh_binds_not_last():
    """A duplicate strh inside the strl (claiming a wrong fps) must be
    ignored — the FIRST strh is binding (ADVICE r7: the old decoder
    kept the last one)."""
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    buf = encode_avi(frames, fps=25)
    dup = b"strh" + struct.pack("<I", 56) + struct.pack(
        "<4s4sIIIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 1, 99, 0, 1, 16, 0, 16,
        0, 0, 2, 2
    )
    i = buf.index(b"strf")  # splice the duplicate before strf, inside strl
    patched = bytearray(buf[:i] + dup + buf[i:])
    # grow the enclosing RIFF, hdrl and strl sizes by len(dup)
    for fourcc, delta in ((b"RIFF", len(dup)), (b"hdrl", len(dup)), (b"strl", len(dup))):
        j = patched.index(fourcc)
        k = j - 8 if fourcc != b"RIFF" else j
        # LIST size dword sits 4 bytes before the form fourcc
        sz_at = j + 4 if fourcc == b"RIFF" else j - 4
        struct.pack_into("<I", patched, sz_at,
                         struct.unpack_from("<I", patched, sz_at)[0] + delta)
    _out, fps = decode_avi(bytes(patched))
    assert fps == 25  # first strh (25 fps) binds, not the 99-fps duplicate


def test_audio_only_rejected_for_video_decode():
    audio = np.arange(10, dtype=np.int16)
    buf = encode_avi(np.zeros((1, 2, 2, 3), dtype=np.uint8), fps=25,
                     audio=audio)
    # strip nothing; just assert the audio decoder rejects a no-auds file
    plain = encode_avi(np.zeros((1, 2, 2, 3), dtype=np.uint8), fps=25)
    from cli_spark.sources.avi import decode_avi_audio
    with pytest.raises(ValueError, match="no audio stream"):
        decode_avi_audio(plain)
    # and the multistream file still video-decodes
    out, _ = decode_avi(buf)
    assert out.shape == (1, 2, 2, 3)
