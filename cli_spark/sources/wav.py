"""Minimal RIFF/WAVE PCM codec — pure Python/numpy, no audio libs.

The audio sibling of sources/bmp.py: a REAL container round-trip
(RIFF header, chunk walk, fmt validation, PCM sample extraction) so
the multimodal audio queries decode genuine WAV bytes instead of a
hash stub. Scope is deliberately the simplest real profile —
uncompressed PCM, 8-bit unsigned, mono — which is fully decodable
offline and still exercises every container trap: chunk sizes,
little-endian fields, the fmt/data chunk walk, and byte-exact sample
recovery.

Encoder and decoder are implemented independently (decoder walks the
chunk list; encoder writes a canonical 44-byte layout) and unit-tested
against hand-packed golden bytes in tests/test_wav.py so a mirrored
bug cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode unsigned 8-bit mono PCM samples as a canonical 44-byte-
    header WAV file."""
    if samples.dtype != np.uint8 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D uint8 array")
    data = samples.tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH",
        16,            # fmt chunk size
        1,             # PCM
        1,             # mono
        sample_rate,
        sample_rate,   # byte rate (1 channel × 1 byte)
        1,             # block align
        8,             # bits per sample
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file: returns (samples as uint8, sample_rate).

    Walks the RIFF chunk list (tolerating extra chunks in any order),
    validates the fmt profile (PCM, mono, 8-bit), and slices the data
    chunk exactly — no reliance on the canonical 44-byte layout."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = struct.unpack_from("<I", buf, 4)[0]
    if riff_size + 8 != len(buf):
        raise ValueError(f"RIFF size {riff_size} != file size {len(buf)} - 8")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        csize = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8:pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 8:
        raise ValueError(
            f"unsupported profile: format={audio_format} channels={channels} bits={bits}"
        )
    return np.frombuffer(data, dtype=np.uint8), sample_rate
