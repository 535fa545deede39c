"""Pure-Python PNG encode/decode — the third real image codec behind
the multimodal queries (after BMP q121/q123 and AVI q122/q351).

PNG (RFC 2083 / ISO 15948) is fully decodable with the standard
library: chunked container (length + tag + data + CRC32), IHDR
geometry, IDAT = zlib-deflated scanlines where every row starts with
a FILTER TYPE byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) applied
to the raw bytes before compression. Unlike BMP, decoding therefore
exercises real entropy coding (zlib inflate) and the five-way
predictive unfiltering — the part naive parsers get wrong (Average
truncates the (left+up)/2 sum BEFORE the mod-256 add; Paeth breaks
ties left-then-up-then-upleft).

``encode_png`` deliberately cycles the filter type per row (row r
uses filter r mod 5) so a decoder that mishandles ANY filter corrupts
most of the image; ``decode_png`` is a genuine parser — signature,
chunk walk with CRC verification, inflate, per-row unfilter — and
accepts any 8-bit-RGB non-interlaced PNG regardless of who wrote it.
Only color type 2 (truecolor), bit depth 8, interlace 0 is supported;
everything else raises.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG,
    cycling the scanline filter (row r -> filter r mod 5)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(
            f"expected (h, w, 3) uint8 RGB, got {pixels.shape} {pixels.dtype}"
        )
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bpp = 3
    raw = bytearray()
    for r in range(h):
        ft = r % 5
        row = pixels[r].reshape(-1).astype(np.int32)
        prior = (
            pixels[r - 1].reshape(-1).astype(np.int32)
            if r > 0
            else np.zeros(w * bpp, dtype=np.int32)
        )
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prior[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            filt = row - (left + prior) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prior, upleft)),
                dtype=np.int32,
                count=w * bpp,
            )
            filt = row - pred
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
    idat = zlib.compress(bytes(raw), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor non-interlaced PNG to an (h, w, 3)
    uint8 RGB array. Verifies the signature and every chunk CRC,
    concatenates multiple IDATs, inflates, and reverses all five
    scanline filters."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, ctype, comp, filt_method, interlace = ihdr
    if (depth, ctype, comp, filt_method, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG variant: depth={depth} color={ctype} "
            f"compression={comp} filter={filt_method} interlace={interlace}"
        )
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        prior = out[r - 1].astype(np.int32) if r > 0 else np.zeros(
            stride, dtype=np.int32
        )
        if ft == 0:
            recon = line
        elif ft == 2:
            recon = (line + prior) % 256
        elif ft in (1, 3, 4):
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = int(prior[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    recon[i] = (line[i] + a) % 256
                elif ft == 3:
                    recon[i] = (line[i] + (a + b) // 2) % 256
                else:
                    recon[i] = (line[i] + _paeth(int(a), int(b), c)) % 256
        else:
            raise ValueError(f"unknown filter type {ft} on row {r}")
        out[r] = recon.astype(np.uint8)
    return out.reshape(h, w, 3)
