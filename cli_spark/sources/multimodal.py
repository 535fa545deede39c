"""Multimodal binary columns (SURVEY.md §2 Tier B "multimodal") —
image/audio/video as opaque `binary` columns with typed metadata.

Image decode is REAL: q121/q123 run a genuine uncompressed 24-bit BMP
encode → decode round-trip per document through `cli_spark.sources.
bmp` (pure-Python/numpy parser — header, padding, bottom-up row
order, BGR channel order), inside Arrow-batched mapInPandas. The
testdata ships no image files, so each document's BMP payload is
synthesized deterministically from its md5 digest — which is exactly
what lets DuckDB recompute every decoded statistic for the hash-graded
oracle. Video decode is REAL too (round 7): q122 encodes + parses a
genuine uncompressed RIFF/AVI container per document
(`cli_spark.sources.avi` — nested LIST walk, stream headers, DIB
frames), so every media family (image/audio/video) now runs an actual
container codec; no stubs remain.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.sources.bmp import decode_bmp, encode_bmp
from cli_spark.tables import load_table

# Shared 16-byte-digest construction for the synthesized BMPs: dims
# from the first two digest bytes (4..16 × 4..14 — small enough that
# a 500-doc batch decodes in microseconds, varied enough to exercise
# every row-padding residue), pixels = the digest repeated cyclically
# over w*h*3 bytes, RGB row-major top-down.
_SQL_DIGEST_BYTES = """
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> CAST(concat('0x', substr(md5(text), 1 + 2*i, 2)) AS INT)) AS db
  FROM documents
"""


def _doc_bmp(payload: bytes) -> tuple[bytes, np.ndarray]:
    """Synthesize the document's BMP: md5-derived dims + cyclic-digest
    pixels, really encoded (padding, bottom-up, BGR)."""
    digest = hashlib.md5(payload).digest()
    w = 4 + digest[0] % 13
    h = 4 + digest[1] % 11
    n = w * h * 3
    stream = (digest * ((n + 15) // 16))[:n]
    arr = np.frombuffer(stream, dtype=np.uint8).reshape(h, w, 3)
    return encode_bmp(arr), arr


@register(
    "q120_binary_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       substr(md5(text), 1, 4) AS shard_key
FROM documents
""",
    tags=("multimodal", "binary"),
)
def q120_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: encode payloads to bytes, compute
    size / digest / a shard key — the JVM-side half of a multimodal
    pipeline (routing, dedup, partitioning by content hash)."""
    d = load_table(spark, sf_dir, "documents")
    content = F.encode("text", "utf-8")
    digest = F.md5(content)
    return d.select(
        "doc_id",
        F.length(content).alias("n_bytes"),
        digest.alias("digest"),
        F.substring(digest, 1, 4).alias("shard_key"),
    )


@register(
    "q121_media_featurize_bmp",
    # The oracle recomputes every decoded statistic from the same
    # construction: dims from the first two md5 bytes, file size from
    # the BMP layout arithmetic (54-byte headers + padded stride ×
    # rows), pixel sum from the cyclic digest (full 16-byte cycles +
    # prefix remainder), and the two order-sensitive corner pixels
    # from their stream positions. A decoder that mishandled padding,
    # bottom-up row order, or BGR→RGB would fail the corner and size
    # columns even though the plain sum is order-invariant.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
dims AS (
  SELECT doc_id, db, 4 + db[1] % 13 AS w, 4 + db[2] % 11 AS h FROM b
),
c AS (SELECT doc_id, db, w, h, w * h * 3 AS len3 FROM dims)
SELECT doc_id,
       54 + (w * 3 + (4 - (w * 3) % 4) % 4) * h AS bmp_bytes,
       w AS src_w, h AS src_h, w * h AS n_px,
       CAST((len3 // 16) * list_sum(db)
            + COALESCE(list_sum(db[1 : len3 % 16]), 0) AS BIGINT) AS sum_px,
       db[1] AS r0, db[2] AS g0, db[3] AS b0,
       db[(len3 - 3) % 16 + 1] AS r_last,
       db[(len3 - 2) % 16 + 1] AS g_last,
       db[(len3 - 1) % 16 + 1] AS b_last
FROM c
""",
    tags=("multimodal", "bmp", "pandas_udf"),
)
def q121_media_featurize_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media featurization over binary image columns via mapInPandas:
    each document's payload becomes a REAL uncompressed 24-bit BMP
    (synthesized from its md5 digest — the testdata ships no image
    files) which `decode_bmp` then actually parses: magic + header
    fields, padded-stride pixel array, bottom-up row flip, BGR→RGB.
    All emitted statistics come from the DECODED grid, so a parser
    bug surfaces as an oracle mismatch. Arrow-batched, per-partition,
    no driver round-trip — swap the synthesis for `binaryFile` bytes
    and this is the production vision-featurizer shape."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, bmp_bytes int, src_w int, src_h int, n_px int, "
        "sum_px long, r0 int, g0 int, b0 int, r_last int, g_last int, b_last int"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "bmp_bytes", "src_w", "src_h", "n_px", "sum_px",
                     "r0", "g0", "b0", "r_last", "g_last", "b_last")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                bmp, _src = _doc_bmp(bytes(blob))
                decoded = decode_bmp(bmp)  # the real parse
                h, w, _ = decoded.shape
                recs["doc_id"].append(doc_id)
                recs["bmp_bytes"].append(len(bmp))
                recs["src_w"].append(w)
                recs["src_h"].append(h)
                recs["n_px"].append(w * h)
                recs["sum_px"].append(int(decoded.sum(dtype=np.int64)))
                recs["r0"].append(int(decoded[0, 0, 0]))
                recs["g0"].append(int(decoded[0, 0, 1]))
                recs["b0"].append(int(decoded[0, 0, 2]))
                recs["r_last"].append(int(decoded[-1, -1, 0]))
                recs["g_last"].append(int(decoded[-1, -1, 1]))
                recs["b_last"].append(int(decoded[-1, -1, 2]))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_featurize, schema).orderBy("doc_id")


@register(
    "q122_frame_sample_avi",
    # The oracle recomputes every decoded statistic from the same
    # construction: dims from the first two md5 bytes, frame count
    # from byte 4, container size from the RIFF/AVI layout arithmetic
    # (12-byte RIFF header + 200-byte hdrl LIST + movi LIST overhead
    # + n_frames × (8-byte chunk header + padded DIB frame)), and the
    # per-frame pixel features from the cyclic digest shifted one byte
    # per frame index (frame k pixel byte p = db[(k+p) mod 16]). The
    # order-sensitive corner pixels catch row-order / channel-order /
    # frame-order bugs; the sum catches stride/padding bugs; the size
    # catches header-layout bugs.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
dims AS (
  SELECT doc_id, db, 4 + db[1] % 13 AS w, 4 + db[2] % 11 AS h,
         1 + db[4] % 30 AS nf
  FROM b
),
c AS (
  SELECT doc_id, db, w, h, nf, w * h * 3 AS len3,
         (w * 3 + (4 - (w * 3) % 4) % 4) * h AS fs
  FROM dims
),
fr AS (
  SELECT doc_id, db, w, h, nf, len3, fs, u.k
  FROM c CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, nf - 1, 5)) AS k
  ) u
)
SELECT doc_id, k AS frame_idx, k * 40 AS ts_ms, nf AS n_frames,
       w, h,
       224 + nf * (8 + fs) AS avi_bytes,
       CAST((len3 // 16) * list_sum(db)
            + COALESCE(list_sum(list_transform(
                generate_series(1, len3 % 16),
                i -> db[(k + i - 1) % 16 + 1])), 0) AS BIGINT) AS sum_px,
       db[k % 16 + 1] AS r0,
       db[(k + 1) % 16 + 1] AS g0,
       db[(k + 2) % 16 + 1] AS b0,
       db[(k + len3 - 3) % 16 + 1] AS r_last,
       db[(k + len3 - 2) % 16 + 1] AS g_last,
       db[(k + len3 - 1) % 16 + 1] AS b_last
FROM fr
""",
    tags=("multimodal", "avi", "frame_sample", "pandas_udf"),
)
def q122_frame_sample_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary video columns via mapInPandas: each
    document's payload becomes a REAL uncompressed RIFF/AVI file
    (synthesized DIB frames from its md5 digest — the testdata ships
    no video files) which `decode_avi` then actually parses: RIFF
    form + size check, nested hdrl/strl/movi LIST walk, MainAVIHeader
    / AVIStreamHeader / BITMAPINFOHEADER validation, per-frame
    bottom-up BGR padded-stride undo. Every emitted statistic (frame
    pixel sum, order-sensitive corner pixels, container size, frame
    count, timing from the stream-header rate) comes from the DECODED
    frame stack, so a container or frame-layout bug surfaces as an
    oracle mismatch. The one-to-many shape — binary in, one row per
    sampled frame out (stride 5), linear per-partition work, no driver
    round-trip — is the production `ffmpeg`-sampler plumbing."""
    from cli_spark.sources.avi import decode_avi, encode_avi

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, frame_idx int, ts_ms int, n_frames int, w int, h int, "
        "avi_bytes int, sum_px long, r0 int, g0 int, b0 int, "
        "r_last int, g_last int, b_last int"
    )
    STRIDE = 5

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "frame_idx", "ts_ms", "n_frames", "w", "h",
                     "avi_bytes", "sum_px", "r0", "g0", "b0",
                     "r_last", "g_last", "b_last")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                digest = hashlib.md5(bytes(blob)).digest()
                w = 4 + digest[0] % 13
                h = 4 + digest[1] % 11
                nf = 1 + digest[3] % 30
                len3 = w * h * 3
                # frame k's RGB stream = cyclic digest shifted k bytes
                stream = (digest * ((len3 + nf + 15) // 16 + 1))
                frames = np.stack([
                    np.frombuffer(stream[k:k + len3], dtype=np.uint8)
                    .reshape(h, w, 3)
                    for k in range(nf)
                ])
                avi = encode_avi(frames, fps=25)
                decoded, fps = decode_avi(avi)  # the real parse
                for k in range(0, decoded.shape[0], STRIDE):
                    fr = decoded[k]
                    recs["doc_id"].append(doc_id)
                    recs["frame_idx"].append(k)
                    recs["ts_ms"].append(k * 1000 // fps)
                    recs["n_frames"].append(decoded.shape[0])
                    recs["w"].append(fr.shape[1])
                    recs["h"].append(fr.shape[0])
                    recs["avi_bytes"].append(len(avi))
                    recs["sum_px"].append(int(fr.sum(dtype=np.int64)))
                    recs["r0"].append(int(fr[0, 0, 0]))
                    recs["g0"].append(int(fr[0, 0, 1]))
                    recs["b0"].append(int(fr[0, 0, 2]))
                    recs["r_last"].append(int(fr[-1, -1, 0]))
                    recs["g_last"].append(int(fr[-1, -1, 1]))
                    recs["b_last"].append(int(fr[-1, -1, 2]))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_sample, schema).orderBy("doc_id", "frame_idx")


@register(
    "q123_resize_bmp",
    # The oracle replays the integer nearest-neighbour mapping over
    # every destination pixel (src index = dst index * src_dim //
    # dst_dim, all floor division — no float scale to diverge on) and
    # sums the sampled cyclic-digest bytes; the engine computes the
    # same sum from the pixels it actually decoded and resampled, and
    # re-encodes the thumbnail whose file size the oracle predicts
    # from BMP layout arithmetic.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
dims AS (
  SELECT doc_id, db, 4 + db[1] % 13 AS w, 4 + db[2] % 11 AS h FROM b
),
t AS (
  SELECT doc_id, db, w, h,
         greatest(1, CAST((8 * w) // greatest(w, h) AS INT)) AS dw,
         greatest(1, CAST((8 * h) // greatest(w, h) AS INT)) AS dh
  FROM dims
),
px AS (
  SELECT doc_id, db, w, h, dw, dh, u.pi
  FROM t CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, CAST(dw * dh - 1 AS BIGINT))) AS pi
  ) u
),
m AS (
  SELECT doc_id, w, h, dw, dh, db,
         3 * (((pi // dw) * h // dh) * w + ((pi % dw) * w // dw)) AS base
  FROM px
),
s AS (
  SELECT doc_id, w, h, dw, dh,
         CAST(SUM(db[base % 16 + 1] + db[(base + 1) % 16 + 1]
                  + db[(base + 2) % 16 + 1]) AS BIGINT) AS thumb_sum
  FROM m GROUP BY doc_id, w, h, dw, dh
)
SELECT doc_id, w AS src_w, h AS src_h, dw AS dst_w, dh AS dst_h,
       dw * dh AS thumb_px, thumb_sum,
       54 + (dw * 3 + (4 - (dw * 3) % 4) % 4) * dh AS thumb_bmp_bytes
FROM s
""",
    tags=("multimodal", "bmp", "resize"),
)
def q123_resize_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over binary columns: decode each document's BMP
    with the real parser, nearest-neighbour-resample it into an 8×8
    box (aspect-preserving, integer floor mapping — the same index
    arithmetic PIL's NEAREST uses, minus the +0.5 center offset, so
    both engines agree exactly), and re-ENCODE the thumbnail as a
    valid BMP whose bytes a downstream consumer could open. Decode →
    transform → encode inside one Arrow batch pass is the production
    thumbnailer shape; only the payload synthesis is testdata-side."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
        "thumb_px int, thumb_sum long, thumb_bmp_bytes int"
    )
    BOX = 8

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "src_w", "src_h", "dst_w", "dst_h",
                     "thumb_px", "thumb_sum", "thumb_bmp_bytes")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                bmp, _src = _doc_bmp(bytes(blob))
                decoded = decode_bmp(bmp)
                h, w, _ = decoded.shape
                m = max(w, h)
                dw = max(1, BOX * w // m)
                dh = max(1, BOX * h // m)
                sy = (np.arange(dh) * h) // dh
                sx = (np.arange(dw) * w) // dw
                thumb = decoded[np.ix_(sy, sx)]
                thumb_bmp = encode_bmp(np.ascontiguousarray(thumb))
                recs["doc_id"].append(doc_id)
                recs["src_w"].append(w)
                recs["src_h"].append(h)
                recs["dst_w"].append(dw)
                recs["dst_h"].append(dh)
                recs["thumb_px"].append(dw * dh)
                recs["thumb_sum"].append(int(thumb.sum(dtype=np.int64)))
                recs["thumb_bmp_bytes"].append(len(thumb_bmp))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_resize, schema).orderBy("doc_id")


@register(
    "q250_audio_wav_stats",
    # The oracle recomputes every decoded statistic from the same
    # construction: sample count from md5 byte 3 (200 + db[3]·7 —
    # never a multiple of 16, so the cyclic remainder is always
    # exercised), file size from the canonical RIFF layout (44 + n),
    # sample sum/sum-of-squares from full 16-byte digest cycles plus
    # the prefix remainder, and the order-sensitive first/last
    # samples from their stream positions. A decoder that misread the
    # chunk walk, data offset, or sample width would fail the size,
    # first/last, or moment columns.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
n AS (SELECT doc_id, db, 200 + db[3] * 7 AS n FROM b)
SELECT doc_id,
       44 + n AS wav_bytes,
       n AS n_samples,
       8000 AS sample_rate,
       n // 8 AS duration_ms,
       CAST((n // 16) * list_sum(db)
            + COALESCE(list_sum(db[1 : n % 16]), 0) AS BIGINT) AS sum_s,
       CAST((n // 16) * list_sum(list_transform(db, x -> x * x))
            + COALESCE(list_sum(list_transform(db[1 : n % 16], x -> x * x)), 0)
            AS BIGINT) AS sumsq_s,
       db[1] AS s_first,
       db[(n - 1) % 16 + 1] AS s_last,
       list_max(db) AS peak,
       list_min(db) AS trough
FROM n
""",
    tags=("multimodal", "wav", "pandas_udf"),
)
def q250_audio_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio featurization over binary WAV columns via mapInPandas:
    each document's payload becomes a REAL RIFF/WAVE PCM file
    (synthesized 8-bit mono samples from its md5 digest — the testdata
    ships no audio files) which `decode_wav` then actually parses:
    RIFF magic + size check, chunk walk, fmt profile validation, PCM
    sample recovery. Every emitted statistic (loudness moments, peak/
    trough, order-sensitive first/last sample, container size) comes
    from the DECODED samples, so a parser bug surfaces as an oracle
    mismatch. Same production shape as q121: Arrow-batched,
    per-partition, swap the synthesis for `binaryFile` bytes and this
    is a distributed audio feature extractor."""
    from cli_spark.sources.wav import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, wav_bytes int, n_samples int, sample_rate int, "
        "duration_ms int, sum_s long, sumsq_s long, s_first int, "
        "s_last int, peak int, trough int"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "wav_bytes", "n_samples", "sample_rate",
                     "duration_ms", "sum_s", "sumsq_s", "s_first", "s_last",
                     "peak", "trough")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                digest = hashlib.md5(bytes(blob)).digest()
                n = 200 + digest[2] * 7
                stream = (digest * ((n + 15) // 16))[:n]
                wav = encode_wav(np.frombuffer(stream, dtype=np.uint8), 8000)
                samples, rate = decode_wav(wav)  # the real parse
                s64 = samples.astype(np.int64)
                recs["doc_id"].append(doc_id)
                recs["wav_bytes"].append(len(wav))
                recs["n_samples"].append(len(samples))
                recs["sample_rate"].append(rate)
                recs["duration_ms"].append(len(samples) * 1000 // rate)
                recs["sum_s"].append(int(s64.sum()))
                recs["sumsq_s"].append(int((s64 * s64).sum()))
                recs["s_first"].append(int(samples[0]))
                recs["s_last"].append(int(samples[-1]))
                recs["peak"].append(int(samples.max()))
                recs["trough"].append(int(samples.min()))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_featurize, schema).orderBy("doc_id")


@register(
    "q268_audio_downsample",
    # The oracle replays the decimation over the cyclic digest: kept
    # samples sit at even stream positions, which cycle through the 8
    # EVEN digest residues with period 8 — full-period sums plus the
    # even-list prefix remainder, the thumbnail size from RIFF layout
    # arithmetic, and the order-sensitive last kept sample from its
    # stream position. Mishandling stride, container re-encode, or
    # sample order fails size/last/sum independently.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
n AS (
  SELECT doc_id, db,
         list_transform(generate_series(0, 7), i -> db[2 * i + 1]) AS evens,
         200 + db[3] * 7 AS n
  FROM b
),
d AS (SELECT doc_id, db, evens, n, (n + 1) // 2 AS n_ds FROM n)
SELECT doc_id,
       44 + n AS wav_bytes,
       44 + n_ds AS ds_bytes,
       n_ds AS n_samples_ds,
       4000 AS sample_rate_ds,
       CAST((n_ds // 8) * list_sum(evens)
            + COALESCE(list_sum(evens[1 : n_ds % 8]), 0) AS BIGINT) AS sum_ds,
       db[1] AS s_first_ds,
       db[(2 * (n_ds - 1)) % 16 + 1] AS s_last_ds
FROM d
""",
    tags=("multimodal", "wav", "resample", "pandas_udf"),
)
def q268_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio downsampling over binary WAV columns: decode the real
    RIFF container (q250's synthesis), decimate 2:1 (every second
    sample — the naive resampler; a production kernel would filter
    first, same plumbing), re-encode at the halved rate, then decode
    the THUMBNAIL again and emit its statistics — a full
    decode→transform→encode→decode round trip per document, the audio
    analogue of q123's image resize. Arrow-batched mapInPandas, one
    pass, no driver round-trip."""
    from cli_spark.sources.wav import decode_wav, encode_wav

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, wav_bytes int, ds_bytes int, n_samples_ds int, "
        "sample_rate_ds int, sum_ds long, s_first_ds int, s_last_ds int"
    )

    def _downsample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "wav_bytes", "ds_bytes", "n_samples_ds",
                     "sample_rate_ds", "sum_ds", "s_first_ds", "s_last_ds")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                digest = hashlib.md5(bytes(blob)).digest()
                n = 200 + digest[2] * 7
                stream = (digest * ((n + 15) // 16))[:n]
                wav = encode_wav(np.frombuffer(stream, dtype=np.uint8), 8000)
                samples, rate = decode_wav(wav)          # real parse
                ds = samples[::2]                         # 2:1 decimation
                dswav = encode_wav(ds, rate // 2)         # real re-encode
                out, out_rate = decode_wav(dswav)         # real re-parse
                recs["doc_id"].append(doc_id)
                recs["wav_bytes"].append(len(wav))
                recs["ds_bytes"].append(len(dswav))
                recs["n_samples_ds"].append(len(out))
                recs["sample_rate_ds"].append(out_rate)
                recs["sum_ds"].append(int(out.astype(np.int64).sum()))
                recs["s_first_ds"].append(int(out[0]))
                recs["s_last_ds"].append(int(out[-1]))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_downsample, schema).orderBy("doc_id")


@register(
    "q351_avi_indexed_multistream",
    # VERDICT r7 #7: grade the tolerated-but-untested AVI container
    # shapes — an idx1-indexed, audio+video interleaved file. The
    # oracle recomputes every decoded statistic from the same digest
    # construction: dims/frame-count/sample-count from digest bytes,
    # container size from the two-stream RIFF layout arithmetic
    # (332 fixed bytes = RIFF hdr 12 + hdrl 300 [avih 64 + video strl
    # 124 + audio strl 100] + movi hdr 12 + idx1 hdr 8; then per frame
    # 8-byte video chunk hdr + padded DIB + 8-byte audio chunk hdr +
    # 32 bytes of idx1 entries, plus 2 bytes per PCM sample), pixel
    # sums from the cyclic digest, audio stats from the affine sample
    # formula. A decoder that picked the wrong stream's strh, counted
    # audio chunks as frames, or mis-walked idx1 mismatches.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
dims AS (
  SELECT doc_id, db,
         4 + db[2] % 9 AS w, 4 + db[3] % 7 AS h,
         1 + db[5] % 8 AS nf, 16 + db[7] % 48 AS ns
  FROM b
),
c AS (
  SELECT doc_id, db, w, h, nf, ns, w * h * 3 AS len3,
         (w * 3 + (4 - (w * 3) % 4) % 4) * h AS fs
  FROM dims
),
px AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(generate_series(0, nf - 1),
      k -> (len3 // 16) * list_sum(db)
           + COALESCE(list_sum(list_transform(
               generate_series(1, len3 % 16),
               i -> db[(k + i - 1) % 16 + 1])), 0))) AS BIGINT) AS sum_px
  FROM c
),
au AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(generate_series(0, ns - 1),
      i -> db[i % 16 + 1] * 16 - 2048 + i % 32)) AS BIGINT) AS sum_samples,
    CAST(list_max(list_transform(generate_series(0, ns - 1),
      i -> db[i % 16 + 1] * 16 - 2048 + i % 32)) AS INT) AS max_sample
  FROM c
)
SELECT c.doc_id, nf AS n_frames, w, h, ns AS n_samples,
       332 + nf * (48 + fs) + 2 * ns AS avi_bytes,
       sum_px, sum_samples, max_sample
FROM c
JOIN px ON c.doc_id = px.doc_id
JOIN au ON c.doc_id = au.doc_id
""",
    tags=("multimodal", "avi", "audio", "idx1", "pandas_udf"),
)
def q351_avi_indexed_multistream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed multi-stream AVI decode (VERDICT r7 #7): each document
    becomes a REAL two-stream RIFF/AVI container — uncompressed DIB
    video interleaved with per-frame PCM16 audio blocks plus a
    standard idx1 index chunk — which `decode_avi` / `decode_avi_audio`
    then genuinely parse back (per-strl stream-header pairing, stream
    index selects `NNdb` vs `NNwb` movi chunk ids, idx1/JUNK skipped,
    first-strh-binds semantics). Every emitted statistic (frame pixel
    sums, audio sample sum/max, container size, stream lengths) comes
    from the DECODED streams, so a wrong-stream-header or chunk-id
    routing bug surfaces as an oracle mismatch. One row per document,
    linear per-partition work inside Arrow-batched mapInPandas."""
    from cli_spark.sources.avi import decode_avi, decode_avi_audio, encode_avi

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, n_frames int, w int, h int, n_samples int, "
        "avi_bytes int, sum_px long, sum_samples long, max_sample int"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "n_frames", "w", "h", "n_samples",
                     "avi_bytes", "sum_px", "sum_samples", "max_sample")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                digest = hashlib.md5(bytes(blob)).digest()
                w = 4 + digest[1] % 9
                h = 4 + digest[2] % 7
                nf = 1 + digest[4] % 8
                ns = 16 + digest[6] % 48
                len3 = w * h * 3
                stream = digest * ((len3 + nf + 15) // 16 + 1)
                frames = np.stack([
                    np.frombuffer(stream[k:k + len3], dtype=np.uint8)
                    .reshape(h, w, 3)
                    for k in range(nf)
                ])
                idx = np.arange(ns)
                db = np.frombuffer(digest, dtype=np.uint8).astype(np.int32)
                audio = (db[idx % 16] * 16 - 2048 + idx % 32).astype(np.int16)
                avi = encode_avi(frames, fps=25, audio=audio,
                                 sample_rate=8000, write_idx1=True)
                decoded, _fps = decode_avi(avi)          # the real parses
                samples, _sr = decode_avi_audio(avi)
                recs["doc_id"].append(doc_id)
                recs["n_frames"].append(decoded.shape[0])
                recs["w"].append(decoded.shape[2])
                recs["h"].append(decoded.shape[1])
                recs["n_samples"].append(len(samples))
                recs["avi_bytes"].append(len(avi))
                recs["sum_px"].append(int(decoded.sum(dtype=np.int64)))
                recs["sum_samples"].append(int(samples.sum(dtype=np.int64)))
                recs["max_sample"].append(int(samples.max()))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_decode, schema).orderBy("doc_id")


def _doc_png(payload: bytes) -> bytes:
    """Synthesize the document's PNG: md5-derived dims (independent
    digest bytes from the BMP path so the two codecs never share a
    geometry bug), cyclic-digest pixels, really encoded with the
    per-row filter cycle (row r -> filter r mod 5)."""
    from cli_spark.sources.png import encode_png

    digest = hashlib.md5(payload).digest()
    w = 4 + digest[5] % 13
    h = 5 + digest[6] % 11
    n = w * h * 3
    stream = (digest * ((n + 15) // 16))[:n]
    arr = np.frombuffer(stream, dtype=np.uint8).reshape(h, w, 3)
    return encode_png(arr)


@register(
    "q431_media_featurize_png",
    # The oracle recomputes every DECODED statistic from the cyclic
    # md5-digest construction: dims from digest bytes 5/6, total and
    # per-row pixel sums via modular arithmetic over the 16 digest
    # bytes, corner pixels by direct index. sum_row2 and sum_row4
    # specifically sit on Up- and Paeth-filtered scanlines (filter =
    # row mod 5), so a decoder that mis-reverses either predictor
    # breaks those rows even if the total survives by luck. File size
    # is NOT graded: zlib output length is a compression detail, not
    # an image semantic.
    oracle=f"""
WITH b AS ({_SQL_DIGEST_BYTES}),
dims AS (
  SELECT doc_id, db,
         4 + db[6] % 13 AS w, 5 + db[7] % 11 AS h
  FROM b
),
c AS (
  SELECT doc_id, db, w, h, w * h * 3 AS len3, w * 3 AS rowlen
  FROM dims
)
SELECT doc_id, w, h, w * h AS n_px,
       CAST((len3 // 16) * list_sum(db)
            + COALESCE(list_sum(db[1 : len3 % 16]), 0) AS BIGINT) AS sum_px,
       CAST(list_sum(list_transform(generate_series(1, rowlen),
              i -> db[(2 * rowlen + i - 1) % 16 + 1])) AS BIGINT) AS sum_row2,
       CAST(list_sum(list_transform(generate_series(1, rowlen),
              i -> db[(4 * rowlen + i - 1) % 16 + 1])) AS BIGINT) AS sum_row4,
       db[1] AS r0, db[2] AS g0, db[3] AS b0,
       db[(len3 - 3) % 16 + 1] AS r_last,
       db[(len3 - 2) % 16 + 1] AS g_last,
       db[(len3 - 1) % 16 + 1] AS b_last
FROM c
""",
    tags=("multimodal", "png", "codec", "pandas_udf"),
)
def q431_media_featurize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG featurization via mapInPandas — the first COMPRESSED image
    codec in the registry (BMP/AVI are raster-raw): each document
    becomes a real 8-bit truecolor PNG (zlib-deflated scanlines,
    filter type cycling None/Sub/Up/Average/Paeth per row) and
    `cli_spark.sources.png.decode_png` genuinely parses it back —
    signature, chunk CRC32 walk, inflate, five-way predictive
    unfiltering. Every emitted statistic comes from the DECODED grid;
    the oracle recomputes them from the md5 construction, so a wrong
    Paeth tie-break or a truncated Average divide shows up as a hash
    mismatch on the row sums that sit on those filters. This is the
    production shape for vision-corpus feature extraction: binary
    column in, Arrow batch through a per-partition decoder, typed
    features out — swap the synthesis for `binaryFile` bytes and the
    plan is unchanged."""
    from cli_spark.sources.png import decode_png

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = (
        "doc_id long, w int, h int, n_px int, sum_px long, "
        "sum_row2 long, sum_row4 long, "
        "r0 int, g0 int, b0 int, r_last int, g_last int, b_last int"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "w", "h", "n_px", "sum_px", "sum_row2",
                     "sum_row4", "r0", "g0", "b0",
                     "r_last", "g_last", "b_last")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                png = _doc_png(bytes(blob))
                decoded = decode_png(png)  # the real parse
                h, w, _ = decoded.shape
                recs["doc_id"].append(doc_id)
                recs["w"].append(w)
                recs["h"].append(h)
                recs["n_px"].append(w * h)
                recs["sum_px"].append(int(decoded.sum(dtype=np.int64)))
                recs["sum_row2"].append(int(decoded[2].sum(dtype=np.int64)))
                recs["sum_row4"].append(int(decoded[4].sum(dtype=np.int64)))
                recs["r0"].append(int(decoded[0, 0, 0]))
                recs["g0"].append(int(decoded[0, 0, 1]))
                recs["b0"].append(int(decoded[0, 0, 2]))
                recs["r_last"].append(int(decoded[-1, -1, 0]))
                recs["g_last"].append(int(decoded[-1, -1, 1]))
                recs["b_last"].append(int(decoded[-1, -1, 2]))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_featurize, schema).orderBy("doc_id")
