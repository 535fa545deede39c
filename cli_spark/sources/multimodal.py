"""Multimodal binary columns (SURVEY.md §2 Tier B "multimodal") —
image/audio/video as opaque `binary` columns with typed metadata.

The container has no image/audio codecs (BASELINE.json environment),
so the decode step is a clearly-marked deterministic STUB; everything
Spark-side — schema, Arrow batch shape, mapInPandas plumbing,
partitioning — is real and tested. Swapping `_fake_decode` for a PIL/
torchaudio call is the only change needed on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


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


def _fake_decode(payload: bytes) -> dict:
    """STUB for the real media decode (no codecs in this container —
    replace with PIL.Image.open / soundfile.read in production).
    Deterministic: features derive from the payload's sha256, standing
    in for decoded width/height/duration/embedding."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_channels": 1 + h[2] % 3,
        "feat": [round(b / 255.0, 6) for b in h[3:7]],
    }


@register(
    "q121_media_featurize_stub",
    # The STUB decode is a pure function of sha256(payload), which
    # DuckDB can mirror exactly (sha256(VARCHAR) hashes the UTF-8
    # bytes = the encoded payload) — so even the stubbed pipeline is
    # hash-graded, and the mapInPandas plumbing is verified end-to-end
    # rather than rows-only. round(b/255., 6) parity checked for all
    # 256 byte values (banker's vs half-away never diverges here).
    oracle="""
WITH h AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS hx
  FROM documents
)
SELECT doc_id, n_bytes,
       64 + CAST(concat('0x', substr(hx, 1, 2)) AS INT) % 192 AS width,
       64 + CAST(concat('0x', substr(hx, 3, 2)) AS INT) % 192 AS height,
       1 + CAST(concat('0x', substr(hx, 5, 2)) AS INT) % 3 AS n_channels,
       round(CAST(concat('0x', substr(hx, 7, 2)) AS INT) / 255.0, 6) AS f0,
       round(CAST(concat('0x', substr(hx, 9, 2)) AS INT) / 255.0, 6) AS f1,
       round(CAST(concat('0x', substr(hx, 11, 2)) AS INT) / 255.0, 6) AS f2,
       round(CAST(concat('0x', substr(hx, 13, 2)) AS INT) / 255.0, 6) AS f3
FROM h
""",
    tags=("multimodal", "stub", "pandas_udf"),
)
def q121_media_featurize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media featurization over binary columns via mapInPandas:
    documents' bytes stand in for image blobs; the decode is the
    documented STUB. Arrow-batched — the batch loop is per-partition,
    vectorizable, and never collects to the driver. Output schema is
    the real one a vision featurizer would produce."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    # f0..f3 as SCALAR doubles, not array<double>: array cells render
    # differently across engines (python list vs numpy repr), which
    # breaks the driver's stringified value hash; a production
    # featurizer would emit array<float> and skip the oracle.
    schema = (
        "doc_id long, n_bytes int, width int, height int, n_channels int, "
        "f0 double, f1 double, f2 double, f3 double"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "f0": [f["feat"][0] for f in feats],
                    "f1": [f["feat"][1] for f in feats],
                    "f2": [f["feat"][2] for f in feats],
                    "f3": [f["feat"][3] for f in feats],
                }
            )

    return d.mapInPandas(_featurize, schema).orderBy("doc_id")


@register(
    "q122_frame_sample_stub",
    # Stub per-frame features are sha256(payload || '|' || idx) — an
    # ASCII suffix keeps the digest expressible in DuckDB's
    # sha256(VARCHAR), so the one-to-many expansion is hash-graded.
    # n_frames = 1 + n_bytes % 30, sampled every STRIDE=5 → frame
    # indices generate_series(0, n_bytes % 30, 5).
    oracle="""
WITH base AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes FROM documents
),
frames AS (
  SELECT doc_id, text, f.idx
  FROM base
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, n_bytes % 30, 5)) AS idx
  ) f
),
hx AS (
  SELECT doc_id, idx, sha256(text || '|' || CAST(idx AS VARCHAR)) AS d
  FROM frames
)
SELECT doc_id, idx AS frame_idx, idx * 40 AS ts_ms,
       round(CAST(concat('0x', substr(d, 1, 2)) AS INT) / 255.0, 6) AS f0,
       round(CAST(concat('0x', substr(d, 3, 2)) AS INT) / 255.0, 6) AS f1,
       round(CAST(concat('0x', substr(d, 5, 2)) AS INT) / 255.0, 6) AS f2,
       round(CAST(concat('0x', substr(d, 7, 2)) AS INT) / 255.0, 6) AS f3
FROM hx
""",
    tags=("multimodal", "stub", "frame_sample"),
)
def q122_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over "video" binary columns: one-to-many
    mapInPandas expansion — every payload yields ceil(n_frames/stride)
    sampled-frame rows with per-frame features. The frame decode is
    the documented STUB (sha256-derived, deterministic); the Spark
    shape — binary in, multiple typed rows out, no driver round-trip,
    linear per-partition work — is the real production plumbing for
    `ffmpeg`-style samplers."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    schema = "doc_id long, frame_idx int, ts_ms int, f0 double, f1 double, f2 double, f3 double"
    STRIDE = 5

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"doc_id": [], "frame_idx": [], "ts_ms": [],
                    "f0": [], "f1": [], "f2": [], "f3": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(blob)
                n_frames = 1 + len(payload) % 30  # STUB: "container header"
                for idx in range(0, n_frames, STRIDE):
                    # ASCII frame suffix (not packed bytes) so the
                    # DuckDB oracle can recompute the same digest
                    h = hashlib.sha256(payload + b"|" + str(idx).encode()).digest()
                    recs["doc_id"].append(doc_id)
                    recs["frame_idx"].append(idx)
                    recs["ts_ms"].append(idx * 40)  # 25 fps
                    for j in range(4):
                        recs[f"f{j}"].append(round(h[j] / 255.0, 6))
            yield pd.DataFrame(recs)

    return d.mapInPandas(_sample, schema).orderBy("doc_id", "frame_idx")


@register(
    "q123_resize_stub",
    # Dims derive from sha256(payload) (see q121), and the resize
    # geometry is pure IEEE double math — least/trunc/round parity
    # verified exhaustively for every (w, h) in [64,255]² — so the
    # full pipeline including the binary thumbnail is hash-graded.
    oracle="""
WITH m AS (
  SELECT doc_id, sha256(text) AS hx,
         64 + CAST(concat('0x', substr(sha256(text), 1, 2)) AS INT) % 192 AS w,
         64 + CAST(concat('0x', substr(sha256(text), 3, 2)) AS INT) % 192 AS h
  FROM documents
),
g AS (
  SELECT doc_id, hx, w, h, least(256.0 / w, 256.0 / h) AS sc FROM m
),
sized AS (
  SELECT doc_id, hx, w, h, sc,
         greatest(1, CAST(trunc(w * sc) AS INT)) AS dw,
         greatest(1, CAST(trunc(h * sc) AS INT)) AS dh
  FROM g
)
SELECT doc_id, w AS src_w, h AS src_h, dw AS dst_w, dh AS dst_h,
       round(sc, 6) AS scale,
       substr(hx, 1, 2 * greatest(4, dh % 32)) AS thumb_hex
FROM sized
""",
    tags=("multimodal", "stub", "resize"),
)
def q123_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over binary columns: mapInPandas pass that
    "decodes" each blob (STUB — sha256-derived dims standing in for a
    real codec), computes the aspect-preserving target box inside
    256×256, and emits a deterministic "thumbnail" payload. The
    geometry math, schema, and binary-out plumbing are the real
    production shape for a PIL `Image.resize` worker; only
    `_fake_decode` would change on a cluster with codecs."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    # the thumbnail crosses the hash boundary hex-rendered: raw
    # binary cells stringify as bytes vs bytearray across engines,
    # which breaks the driver's value hash (a real impl emits JPEG
    # bytes and skips the oracle)
    schema = (
        "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
        "scale double, thumb_hex string"
    )
    TARGET = 256

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "src_w", "src_h", "dst_w", "dst_h", "scale", "thumb_hex")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(blob)
                meta = _fake_decode(payload)
                w, h = meta["width"], meta["height"]
                scale = min(TARGET / w, TARGET / h)
                dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
                recs["doc_id"].append(doc_id)
                recs["src_w"].append(w)
                recs["src_h"].append(h)
                recs["dst_w"].append(dw)
                recs["dst_h"].append(dh)
                recs["scale"].append(round(scale, 6))
                # STUB thumbnail: digest-derived bytes sized to the
                # target box's row count (a real impl emits JPEG bytes)
                thumb = hashlib.sha256(payload).digest()[: max(4, dh % 32)]
                recs["thumb_hex"].append(thumb.hex())
            yield pd.DataFrame(recs)

    return d.mapInPandas(_resize, schema).orderBy("doc_id")
