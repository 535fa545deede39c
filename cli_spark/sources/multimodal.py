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
    oracle=None,  # decode is stubbed (no codecs in container) — rows-only
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
    schema = (
        "doc_id long, n_bytes int, width int, height int, n_channels int, "
        "feat array<double>"
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
                    "feat": [f["feat"] for f in feats],
                }
            )

    return d.mapInPandas(_featurize, schema).orderBy("doc_id")


@register(
    "q122_frame_sample_stub",
    oracle=None,  # decode is stubbed (no codecs in container) — rows-only
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
    schema = "doc_id long, frame_idx int, ts_ms int, feat array<double>"
    STRIDE = 5

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {"doc_id": [], "frame_idx": [], "ts_ms": [], "feat": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(blob)
                n_frames = 1 + len(payload) % 30  # STUB: "container header"
                for idx in range(0, n_frames, STRIDE):
                    h = hashlib.sha256(payload + idx.to_bytes(4, "big")).digest()
                    recs["doc_id"].append(doc_id)
                    recs["frame_idx"].append(idx)
                    recs["ts_ms"].append(idx * 40)  # 25 fps
                    recs["feat"].append([round(b / 255.0, 6) for b in h[:4]])
            yield pd.DataFrame(recs)

    return d.mapInPandas(_sample, schema).orderBy("doc_id", "frame_idx")


@register(
    "q123_resize_stub",
    oracle=None,  # decode/resample is stubbed (no codecs in container) — rows-only
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
    schema = (
        "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
        "scale double, thumb binary"
    )
    TARGET = 256

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = {k: [] for k in
                    ("doc_id", "src_w", "src_h", "dst_w", "dst_h", "scale", "thumb")}
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
                recs["thumb"].append(hashlib.sha256(payload).digest()[: max(4, dh % 32)])
            yield pd.DataFrame(recs)

    return d.mapInPandas(_resize, schema).orderBy("doc_id")
