"""SemDeDup — semantic deduplication via embedding clusters
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The insight that makes semantic dedup tractable at corpus scale: the
quadratic cosine comparison runs only WITHIN k-means clusters, never
across the corpus. Clustering bounds the pair space (N²/k per cluster
in expectation), and within a cluster the pairs above the similarity
threshold collapse onto a single keeper (lowest vec_id — the paper
keeps one representative per duplicate set; the lowest-id rule makes
the choice deterministic and engine-independent).

This implementation reuses q158's deterministic integer Lloyd
clustering verbatim (training._kmeans_membership and the matching
oracle CTE chain from training._kmeans_ctes), so the cluster
assignment is bit-identical in both engines, then:

* quantized coordinates (1e-6) → exact int64 Gram products, computed
  as chunked numpy GEMM inside applyInPandas grouped by cluster (the
  paper's actual kernel is a matrix multiply; the Arrow escape is
  ~30× the per-pair throughput of a zip_with pair join, measured at
  sf1, and block-row chunking bounds memory at O(block·n));
* cos_ppm = floor(dot·1e6 / sqrt(‖a‖²·‖b‖²)) in float64 — multiply,
  sqrt and divide are correctly rounded in numpy, the JVM and DuckDB
  alike, so the hash comparison stays bit-exact;
* a hard cap guard on cluster size (the q72/q75/q82 contract: at
  corpus scale you raise k so clusters stay bounded — that IS the
  SemDeDup recipe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.operators.training import (
    _KMEANS_ITERS,
    _KMEANS_K,
    _kmeans_ctes,
    _kmeans_membership,
)
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# Duplicate threshold: cosine >= 0.5 (500000 ppm) — deliberately the
# same bar as q75's brute-force pair list so the two surface
# comparable pair sets from opposite plan shapes.
_TAU_PPM = 500_000

# The within-cluster pair join is quadratic in cluster size; refuse
# clusters past this (module-level so the guard test can shrink it).
Q247_MAX_CLUSTER = 200_000


def _semdedup_sql() -> str:
    ctes, members = _kmeans_ctes(_KMEANS_ITERS, _KMEANS_K)
    return (
        "WITH " + ",\n".join(ctes) + f""",
mem AS (SELECT vec_id, cid FROM {members} WHERE rn = 1),
norms AS (SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS n2 FROM q GROUP BY vec_id),
dots AS (
  SELECT ma.cid, ma.vec_id AS va, mb.vec_id AS vb,
         CAST(SUM(qa.qv * qb.qv) AS BIGINT) AS dot
  FROM mem ma
  JOIN mem mb ON ma.cid = mb.cid AND ma.vec_id < mb.vec_id
  JOIN q qa ON qa.vec_id = ma.vec_id
  JOIN q qb ON qb.vec_id = mb.vec_id AND qb.pos = qa.pos
  GROUP BY ma.cid, ma.vec_id, mb.vec_id
),
sims AS (
  SELECT d.cid, d.va, d.vb,
         CAST(floor(CAST(d.dot AS DOUBLE) * 1000000.0
              / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))) AS BIGINT)
           AS cos_ppm
  FROM dots d
  JOIN norms na ON na.vec_id = d.va
  JOIN norms nb ON nb.vec_id = d.vb
),
dup AS (SELECT cid, va, vb FROM sims WHERE cos_ppm >= {_TAU_PPM}),
dropped AS (SELECT cid, COUNT(DISTINCT vb) AS n_dropped FROM dup GROUP BY cid),
pairs AS (SELECT cid, COUNT(*) AS n_dup_pairs FROM dup GROUP BY cid),
sizes AS (SELECT cid, COUNT(*) AS n_members FROM mem GROUP BY cid)
SELECT s.cid AS cluster_id, s.n_members,
       COALESCE(p.n_dup_pairs, 0) AS n_dup_pairs,
       COALESCE(dr.n_dropped, 0) AS n_dropped,
       s.n_members - COALESCE(dr.n_dropped, 0) AS n_kept
FROM sizes s
LEFT JOIN pairs p ON p.cid = s.cid
LEFT JOIN dropped dr ON dr.cid = s.cid
""")


@register(
    "q247_semdedup_prune",
    oracle=_semdedup_sql(),
    tags=("dedup", "embedding", "semdedup", "kmeans"),
)
def q247_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup census per cluster: members, duplicate pairs above
    cosine 0.5, vectors dropped (every non-lowest id in a duplicate
    pair), vectors kept. Clustering = q158's exact-integer Lloyd; the
    within-cluster pair stage is the paper's actual kernel — a Gram
    MATRIX MULTIPLY — run as chunked int64 numpy GEMM inside
    applyInPandas (the sanctioned Arrow escape: ~30× the pair
    throughput of the per-pair zip_with join it replaces, measured at
    sf1; block rows of 1024 bound memory to O(block·n) however large
    the cluster). cos_ppm = floor(dot·1e6/sqrt(‖a‖²·‖b‖²)) in float64
    — multiply/sqrt/divide are correctly rounded in numpy, the JVM,
    and DuckDB alike, so the oracle hash is still bit-exact. Guarded
    against unbounded cluster sizes (raise k, the SemDeDup recipe)."""
    mem = _kmeans_membership(spark, sf_dir).select("vec_id", "cid")

    max_cluster = (
        mem.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    if max_cluster and max_cluster > Q247_MAX_CLUSTER:
        raise ValueError(
            f"q247's within-cluster pair join is quadratic (largest cluster "
            f"{max_cluster} > cap {Q247_MAX_CLUSTER}); raise k in the "
            f"clustering stage so clusters stay bounded"
        )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
        ).alias("qa"),
    )
    qv = e.join(mem, "vec_id").select("vec_id", "cid", "qa")

    def _gram_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack(pdf["qa"].to_numpy()).astype(np.int64)  # n × 64
        n2 = (m * m).sum(axis=1)                             # exact int64
        cid = int(pdf["cid"].iloc[0])
        n = len(ids)
        out_va, out_vb, out_cos = [], [], []
        block = 1024
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            g = m[lo:hi] @ m.T                               # int64 GEMM, exact
            for r in range(lo, hi):
                # upper triangle only: j > r (ids sorted → va < vb)
                dots = g[r - lo, r + 1:]
                if dots.size == 0:
                    continue
                cos = np.floor(
                    dots.astype(np.float64) * 1000000.0
                    / np.sqrt(n2[r].astype(np.float64) * n2[r + 1:].astype(np.float64))
                )
                keep = cos >= _TAU_PPM
                if keep.any():
                    js = np.nonzero(keep)[0] + r + 1
                    out_va.extend([int(ids[r])] * len(js))
                    out_vb.extend(int(ids[j]) for j in js)
                    out_cos.extend(int(c) for c in cos[keep])
        return pd.DataFrame(
            {"cid": np.full(len(out_va), cid, dtype=np.int64),
             "va": np.array(out_va, dtype=np.int64),
             "vb": np.array(out_vb, dtype=np.int64),
             "cos_ppm": np.array(out_cos, dtype=np.int64)}
        )

    dup = qv.groupBy("cid").applyInPandas(
        _gram_pairs, "cid long, va long, vb long, cos_ppm long"
    )
    sizes = mem.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    # ONE aggregation over the pair relation for both censuses — dup's
    # lineage is the quadratic pair join, so a second consumer would
    # execute it twice (countDistinct(vb) ≡ the distinct-dropped count)
    stats = dup.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("vb").alias("n_dropped"),
    )
    return (
        sizes.join(stats, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce(F.col("n_dup_pairs"), F.lit(0)).alias("n_dup_pairs"),
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce(F.col("n_dropped"), F.lit(0))).alias("n_kept"),
        )
    )
