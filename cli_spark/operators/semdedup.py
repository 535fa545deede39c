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

* quantized coordinates (1e-6) → integer dot products via
  zip_with/aggregate (JVM higher-order functions, no Python);
* cos_ppm = floor(dot·1e6 / sqrt(‖a‖²·‖b‖²)) with the identical IEEE
  expression in both engines (int→double casts, multiply, sqrt,
  divide — each correctly rounded, hence bit-identical);
* the within-cluster pair join is an equi-join on cid with a hard
  cap guard on cluster size (the q72/q75/q82 contract: the quadratic
  shape refuses inputs past ground-truth scale; at corpus scale you
  raise k so clusters stay bounded — that IS the SemDeDup recipe).
"""

from __future__ import annotations

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
    pair stage is an equi-join on cluster id over quantized arrays
    (zip_with dot product — JVM-side, no explode, no Python), guarded
    against unbounded cluster sizes."""
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
    qv = e.join(mem, "vec_id").select(
        "vec_id",
        "cid",
        "qa",
        F.aggregate(
            F.col("qa"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("n2"),
    )
    a = qv.select(
        F.col("cid"), F.col("vec_id").alias("va"),
        F.col("qa").alias("arr_a"), F.col("n2").alias("n2a"),
    )
    b = qv.select(
        F.col("cid"), F.col("vec_id").alias("vb"),
        F.col("qa").alias("arr_b"), F.col("n2").alias("n2b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("arr_a"), F.col("arr_b"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos_ppm = F.floor(
        dot.cast("double") * F.lit(1000000.0)
        / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double"))
    )
    dup = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .select("cid", "va", "vb", cos_ppm.alias("cos_ppm"))
        .filter(F.col("cos_ppm") >= _TAU_PPM)
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
