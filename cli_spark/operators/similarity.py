"""Vector similarity search over the `embeddings` table
(64-dim float vectors): brute-force cosine top-K, per-group top-K,
threshold similarity join, and LSH-bucketed ANN.

Numeric determinism: cosine terms are computed in double
(float→double cast is exact), each product is quantized to an integer
at scale 1e12 via pure IEEE ops (floor(x*y*1e12 + 0.5) — identical in
both engines), summed exactly as int64, and divided back — so dot
products and norms are bit-identical across engines and partitionings
(DuckDB's list_cosine_similarity runs in float32 — verified — so
oracles use the same explicit quantized form instead).

Scale: brute-force top-K against one query vector is a broadcast of
the query + a single TakeOrderedAndProject — linear scan, no shuffle.
The threshold self-join is quadratic and is the verify step; the
LSH-bucketed variant (q82) is the scale path: bucket on sign-bit
signatures, compare only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# q82's all-pairs verify shape refuses inputs past this (module-level
# so the guard test can shrink it): ~4e10 pair comparisons worst case.
Q82_MAX_VECS = 200_000

# Exact dot product: double products quantized to int64 at scale 1e12
# (pure IEEE ops — see functions/determinism.py for why this beats a
# decimal cast), exact integer sum, back to double. `a` and `b` are
# array<float> columns. Per-term bound: |x·y|·1e12 < 2^53 ⇔ |x·y| < 9e3;
# 64-term sum < 2^63 — ample for unit-ish embeddings.
_DOT = (
    "(CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
    "floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000000.0 + 0.5)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1000000000000.0)"
)

_SQL_DOT = (
    "(CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST(list_extract({a}, i) AS DOUBLE) * CAST(list_extract({b}, i) AS DOUBLE)"
    " * 1000000000000.0 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000.0)"
)


def dot(a: str, b: str) -> Column:
    return F.expr(_DOT.format(a=a, b=b))


def sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


@register(
    "q80_knn_bruteforce",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         {sql_dot('e.embedding', 'q.qe')}
           / (sqrt({sql_dot('e.embedding', 'e.embedding')}) * sqrt({sql_dot('q.qe', 'q.qe')})) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != 0
)
SELECT vec_id, label, cosine
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
    tags=("similarity", "knn", "headline"),
)
def q80_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the canonical query vector
    (vec_id=0). Cross-join form — Spark rejects scalar subqueries
    inside higher-order functions (SURVEY.md §2 gotcha) — with the
    1-row query side broadcast; top-K is TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                dot("embedding", "qe")
                / (F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("qe", "qe")))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(10)


@register(
    "q81_knn_per_label",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         {sql_dot('e.embedding', 'q.qe')}
           / (sqrt({sql_dot('e.embedding', 'e.embedding')}) * sqrt({sql_dot('q.qe', 'q.qe')})) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != 0
),
ranked AS (
  SELECT vec_id, label, cosine,
         row_number() OVER (PARTITION BY label ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT label, vec_id, cosine, rnk FROM ranked WHERE rnk <= 3
""",
    tags=("similarity", "knn", "window"),
)
def q81_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest neighbours of the query vector *per label*
    (grouped kNN = window rank over similarity)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                dot("embedding", "qe")
                / (F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("qe", "qe")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("label", "vec_id", "cosine", "rnk")
    )


@register(
    "q82_cosine_threshold_join",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, sqrt({sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) > 0.5
""",
    tags=("similarity", "join"),
)
def q82_cosine_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine > 0.5 over all pairs.
    Norms are precomputed once per vector (n+n² work, not 3n²).
    Quadratic verify shape — q83 is the bucketed scale path.

    Guarded: the self-join is O(n²) in the vector count, so the hard
    cap below refuses to run past ground-truth-sized inputs — callers
    at scale must use q83_lsh_ann_buckets (bucketed candidates) or
    q84_ivf_ann (partition-pruned probe)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_vecs = e.count()
    if n_vecs > Q82_MAX_VECS:
        raise ValueError(
            f"q82 is the quadratic verify shape ({n_vecs} vectors > cap "
            f"{Q82_MAX_VECS}); use q83_lsh_ann_buckets or q84_ivf_ann at scale"
        )
    n = e.select(
        "vec_id", "embedding", F.sqrt(dot("embedding", "embedding")).alias("nrm")
    )
    a = n.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos > 0.5)
        .select("vec_a", "vec_b", cos.alias("cosine"))
    )


# 8 deterministic pseudo-random hyperplanes, weight[j][i] in [-0.5, 0.5)
# derived from md5(f"{j}_{i}") — no RNG, reproducible everywhere. The
# weights are baked in as literal arrays so the per-row hot path is one
# quantized dot per plane (no md5 per row — at corpus scale the
# signature pass is pure vectorized arithmetic).
import hashlib as _hashlib

_PLANES = [
    [
        int(_hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:4], 16) / 65535.0 - 0.5
        for i in range(64)
    ]
    for j in range(8)
]


def _sig_bits(arr_fmt: str, dot_fmt) -> str:
    """concat of 8 sign bits of quantized plane dots; arr_fmt wraps the
    literal weight list ('array(%s)' for Spark, '[%s]' for DuckDB)."""
    bits = []
    for plane in _PLANES:
        lits = ", ".join(repr(w) for w in plane)
        bits.append(
            f"CASE WHEN {dot_fmt('embedding', arr_fmt % lits)} >= 0 "
            "THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


@register(
    "q83_lsh_ann_buckets",
    oracle=f"""
WITH sig AS (
  SELECT vec_id, embedding,
         {_sig_bits('[%s]', sql_dot)} AS bucket
  FROM embeddings
)
SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_dot('a.embedding', 'b.embedding')}
         / (sqrt({sql_dot('a.embedding', 'a.embedding')})
            * sqrt({sql_dot('b.embedding', 'b.embedding')})) AS cosine
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
""",
    tags=("similarity", "lsh", "approx"),
)
def q83_lsh_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest-neighbour: 8 deterministic
    hyperplanes (md5-of-(plane,dim) weights, baked in as literals),
    sign-bit signature → bucket, then exact cosine only within buckets.

    This is the 100 TB ANN pattern: the all-pairs comparison collapses
    to a per-bucket join after one cheap signature pass. Repartitioning
    by bucket IS the optimization. The plane weights and quantized-int
    dot make every bucket and cosine bit-identical across engines, so
    the 'approximate' op still gets an exact oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    sig = e.select(
        "vec_id",
        "embedding",
        F.expr(_sig_bits("array(%s)", lambda a, b: _DOT.format(a=a, b=b))).alias(
            "bucket"
        ),
    )
    a = sig.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("bucket")
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("bucket")
    )
    cos = dot("ea", "eb") / (
        F.sqrt(dot("ea", "ea")) * F.sqrt(dot("eb", "eb"))
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("bucket", "vec_a", "vec_b", cos.alias("cosine"))
    )


@register(
    "q84_ivf_ann",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id % 37 = 0
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY
           {sql_dot('e.embedding', 'c.ce')}
             / (sqrt({sql_dot('e.embedding', 'e.embedding')})
                * sqrt({sql_dot('c.ce', 'c.ce')})) DESC, c.cent_id) AS rnk
  FROM embeddings e CROSS JOIN cents c
),
cells AS (
  SELECT vec_id, label, embedding, cent_id AS cell FROM assigned WHERE rnk = 1
),
probe AS (
  SELECT c.cent_id AS cell,
         {sql_dot('q.qe', 'c.ce')}
           / (sqrt({sql_dot('q.qe', 'q.qe')}) * sqrt({sql_dot('c.ce', 'c.ce')})) AS qsim
  FROM cents c CROSS JOIN q
  ORDER BY qsim DESC, c.cent_id
  LIMIT 2
)
SELECT a.cell, a.vec_id, a.label,
       {sql_dot('a.embedding', 'q.qe')}
         / (sqrt({sql_dot('a.embedding', 'a.embedding')})
            * sqrt({sql_dot('q.qe', 'q.qe')})) AS cosine
FROM cells a JOIN (SELECT cell FROM probe) p ON a.cell = p.cell CROSS JOIN q
WHERE a.vec_id != 0
ORDER BY cosine DESC, a.vec_id
LIMIT 10
""",
    tags=("similarity", "ivf", "approx"),
)
def q84_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbour — the other scale path
    next to LSH (q83): a deterministic coarse quantizer (every 37th
    vector serves as a centroid — reproducible without training) maps
    each vector to its nearest centroid cell; the query probes only
    its nprobe=2 nearest cells and brute-forces inside them.

    At 100 TB: the assignment pass is a broadcast join against ~√N
    centroids; the probe reads ~nprobe/ncells of the corpus. Inverted
    lists would be materialized as a `cell`-partitioned parquet layout
    so the probe is a partition-pruned scan.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    cos_vc = dot("embedding", "ce") / (
        F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("ce", "ce"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "embedding", "cent_id", cos_vc.alias("sim"))
        .withColumn("rnk", F.row_number().over(w_assign))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "label", "embedding", F.col("cent_id").alias("cell"))
    )
    # query = vec 0; its 2 nearest centroid cells
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cent_id",
            (
                dot("qe", "ce")
                / (F.sqrt(dot("qe", "qe")) * F.sqrt(dot("ce", "ce")))
            ).alias("qsim"),
        )
        .orderBy(F.col("qsim").desc(), F.col("cent_id"))
        .limit(2)
        .select(F.col("cent_id").alias("cell"))
    )
    cos_q = dot("embedding", "qe") / (
        F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("qe", "qe"))
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("cell", "vec_id", "label", cos_q.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "q200_embedding_decontamination",
    # eval/train membership reuses the portable md5-bucket split
    # (pipeline.py): bucket(vec_id) < 12 -> train, >= 14 -> eval.
    # Candidates come from the SAME 8-hyperplane signature as q83, so
    # the oracle mirrors the bucketing with the baked literal planes
    # and stays exact (quantized-int dots -> identical buckets and
    # cosines in both engines).
    oracle=f"""
WITH split AS (
  SELECT vec_id, embedding,
         instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1
           AS bkt,
         {_sig_bits('[%s]', sql_dot)} AS sig
  FROM embeddings
),
train AS (SELECT vec_id, embedding, sig FROM split WHERE bkt < 12),
eval_side AS (SELECT vec_id, embedding, sig FROM split WHERE bkt >= 14),
pairs AS (
  SELECT e.vec_id,
         t.vec_id AS t_vec,
         {sql_dot('e.embedding', 't.embedding')}
           / (sqrt({sql_dot('e.embedding', 'e.embedding')})
              * sqrt({sql_dot('t.embedding', 't.embedding')})) AS cosine
  FROM eval_side e LEFT JOIN train t ON e.sig = t.sig
)
SELECT vec_id,
       CAST(SUM(CASE WHEN t_vec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_candidates,
       CAST(SUM(CASE WHEN cosine > 0.85 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       round(max(cosine), 6) AS max_cosine,
       SUM(CASE WHEN cosine > 0.85 THEN 1 ELSE 0 END) > 0 AS leaked
FROM pairs
GROUP BY vec_id
""",
    tags=("similarity", "training", "decontamination"),
)
def q200_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: flag eval-split vectors whose
    nearest train-split neighbour exceeds cosine 0.85 — the semantic
    complement of q151's n-gram overlap check (paraphrased
    contamination has no shared 5-grams but lands next to its source
    in embedding space).

    Scale shape: NOT an eval×train all-pairs — both sides take the
    q83 hyperplane signature and the join is an equi-join on the
    8-bit bucket (at 100 TB: more planes / multiple tables to tune
    recall), so each eval vector compares only against its bucket's
    train vectors. Every eval vector stays in the output via the
    left join (n_candidates = 0 ⇒ max_cosine NULL, leaked false —
    an honest "no candidate checked" signal rather than a dropped
    row)."""
    e = load_table(spark, sf_dir, "embeddings")
    bkt = F.expr(
        "instr('0123456789abcdef', substr(md5(CAST(vec_id AS STRING)), 1, 1)) - 1"
    )
    sig = F.expr(_sig_bits("array(%s)", lambda a, b: _DOT.format(a=a, b=b)))
    split = e.select("vec_id", "embedding", bkt.alias("bkt"), sig.alias("sig"))
    train = split.filter(F.col("bkt") < 12).select(
        F.col("vec_id").alias("t_vec"), F.col("embedding").alias("te"), "sig"
    )
    ev = split.filter(F.col("bkt") >= 14).select(
        "vec_id", F.col("embedding").alias("ee"), "sig"
    )
    cos = dot("ee", "te") / (F.sqrt(dot("ee", "ee")) * F.sqrt(dot("te", "te")))
    pairs = ev.join(train, "sig", "left").select(
        "vec_id", "t_vec", cos.alias("cosine")
    )
    return pairs.groupBy("vec_id").agg(
        F.sum(F.when(F.col("t_vec").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_candidates"),
        F.sum(F.when(F.col("cosine") > 0.85, 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
        (F.sum(F.when(F.col("cosine") > 0.85, 1).otherwise(0)) > 0).alias("leaked"),
    )


@register(
    "q204_ann_recall_audit",
    oracle=f"""
WITH sig AS (
  SELECT vec_id, embedding,
         {_sig_bits('[%s]', sql_dot)} AS bucket
  FROM embeddings
),
queries AS (
  SELECT vec_id AS q_id, embedding AS qe, bucket AS q_bucket
  FROM sig
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 5
),
exact_scored AS (
  SELECT q.q_id, e.vec_id AS nbr,
         {sql_dot('e.embedding', 'q.qe')}
           / (sqrt({sql_dot('e.embedding', 'e.embedding')})
              * sqrt({sql_dot('q.qe', 'q.qe')})) AS cosine
  FROM sig e CROSS JOIN queries q
  WHERE e.vec_id != q.q_id
),
exact_topk AS (
  SELECT q_id, nbr FROM (
    SELECT q_id, nbr,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nbr) AS rnk
    FROM exact_scored
  ) WHERE rnk <= 10
),
ann_cand AS (
  SELECT q.q_id, e.vec_id AS nbr,
         {sql_dot('e.embedding', 'q.qe')}
           / (sqrt({sql_dot('e.embedding', 'e.embedding')})
              * sqrt({sql_dot('q.qe', 'q.qe')})) AS cosine
  FROM sig e JOIN queries q ON e.bucket = q.q_bucket
  WHERE e.vec_id != q.q_id
),
ann_topk AS (
  SELECT q_id, nbr FROM (
    SELECT q_id, nbr,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nbr) AS rnk
    FROM ann_cand
  ) WHERE rnk <= 10
),
cand_stats AS (
  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM ann_cand GROUP BY q_id
),
ann_stats AS (
  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann_topk GROUP BY q_id
),
ov AS (
  SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM exact_topk e JOIN ann_topk a ON e.q_id = a.q_id AND e.nbr = a.nbr
  GROUP BY e.q_id
)
SELECT q.q_id,
       COALESCE(c.n_candidates, 0) AS n_candidates,
       COALESCE(s.n_ann, 0) AS n_ann,
       COALESCE(o.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(o.n_overlap, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm
FROM queries q
LEFT JOIN cand_stats c ON q.q_id = c.q_id
LEFT JOIN ann_stats s ON q.q_id = s.q_id
LEFT JOIN ov o ON q.q_id = o.q_id
""",
    tags=("similarity", "ann", "audit"),
)
def q204_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 audit of the LSH index (q83's 8-plane signature)
    against exact brute force — the completeness check every ANN
    deployment runs before trusting the approximate path: for 5
    deterministic probe vectors (smallest md5(vec_id)), compare the
    bucket-restricted top-10 with the exact top-10 and report overlap
    and recall (ppm). Queries with an under-full bucket keep their
    honest n_ann < 10 instead of padding.

    Scale shape: the probe set is a broadcast TakeOrdered top-5; the
    exact side is a linear scan per probe (5 × N quantized-int dots,
    no shuffle beyond the top-K heaps); the ANN side is the q83
    bucket equi-join. The audit itself joins two ≤ 50-row relations.
    At 100 TB the probe set grows to ~1k sampled queries and the
    exact side becomes the expensive-but-rare calibration job."""
    e = load_table(spark, sf_dir, "embeddings")
    sig_expr = F.expr(_sig_bits("array(%s)", lambda a, b: _DOT.format(a=a, b=b)))
    sig = e.select("vec_id", "embedding", sig_expr.alias("bucket"))
    queries = (
        sig.orderBy(F.md5(F.encode(F.col("vec_id").cast("string"), "utf-8")), "vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    cos = dot("embedding", "qe") / (
        F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("qe", "qe"))
    )
    exact_scored = (
        sig.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("nbr"), cos.alias("cosine"))
    )
    rnk = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("nbr"))
    exact_topk = (
        exact_scored.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "nbr")
    )
    ann_cand = (
        sig.join(
            F.broadcast(queries), F.col("bucket") == F.col("q_bucket")
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("nbr"), cos.alias("cosine"))
    )
    ann_topk = (
        ann_cand.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "nbr")
    )
    cand_stats = ann_cand.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    ann_stats = ann_topk.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ann")
    )
    ov = (
        exact_topk.join(ann_topk, ["q_id", "nbr"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        queries.select("q_id")
        .join(cand_stats, "q_id", "left")
        .join(ann_stats, "q_id", "left")
        .join(ov, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_ann", F.lit(0)).cast("long").alias("n_ann"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.expr("COALESCE(n_overlap, 0) * 1000000 div 10")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


@register(
    "q211_int8_quantization_audit",
    oracle="""
WITH dims AS (
  SELECT e.vec_id, e.label, s.i AS dim,
         CAST(list_extract(e.embedding, s.i) AS DOUBLE) AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS s(i)
),
stats AS (
  SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM dims GROUP BY dim
),
quant AS (
  SELECT d.vec_id, d.label, d.dim, d.x, s.lo, s.hi,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE floor((d.x - s.lo) * 255.0 / (s.hi - s.lo) + 0.5) END AS q
  FROM dims d JOIN stats s ON d.dim = s.dim
),
err AS (
  SELECT label,
         CAST(floor(abs((CASE WHEN hi = lo THEN lo
                              ELSE lo + q * (hi - lo) / 255.0 END) - x)
                    * 1000000000.0 + 0.5) AS BIGINT) AS e_ppb
  FROM quant
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(e_ppb) AS BIGINT) AS sum_err_ppb,
       CAST(SUM(e_ppb) // COUNT(*) AS BIGINT) AS mean_err_ppb,
       CAST(MAX(e_ppb) AS BIGINT) AS max_err_ppb
FROM err GROUP BY label
""",
    tags=("similarity", "quantization", "audit"),
)
def q211_int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (256-level) per-dimension min-max quantization audit of
    the embedding table — the "can this index serve quantized"
    question every ANN deployment answers before trading 4× memory
    for recall: quantize each dimension to its own [min, max] byte
    scale, dequantize, and report absolute reconstruction error per
    label in exact integer ppb.

    Determinism note: every arithmetic step is a scalar IEEE op on
    identical operands (subtract, multiply, divide, floor) — no
    accumulation of floats ever happens (errors are quantized to
    integer ppb BEFORE the per-label sum), so both engines agree
    bitwise. Constant dimensions (hi = lo) quantize to 0 exactly.

    Scale shape: posexplode is linear (64 rows per vector); the
    per-dim stats collapse to 64 rows with map-side combined min/max
    and broadcast back onto the stream; the audit aggregate is one
    map-side combined groupBy(label). At 100 TB the stats pass and
    the audit pass are two linear scans — exactly how a production
    quantizer calibrates."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id", "label", (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    quant = dims.join(F.broadcast(stats), "dim").select(
        "label",
        "x",
        "lo",
        "hi",
        F.when(F.col("hi") == F.col("lo"), F.lit(0.0))
        .otherwise(
            F.floor((F.col("x") - F.col("lo")) * 255.0 / (F.col("hi") - F.col("lo")) + 0.5)
        )
        .alias("q"),
    )
    err = quant.select(
        "label",
        F.floor(
            F.abs(
                F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
                    F.col("lo") + F.col("q") * (F.col("hi") - F.col("lo")) / 255.0
                )
                - F.col("x")
            )
            * 1000000000.0
            + 0.5
        ).cast("long").alias("e_ppb"),
    )
    return err.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("e_ppb").cast("long").alias("sum_err_ppb"),
        F.expr("sum(e_ppb) div count(1)").cast("long").alias("mean_err_ppb"),
        F.max("e_ppb").cast("long").alias("max_err_ppb"),
    )


def _probe_rankings(spark: SparkSession, sf_dir: str):
    """Shared q293/q329 machinery: 5 md5-elected probe docs plus their
    embedding-cosine and lexical-Jaccard top-10s (probe_id, doc_id,
    rn), both with full deterministic tie-breaks. Extraction only —
    plans are identical to q293's original inline form."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    covered = d.join(
        e.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    probes = (
        covered.orderBy(
            F.md5(F.concat(F.lit("probe"), F.col("doc_id").cast("string"))),
            F.col("doc_id"),
        )
        .limit(5)
        .select(F.col("doc_id").alias("probe_id"))
    )
    ev = e.select(
        F.col("vec_id").alias("doc_id"),
        "embedding",
        F.sqrt(dot("embedding", "embedding")).alias("nrm"),
    )
    pe = probes.join(
        ev.select(
            F.col("doc_id").alias("probe_id"),
            F.col("embedding").alias("p_emb"),
            F.col("nrm").alias("p_nrm"),
        ),
        "probe_id",
    )
    cos = dot("embedding", "p_emb") / (F.col("nrm") * F.col("p_nrm"))
    we = Window.partitionBy("probe_id").orderBy(cos.desc(), F.col("doc_id").asc())
    emb_top = (
        ev.crossJoin(F.broadcast(pe))
        .filter(F.col("doc_id") != F.col("probe_id"))
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "doc_id", "rn")
    )
    terms = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("ts"),
    )
    pt = probes.join(
        terms.select(F.col("doc_id").alias("probe_id"), F.col("ts").alias("p_ts")),
        "probe_id",
    )
    jac = F.expr(
        "size(array_intersect(ts, p_ts)) * 1000000"
        " div size(array_distinct(concat(ts, p_ts)))"
    )
    wl = Window.partitionBy("probe_id").orderBy(jac.desc(), F.col("doc_id").asc())
    lex_top = (
        terms.crossJoin(F.broadcast(pt))
        .filter(F.col("doc_id") != F.col("probe_id"))
        .withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "doc_id", "rn")
    )
    return probes, emb_top, lex_top


@register(
    "q293_hybrid_search_agreement",
    oracle=f"""
WITH probes AS (
  SELECT doc_id AS probe_id FROM documents
  WHERE doc_id IN (SELECT vec_id FROM embeddings)
  ORDER BY md5('probe' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 5
),
ev AS (
  SELECT vec_id AS doc_id, embedding,
         sqrt({sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
pe AS (
  SELECT p.probe_id, e.embedding AS p_emb, e.nrm AS p_nrm
  FROM probes p JOIN ev e ON e.doc_id = p.probe_id
),
emb_ranked AS (
  SELECT pe.probe_id, ev.doc_id,
         row_number() OVER (
           PARTITION BY pe.probe_id
           ORDER BY {sql_dot('ev.embedding', 'pe.p_emb')} / (ev.nrm * pe.p_nrm)
                    DESC, ev.doc_id ASC) AS rn
  FROM ev CROSS JOIN pe WHERE ev.doc_id <> pe.probe_id
),
emb_top AS (SELECT probe_id, doc_id, rn FROM emb_ranked WHERE rn <= 10),
terms AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS ts
  FROM documents
),
pt AS (
  SELECT p.probe_id, t.ts AS p_ts FROM probes p JOIN terms t ON t.doc_id = p.probe_id
),
lex_ranked AS (
  SELECT pt.probe_id, t.doc_id,
         row_number() OVER (
           PARTITION BY pt.probe_id
           ORDER BY len(list_intersect(t.ts, pt.p_ts)) * 1000000
                    // len(list_distinct(list_concat(t.ts, pt.p_ts))) DESC,
                    t.doc_id ASC) AS rn
  FROM terms t CROSS JOIN pt WHERE t.doc_id <> pt.probe_id
),
lex_top AS (SELECT probe_id, doc_id, rn FROM lex_ranked WHERE rn <= 10)
SELECT p.probe_id,
       COALESCE(o.n_overlap, 0) AS overlap10,
       e1.doc_id AS top1_emb,
       l1.doc_id AS top1_lex,
       CASE WHEN e1.doc_id = l1.doc_id THEN 1 ELSE 0 END AS top1_match
FROM probes p
LEFT JOIN (
  SELECT e.probe_id, COUNT(*) AS n_overlap
  FROM emb_top e JOIN lex_top l ON e.probe_id = l.probe_id AND e.doc_id = l.doc_id
  GROUP BY e.probe_id
) o ON o.probe_id = p.probe_id
JOIN (SELECT probe_id, doc_id FROM emb_top WHERE rn = 1) e1 ON e1.probe_id = p.probe_id
JOIN (SELECT probe_id, doc_id FROM lex_top WHERE rn = 1) l1 ON l1.probe_id = p.probe_id
""",
    tags=("similarity", "retrieval", "evaluation"),
)
def q293_hybrid_search_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval modality agreement: for 5 md5-elected probe
    documents, compare the EMBEDDING top-10 (exact quantized-int
    cosine, the q80 ranking) against the LEXICAL top-10 (distinct-term
    Jaccard in exact integer ppm) — overlap@10 and top-1 agreement per
    probe, the offline evaluation that decides how to weight a hybrid
    (BM25 + dense) ranker. Sparse and dense retrieval disagreeing is
    the signal that reranking is worth its cost.

    Scale shape: the 5-row probe relation broadcasts onto both the
    vector relation and the term relation (two linear scans, no pair
    explosion); per-probe top-10s are bounded windows; the overlap
    join touches ≤ 50 rows per side. Both rankings carry full
    deterministic tie-breaks."""
    probes, emb_top, lex_top = _probe_rankings(spark, sf_dir)
    overlap = (
        emb_top.join(lex_top, ["probe_id", "doc_id"])
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    e1 = emb_top.filter(F.col("rn") == 1).select("probe_id", F.col("doc_id").alias("top1_emb"))
    l1 = lex_top.filter(F.col("rn") == 1).select("probe_id", F.col("doc_id").alias("top1_lex"))
    return (
        probes.join(overlap, "probe_id", "left")
        .join(e1, "probe_id")
        .join(l1, "probe_id")
        .select(
            "probe_id",
            F.coalesce("n_overlap", F.lit(0)).alias("overlap10"),
            "top1_emb",
            "top1_lex",
            F.when(F.col("top1_emb") == F.col("top1_lex"), 1).otherwise(0)
            .alias("top1_match"),
        )
    )


@register(
    "q320_mrl_truncation_audit",
    # Exact fixed-point dots (the _SQL_DOT/_DOT 1e-12 quantization)
    # on the full 64 dims vs the 16-dim prefix; top-10 per query by
    # (score desc, vec_id) on both sides; overlap census per query.
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe, embedding[1:16] AS qe16
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id, embedding, embedding[1:16] AS e16
  FROM embeddings WHERE vec_id >= 5
),
scored AS (
  SELECT q.q_id, c.vec_id,
         {sql_dot('c.embedding', 'q.qe')} AS s_full,
         {sql_dot('c.e16', 'q.qe16')} AS s_trunc
  FROM c CROSS JOIN q
),
rf AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY s_full DESC, vec_id) AS r
  FROM scored
),
rt AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY s_trunc DESC, vec_id) AS r
  FROM scored
),
tf AS (SELECT q_id, vec_id FROM rf WHERE r <= 10),
tt AS (SELECT q_id, vec_id FROM rt WHERE r <= 10),
ov AS (
  SELECT tf.q_id, COUNT(*) AS n_overlap
  FROM tf JOIN tt ON tf.q_id = tt.q_id AND tf.vec_id = tt.vec_id
  GROUP BY tf.q_id
)
SELECT q.q_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
       COALESCE(ov.n_overlap, 0) * 1000000 // (20 - COALESCE(ov.n_overlap, 0))
         AS jaccard_ppm
FROM (SELECT DISTINCT q_id FROM q) q LEFT JOIN ov ON q.q_id = ov.q_id
""",
    tags=("similarity", "embeddings", "matryoshka"),
)
def q320_mrl_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al., NeurIPS'22 MRL):
    how much of each query's full-dimension top-10 survives when
    vectors are truncated to their 16-dim prefix — the measurement
    that decides whether an index can serve the cheap prefix tier and
    rerank with full vectors (the standard MRL deployment). Five
    query vectors against the corpus: exact fixed-point dot products
    at both widths, top-10 per (query, width) with vec_id
    tie-breaks, overlap and set-Jaccard in exact ppm.

    Scale shape: the query side is a broadcast 5-row relation (the
    q80 contract — never a vector cross product between corpus rows);
    per-query ranking is TakeOrdered-sized (top-10 of a partitioned
    window over q_id); truncation is a zero-copy array slice, scored
    in the same scan pass as the full dot."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.slice("embedding", 1, 16).alias("qe16"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, 16).alias("e16"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        dot("embedding", "qe").alias("s_full"),
        dot("e16", "qe16").alias("s_trunc"),
    )
    from pyspark.sql.window import Window

    wf = Window.partitionBy("q_id").orderBy(F.col("s_full").desc(), F.col("vec_id"))
    wt = Window.partitionBy("q_id").orderBy(F.col("s_trunc").desc(), F.col("vec_id"))
    tf = scored.withColumn("r", F.row_number().over(wf)).filter("r <= 10").select("q_id", "vec_id")
    tt = scored.withColumn("r", F.row_number().over(wt)).filter("r <= 10").select("q_id", "vec_id")
    ov = tf.join(tt, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    qs = q.select("q_id").distinct()
    return qs.join(ov, "q_id", "left").select(
        "q_id",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        F.expr(
            "coalesce(n_overlap, 0) * 1000000 div (20 - coalesce(n_overlap, 0))"
        ).alias("jaccard_ppm"),
    )


# Fixed-point DCG discounts: floor(1e6 / log2(rank + 1)) for ranks
# 1..10, precomputed as shared literals so neither engine evaluates a
# float log — the same table appears in the q328 oracle.
_DCG = (1000000, 630929, 500000, 430676, 386852,
        356207, 333333, 315464, 301029, 289064)
_SQL_DCG = "[" + ", ".join(str(d) for d in _DCG) + "]"


@register(
    "q328_retrieval_metrics",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe, label AS q_label
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         {sql_dot('e.embedding', 'q.qe')} AS s
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id >= 5
),
ranked AS (
  SELECT q_id, q_label, vec_id, label, s,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id) AS r
  FROM scored
),
top10 AS (SELECT * FROM ranked WHERE r <= 10),
rel_total AS (
  SELECT q_id, COUNT(*) AS n_rel
  FROM scored WHERE label = q_label GROUP BY q_id
),
dcg AS (
  SELECT q_id,
         COALESCE(MIN(CASE WHEN label = q_label THEN r END), 0) AS first_rel,
         CAST(COALESCE(SUM(CASE WHEN label = q_label
              THEN list_extract({_SQL_DCG}, r) END), 0) AS BIGINT) AS dcg_fp,
         CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
           AS rel_in_top10
  FROM top10 GROUP BY q_id
)
SELECT d.q_id,
       d.rel_in_top10,
       CASE WHEN d.first_rel = 0 THEN 0
            ELSE 1000000 // d.first_rel END AS mrr_ppm,
       CASE WHEN COALESCE(t.n_rel, 0) = 0 THEN NULL
            ELSE d.dcg_fp * 1000000 // (
              SELECT CAST(SUM(list_extract({_SQL_DCG}, i.i)) AS BIGINT)
              FROM unnest(generate_series(1, LEAST(t.n_rel, 10))) AS i(i))
       END AS ndcg_ppm
FROM dcg d LEFT JOIN rel_total t ON d.q_id = t.q_id
""",
    tags=("similarity", "evaluation", "ndcg"),
)
def q328_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation — MRR and nDCG@10 per query (Järvelin &
    Kekäläinen 2002), the scoreboard every embedding-search change is
    judged by: five query vectors rank the corpus by exact fixed-
    point dot product, relevance = label match, and both metrics are
    computed in pure integer arithmetic — the log2 rank discounts are
    a shared 10-entry literal table (floor(1e6/log2(r+1))), so no
    float log ever evaluates in either engine and the ppm results
    hash bit-exactly. Ideal DCG uses min(total relevant, 10)
    discounts, the standard truncated-ideal normalization.

    Scale shape: the q80 contract — query side broadcast, per-query
    ranking top-10-bounded, relevance totals one census; the metric
    arithmetic runs on ≤ 10 rows per query whatever the corpus
    size."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("q_label"),
    )
    scored = (
        e.filter(F.col("vec_id") >= 5)
        .crossJoin(F.broadcast(q))
        .select("q_id", "q_label", "vec_id", "label", dot("embedding", "qe").alias("s"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("vec_id"))
    ranked = scored.withColumn("r", F.row_number().over(w))
    top10 = ranked.filter(F.col("r") <= 10)
    rel_total = (
        scored.filter(F.col("label") == F.col("q_label"))
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    dcg_arr = F.array(*[F.lit(d) for d in _DCG])
    dcg = top10.groupBy("q_id").agg(
        F.coalesce(
            F.min(F.when(F.col("label") == F.col("q_label"), F.col("r"))),
            F.lit(0),
        ).alias("first_rel"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("label") == F.col("q_label"),
                    F.element_at(dcg_arr, F.col("r")),
                )
            ),
            F.lit(0),
        ).cast("long").alias("dcg_fp"),
        F.sum(
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
        ).cast("long").alias("rel_in_top10"),
    )
    idcg = F.aggregate(
        F.slice(dcg_arr, 1, F.least(F.coalesce(F.col("n_rel"), F.lit(0)), F.lit(10))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        dcg.join(rel_total, "q_id", "left")
        .withColumn("idcg_fp", idcg)
        .select(
            "q_id",
            "rel_in_top10",
            F.when(F.col("first_rel") == 0, 0)
            .otherwise(F.expr("1000000 div first_rel")).alias("mrr_ppm"),
            F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0,
                   F.lit(None).cast("long"))
            .otherwise(F.expr("dcg_fp * 1000000 div idcg_fp"))
            .alias("ndcg_ppm"),
        )
    )


@register(
    "q329_reciprocal_rank_fusion",
    # RRF k=60 over the q293 rankings: contribution = 1e6 // (60+rn)
    # per list (missing list → 0), fused top-3 per probe by
    # (score desc, doc_id).
    oracle=f"""
WITH probes AS (
  SELECT doc_id AS probe_id FROM documents
  WHERE doc_id IN (SELECT vec_id FROM embeddings)
  ORDER BY md5('probe' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 5
),
ev AS (
  SELECT vec_id AS doc_id, embedding,
         sqrt({sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
pe AS (
  SELECT p.probe_id, e.embedding AS p_emb, e.nrm AS p_nrm
  FROM probes p JOIN ev e ON e.doc_id = p.probe_id
),
emb_ranked AS (
  SELECT pe.probe_id, ev.doc_id,
         row_number() OVER (
           PARTITION BY pe.probe_id
           ORDER BY {sql_dot('ev.embedding', 'pe.p_emb')} / (ev.nrm * pe.p_nrm)
                    DESC, ev.doc_id ASC) AS rn
  FROM ev CROSS JOIN pe WHERE ev.doc_id <> pe.probe_id
),
emb_top AS (SELECT probe_id, doc_id, rn FROM emb_ranked WHERE rn <= 10),
terms AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS ts
  FROM documents
),
pt AS (
  SELECT p.probe_id, t.ts AS p_ts FROM probes p JOIN terms t ON t.doc_id = p.probe_id
),
lex_ranked AS (
  SELECT pt.probe_id, t.doc_id,
         row_number() OVER (
           PARTITION BY pt.probe_id
           ORDER BY len(list_intersect(t.ts, pt.p_ts)) * 1000000
                    // len(list_distinct(list_concat(t.ts, pt.p_ts))) DESC,
                    t.doc_id ASC) AS rn
  FROM terms t CROSS JOIN pt WHERE t.doc_id <> pt.probe_id
),
lex_top AS (SELECT probe_id, doc_id, rn FROM lex_ranked WHERE rn <= 10),
fused AS (
  SELECT COALESCE(e.probe_id, l.probe_id) AS probe_id,
         COALESCE(e.doc_id, l.doc_id) AS doc_id,
         CAST(COALESCE(1000000 // (60 + e.rn), 0)
              + COALESCE(1000000 // (60 + l.rn), 0) AS BIGINT) AS rrf_fp
  FROM emb_top e FULL OUTER JOIN lex_top l
    ON e.probe_id = l.probe_id AND e.doc_id = l.doc_id
),
ranked AS (
  SELECT probe_id, doc_id, rrf_fp,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY rrf_fp DESC, doc_id) AS fused_rank
  FROM fused
)
SELECT probe_id, fused_rank, doc_id, rrf_fp
FROM ranked WHERE fused_rank <= 3
""",
    tags=("similarity", "hybrid", "rrf"),
)
def q329_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    — the standard way production hybrid search merges a dense and a
    sparse ranking without score calibration: each list contributes
    1/(k + rank) with k = 60, here in exact integer fixed-point
    (1e6 // (60 + rank)) so both engines fuse identically. Reuses the
    q293 rankings (embedding cosine + lexical Jaccard top-10 per
    probe); unions via full outer join (a doc in one list only still
    scores), reports the fused top-3 per probe.

    Scale shape: everything after the two q293 rankings runs on
    ≤ 20 rows per probe — fusion cost is independent of corpus
    size."""
    _probes, emb_top, lex_top = _probe_rankings(spark, sf_dir)
    e_r = emb_top.select("probe_id", "doc_id", F.col("rn").alias("e_rn"))
    l_r = lex_top.select("probe_id", "doc_id", F.col("rn").alias("l_rn"))
    fused = (
        e_r.join(l_r, ["probe_id", "doc_id"], "full_outer")
        .select(
            "probe_id",
            "doc_id",
            (
                F.coalesce(F.expr("1000000 div (60 + e_rn)"), F.lit(0))
                + F.coalesce(F.expr("1000000 div (60 + l_rn)"), F.lit(0))
            ).cast("long").alias("rrf_fp"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("rrf_fp").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 3)
        .select("probe_id", "fused_rank", "doc_id", "rrf_fp")
    )


# Sign-bit packing for q374: two 32-bit halves (lo = dims 0-31,
# hi = dims 32-63) so neither engine shifts into the int64 sign bit.
# Distinct powers of two make SUM equivalent to OR.
_PACK = (
    "aggregate(sequence({s}, {e}), CAST(0 AS BIGINT), "
    "(acc, i) -> acc + IF({col}[i] > CAST(0 AS DOUBLE), "
    "shiftleft(CAST(1 AS BIGINT), i - {s}), CAST(0 AS BIGINT)))"
)
_SQL_PACK = (
    "list_sum(list_transform(generate_series({s}, {e}), i -> "
    "CASE WHEN {col}[i] > 0 THEN (1::BIGINT << (i - {s})) ELSE 0::BIGINT END))"
)


@register(
    "q374_binary_quantization_recall",
    # Exact integer surface end to end: sign-bit packing into two
    # 32-bit halves, Hamming via bit_count(xor), fixed-point dots for
    # ground truth and rerank; all ranks tie-broken on vec_id.
    oracle=f"""
WITH packed AS (
  SELECT vec_id, embedding,
         {_SQL_PACK.format(col='embedding', s=1, e=32)} AS lo,
         {_SQL_PACK.format(col='embedding', s=33, e=64)} AS hi
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS qe, lo AS qlo, hi AS qhi
      FROM packed WHERE vec_id < 5),
c AS (SELECT vec_id, embedding, lo, hi FROM packed WHERE vec_id >= 5),
scored AS (
  SELECT q.q_id, c.vec_id,
         {sql_dot('c.embedding', 'q.qe')} AS s_exact,
         CAST(bit_count(xor(c.lo, q.qlo)) + bit_count(xor(c.hi, q.qhi))
              AS BIGINT) AS hamming
  FROM c CROSS JOIN q
),
re AS (
  SELECT q_id, vec_id, hamming, s_exact,
         row_number() OVER (PARTITION BY q_id ORDER BY s_exact DESC, vec_id)
           AS r_exact,
         row_number() OVER (PARTITION BY q_id ORDER BY hamming ASC, vec_id)
           AS r_ham
  FROM scored
),
exact10 AS (SELECT q_id, vec_id FROM re WHERE r_exact <= 10),
ham10 AS (SELECT q_id, vec_id FROM re WHERE r_ham <= 10),
pool30 AS (SELECT q_id, vec_id, s_exact FROM re WHERE r_ham <= 30),
rerank10 AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY s_exact DESC, vec_id) AS rr
    FROM pool30
  ) WHERE rr <= 10
),
ov_raw AS (
  SELECT e.q_id, COUNT(*) AS n
  FROM exact10 e JOIN ham10 h ON e.q_id = h.q_id AND e.vec_id = h.vec_id
  GROUP BY e.q_id
),
ov_rr AS (
  SELECT e.q_id, COUNT(*) AS n
  FROM exact10 e JOIN rerank10 h ON e.q_id = h.q_id AND e.vec_id = h.vec_id
  GROUP BY e.q_id
),
mh AS (SELECT q_id, MIN(hamming) AS min_hamming FROM scored GROUP BY q_id)
SELECT mh.q_id,
       COALESCE(ov_raw.n, 0) AS recall10_hamming,
       COALESCE(ov_rr.n, 0) AS recall10_reranked,
       mh.min_hamming
FROM mh
LEFT JOIN ov_raw ON mh.q_id = ov_raw.q_id
LEFT JOIN ov_rr ON mh.q_id = ov_rr.q_id
""",
    tags=("similarity", "embeddings", "quantization", "binary"),
)
def q374_binary_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) vector quantization with exact rerank — the
    64x-compression retrieval tier every large vector store now ships
    (1 bit/dim + Hamming distance, then exact rerank of a small
    candidate pool): each 64-dim float vector packs into two 32-bit
    sign masks, candidates rank by Hamming distance
    bit_count(xor(lo)) + bit_count(xor(hi)), and the audit grades
    recall@10 of (a) raw Hamming top-10 and (b) Hamming top-30
    reranked by exact fixed-point dot — the deployment decision
    between them is exactly what this census measures.

    Scale shape: packing is one JVM-side aggregate over the dims (no
    Python), queries broadcast (q80 contract), Hamming is two XORs +
    popcounts per candidate — SIMD-friendly codegen — and the rerank
    pool bounds exact-dot work at 30 rows/query no matter the corpus
    size. At 100 TB the packed masks are 16 bytes/vector, so the
    whole candidate scan reads 64x less than the float tier."""
    e = load_table(spark, sf_dir, "embeddings")
    packed = e.select(
        "vec_id",
        "embedding",
        F.expr(_PACK.format(col="embedding", s=0, e=31)).alias("lo"),
        F.expr(_PACK.format(col="embedding", s=32, e=63)).alias("hi"),
    )
    q = packed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    c = packed.filter(F.col("vec_id") >= 5)
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        dot("embedding", "qe").alias("s_exact"),
        (
            F.bit_count(F.expr("lo ^ qlo")) + F.bit_count(F.expr("hi ^ qhi"))
        ).cast("long").alias("hamming"),
    )
    we = Window.partitionBy("q_id").orderBy(F.col("s_exact").desc(), F.col("vec_id"))
    wh = Window.partitionBy("q_id").orderBy(F.col("hamming").asc(), F.col("vec_id"))
    re = (
        scored.withColumn("r_exact", F.row_number().over(we))
        .withColumn("r_ham", F.row_number().over(wh))
    )
    exact10 = re.filter("r_exact <= 10").select("q_id", "vec_id")
    ham10 = re.filter("r_ham <= 10").select("q_id", "vec_id")
    wrr = Window.partitionBy("q_id").orderBy(F.col("s_exact").desc(), F.col("vec_id"))
    rerank10 = (
        re.filter("r_ham <= 30")
        .select("q_id", "vec_id", "s_exact")
        .withColumn("rr", F.row_number().over(wrr))
        .filter("rr <= 10")
        .select("q_id", "vec_id")
    )
    ov_raw = exact10.join(ham10, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("recall10_hamming")
    )
    ov_rr = exact10.join(rerank10, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("recall10_reranked")
    )
    mh = scored.groupBy("q_id").agg(F.min("hamming").alias("min_hamming"))
    return (
        mh.join(ov_raw, "q_id", "left")
        .join(ov_rr, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("recall10_hamming", F.lit(0)).alias("recall10_hamming"),
            F.coalesce("recall10_reranked", F.lit(0)).alias("recall10_reranked"),
            "min_hamming",
        )
    )


# Raw integer dot for q375 (the _DOT quantization WITHOUT the final
# divide): exact int64 at scale 1e12, so squared distances and their
# sums stay in exact integer arithmetic end to end.
_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000000.0 + 0.5)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)
_SQL_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST(list_extract({a}, i) AS DOUBLE) * "
    "CAST(list_extract({b}, i) AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT)))"
    " AS BIGINT)"
)


def _kmpp_u48(round_tag: str, engine: str) -> str:
    """Portable 48-bit uniform from md5('<round>|<vec_id>') — the
    q105/audit hex-digit idiom, identical text in both engines up to
    the STRING/VARCHAR cast keyword."""
    cast = "STRING" if engine == "spark" else "VARCHAR"
    key = f"'{round_tag}|' || CAST(vec_id AS {cast})"
    return " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({key}), {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (11 - i)}"
        for i in range(12)
    )


@register(
    "q375_kmeans_parallel_init",
    # Two unrolled k-means|| rounds with hash-derandomized draws:
    # pick x iff u48(x) * phi < l * d2(x) * 2^48 (exact integer cross-
    # multiplication — HUGEINT here, DECIMAL(38,0) on the Spark side).
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         {_SQL_IDOT.format(a='embedding', b='embedding')} AS sxx
  FROM embeddings
),
c0 AS (SELECT embedding AS ce, sxx AS scc FROM e WHERE vec_id = 0),
d1 AS (
  SELECT e.vec_id, e.embedding, e.sxx,
         e.sxx - 2 * {_SQL_IDOT.format(a='e.embedding', b='c0.ce')} + c0.scc
           AS d2
  FROM e CROSS JOIN c0
),
phi1 AS (SELECT SUM(d2) AS phi FROM d1),
p1 AS (
  SELECT d1.vec_id, d1.embedding, d1.sxx
  FROM d1 CROSS JOIN phi1
  WHERE ({_kmpp_u48('r1', 'duck')})::HUGEINT * phi1.phi::HUGEINT
        < 8::HUGEINT * d1.d2::HUGEINT * 281474976710656::HUGEINT
),
d2r AS (
  SELECT d1.vec_id, d1.embedding, d1.sxx,
         LEAST(d1.d2, COALESCE(m.md2, d1.d2)) AS d2
  FROM d1
  LEFT JOIN (
    SELECT d1.vec_id,
           MIN(d1.sxx - 2 * {_SQL_IDOT.format(a='d1.embedding', b='p1.embedding')}
               + p1.sxx) AS md2
    FROM d1 CROSS JOIN p1
    GROUP BY d1.vec_id
  ) m ON d1.vec_id = m.vec_id
),
phi2 AS (SELECT SUM(d2) AS phi FROM d2r),
p2 AS (
  SELECT d2r.vec_id, d2r.embedding, d2r.sxx
  FROM d2r CROSS JOIN phi2
  WHERE ({_kmpp_u48('r2', 'duck')})::HUGEINT * phi2.phi::HUGEINT
        < 8::HUGEINT * d2r.d2::HUGEINT * 281474976710656::HUGEINT
),
cand AS (
  SELECT vec_id, embedding, sxx, MIN(round) AS round_first_picked
  FROM (
    SELECT vec_id, embedding, sxx, 0 AS round FROM e WHERE vec_id = 0
    UNION ALL SELECT vec_id, embedding, sxx, 1 FROM p1
    UNION ALL SELECT vec_id, embedding, sxx, 2 FROM p2
  ) GROUP BY vec_id, embedding, sxx
),
assign AS (
  SELECT vec_id, center_id FROM (
    SELECT e.vec_id, cand.vec_id AS center_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY e.sxx - 2 * {_SQL_IDOT.format(a='e.embedding', b='cand.embedding')}
                      + cand.sxx ASC,
                      cand.vec_id ASC) AS r
    FROM e CROSS JOIN cand
  ) WHERE r = 1
),
weighted AS (
  SELECT cand.vec_id AS center_id, cand.round_first_picked,
         COUNT(assign.vec_id) AS weight
  FROM cand LEFT JOIN assign ON assign.center_id = cand.vec_id
  GROUP BY cand.vec_id, cand.round_first_picked
)
SELECT CAST(center_id AS BIGINT) AS center_id,
       CAST(round_first_picked AS INTEGER) AS round_first_picked,
       CAST(weight AS BIGINT) AS weight
FROM weighted
ORDER BY weight DESC, center_id ASC
LIMIT 4
""",
    tags=("similarity", "clustering", "kmeans_parallel", "init"),
)
def q375_kmeans_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| initialization (Bahmani et al., VLDB'12 "Scalable
    k-means++") — the distributed seeding that replaced sequential
    k-means++ at cluster scale: instead of k strictly-serial D²
    draws, each of O(log n) rounds samples ~l points IN PARALLEL with
    probability l·d²(x,C)/φ, then the oversampled candidate set is
    weighted by how many points it captures. Two rounds unrolled
    (l = 8, seed = vec_id 0), every draw DERANDOMIZED into a portable
    48-bit md5 threshold — pick x iff u48 · φ < l · d²(x) · 2^48,
    compared by exact integer cross-multiplication (DECIMAL(38,0)
    here, HUGEINT in the oracle) so no float division decides
    membership — and distances in the raw int64 fixed-point dot.
    Output: the top-4 candidates by captured weight, the
    deterministic stand-in for the weighted recluster step.

    Scale shape: each round is ONE scan (distance to the broadcast
    center set + a 1-row φ aggregate crossjoined back) — the whole
    init is O(rounds) passes with no shuffle wider than the ~l·rounds
    candidate relation, exactly why Bahmani beats sequential ++ on
    100 TB: k sequential passes become log n parallel ones."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.expr(_IDOT.format(a="embedding", b="embedding")).alias("sxx"),
    )
    c0 = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("ce"), F.col("sxx").alias("scc")
    )
    d1 = e.crossJoin(F.broadcast(c0)).select(
        "vec_id", "embedding", "sxx",
        (F.col("sxx")
         - 2 * F.expr(_IDOT.format(a="embedding", b="ce"))
         + F.col("scc")).alias("d2"),
    )
    u1 = _kmpp_u48("r1", "spark")
    pick = (
        "CAST({u} AS DECIMAL(38,0)) * CAST(phi AS DECIMAL(38,0)) < "
        "CAST(8 AS DECIMAL(38,0)) * CAST(d2 AS DECIMAL(38,0)) * "
        "CAST(281474976710656 AS DECIMAL(38,0))"
    )
    phi1 = d1.agg(F.sum("d2").alias("phi"))
    p1 = (
        d1.crossJoin(F.broadcast(phi1))
        .filter(F.expr(pick.format(u=u1)))
        .select("vec_id", "embedding", "sxx")
    )
    m = (
        d1.select("vec_id", "embedding", "sxx")
        .crossJoin(
            F.broadcast(p1.select(F.col("embedding").alias("pe"),
                                  F.col("sxx").alias("psxx")))
        )
        .groupBy("vec_id")
        .agg(
            F.min(
                F.col("sxx")
                - 2 * F.expr(_IDOT.format(a="embedding", b="pe"))
                + F.col("psxx")
            ).alias("md2")
        )
    )
    d2r = (
        d1.join(m, "vec_id", "left")
        .select(
            "vec_id", "embedding", "sxx",
            F.least("d2", F.coalesce("md2", "d2")).alias("d2"),
        )
    )
    phi2 = d2r.agg(F.sum("d2").alias("phi"))
    u2 = _kmpp_u48("r2", "spark")
    p2 = (
        d2r.crossJoin(F.broadcast(phi2))
        .filter(F.expr(pick.format(u=u2)))
        .select("vec_id", "embedding", "sxx")
    )
    cand = (
        e.filter(F.col("vec_id") == 0)
        .select("vec_id", "embedding", "sxx", F.lit(0).alias("round"))
        .unionAll(p1.withColumn("round", F.lit(1)))
        .unionAll(p2.withColumn("round", F.lit(2)))
        .groupBy("vec_id", "embedding", "sxx")
        .agg(F.min("round").alias("round_first_picked"))
    )
    cb = F.broadcast(
        cand.select(
            F.col("vec_id").alias("center_id"),
            F.col("embedding").alias("ce"),
            F.col("sxx").alias("csxx"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        (F.col("sxx") - 2 * F.expr(_IDOT.format(a="embedding", b="ce"))
         + F.col("csxx")).asc(),
        F.col("center_id").asc(),
    )
    assign = (
        e.crossJoin(cb)
        .withColumn("r", F.row_number().over(w))
        .filter("r = 1")
        .select("vec_id", "center_id")
    )
    counts = assign.groupBy("center_id").agg(
        F.count(F.lit(1)).alias("n_assigned")
    )
    weighted = (
        cand.select(F.col("vec_id").alias("center_id"), "round_first_picked")
        .join(counts, "center_id", "left")
        .select(
            F.col("center_id").cast("long").alias("center_id"),
            F.col("round_first_picked").cast("int").alias("round_first_picked"),
            F.coalesce("n_assigned", F.lit(0)).cast("long").alias("weight"),
        )
    )
    return weighted.orderBy(
        F.col("weight").desc(), F.col("center_id").asc()
    ).limit(4)
