"""Embedding-matrix statistics — per-dimension variance ranking and
the covariance block over the leading dimensions.

These are the offline-analytics passes an embedding index runs before
choosing a compression/indexing scheme (which dims carry signal, how
correlated they are — the inputs to PCA/OPQ decisions), expressed as
exact integer moment sums so the oracle hash is bit-stable:

* coordinates quantize at 1e-6 (floor(x·1e6 + 0.5) — a float32
  embedding has ~7 significant digits, so the quantization is below
  coordinate noise);
* moment accumulators are decimal(38,0) in Spark (wide_sum) mirroring
  DuckDB's HUGEINT widening — squared-moment sums overflow int64 at
  scale (determinism.py module note); outputs are cast back to BIGINT
  (safe: the *sums* at graded scale are < 2^63, only the n·Σq² rank
  comparison needs the wide type, and that stays internal);
* q242 is one scan → posexplode → 64-group aggregate (map-side
  combine collapses each partition to 64 rows before the exchange);
  q243 never explodes at all — the 8×8 covariance grid is 36 paired
  products computed as plain projection columns in the scan stage and
  aggregated per label, then unpivoted with stack(). One scan, no
  join, no shuffle wider than |labels|·36 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.functions.determinism import wide_sum
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_Q = "CAST(floor(CAST({x} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"

_N_DIMS_COV = 8  # q243: covariance over the leading 8 dims (36 pairs)


@register(
    "q242_dim_variance_rank",
    oracle=f"""
WITH coords AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         {_Q.format(x="unnest(embedding)")} AS q
  FROM embeddings
),
moments AS (
  SELECT dim, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS sum_q,
         SUM(q * q) AS ssq
  FROM coords GROUP BY dim
)
SELECT dim, n, sum_q, CAST(ssq AS BIGINT) AS sumsq_q,
       CAST(row_number() OVER (
         ORDER BY n * ssq - CAST(sum_q AS HUGEINT) * sum_q DESC, dim ASC)
         AS BIGINT) AS var_rank
FROM moments
""",
    tags=("embeddings", "statistics"),
)
def q242_dim_variance_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking of the embedding matrix: exact
    integer moment sums (n, Σq, Σq²) per dimension and the dimensions
    ranked by variance numerator n·Σq² − (Σq)² — every n is identical,
    so the rank equals the variance rank without any division. The
    rank comparison runs in wide integers (decimal(38,0) vs HUGEINT),
    the emitted sums fit BIGINT at graded scales. One posexplode →
    64-group aggregate; the ranking window sees 64 rows."""
    e = load_table(spark, sf_dir, "embeddings")
    coords = e.select(
        F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.expr(_Q.format(x="x")).alias("q"),
    )
    moments = coords.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sum_q"),
        wide_sum(F.col("q") * F.col("q")).alias("ssq"),
    )
    var_num = (
        F.col("n").cast("decimal(38,0)") * F.col("ssq")
        - F.col("sum_q").cast("decimal(38,0)") * F.col("sum_q").cast("decimal(38,0)")
    )
    w = Window.orderBy(var_num.desc(), F.col("dim").asc())
    return moments.select(
        "dim",
        "n",
        "sum_q",
        F.col("ssq").cast("long").alias("sumsq_q"),
        F.row_number().over(w).cast("long").alias("var_rank"),
    )


def _cov_pairs() -> list[tuple[int, int]]:
    return [
        (i, j)
        for i in range(1, _N_DIMS_COV + 1)
        for j in range(1, _N_DIMS_COV + 1)
        if i <= j
    ]


@register(
    "q243_covariance_blocks",
    oracle=f"""
WITH q AS (
  SELECT label,
         {", ".join(_Q.format(x=f"embedding[{i}]") + f" AS q{i}" for i in range(1, _N_DIMS_COV + 1))}
  FROM embeddings
),
agg AS (
  SELECT label, COUNT(*) AS n,
         {", ".join(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}" for i in range(1, _N_DIMS_COV + 1))},
         {", ".join(f"CAST(SUM(q{i} * q{j}) AS BIGINT) AS s{i}_{j}" for i, j in _cov_pairs())}
  FROM q GROUP BY label
)
{" UNION ALL ".join(
    f"SELECT label, n, {i} AS i, {j} AS j, s{i}_{j} AS s_ij, s{i} AS s_i, s{j} AS s_j FROM agg"
    for i, j in _cov_pairs()
)}
""",
    tags=("embeddings", "statistics", "covariance"),
)
def q243_covariance_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance block of the leading 8 embedding dimensions per
    label: for every dim pair i ≤ j the exact integer sums (n, Σqᵢqⱼ,
    Σqᵢ, Σqⱼ) from which cov = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ)/n² follows. The 36
    paired products are plain projection columns inside the scan stage
    (no explode, no self-join — the classic unpivoted-Gram trick), one
    aggregate per label, then a stack() unpivot of the |labels|-row
    result into the (label, i, j) grid."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = _cov_pairs()
    qcols = [
        F.expr(_Q.format(x=f"element_at(embedding, {i})")).alias(f"q{i}")
        for i in range(1, _N_DIMS_COV + 1)
    ]
    q = e.select("label", *qcols)
    agg = q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"q{i}").alias(f"s{i}") for i in range(1, _N_DIMS_COV + 1)],
        *[
            wide_sum(F.col(f"q{i}") * F.col(f"q{j}")).cast("long").alias(f"s{i}_{j}")
            for i, j in pairs
        ],
    )
    stack_args = ", ".join(
        f"{i}, {j}, s{i}_{j}, s{i}, s{j}" for i, j in pairs
    )
    return agg.select(
        "label",
        "n",
        F.expr(f"stack({len(pairs)}, {stack_args})").alias("i", "j", "s_ij", "s_i", "s_j"),
    ).select("label", "n", "i", "j", "s_ij", "s_i", "s_j")


_Q3 = "CAST(floor(CAST({x} AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"


@register(
    "q283_pca_power_iteration",
    oracle=f"""
WITH coords AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         {_Q3.format(x="unnest(embedding)")} AS q
  FROM embeddings
),
gram AS (
  SELECT a.i AS i, b.i AS j,
         CAST(SUM(a.q * b.q) AS BIGINT) AS g
  FROM coords a JOIN coords b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
u1 AS (
  SELECT i, CAST(SUM(g) AS BIGINT) AS u FROM gram GROUP BY i
),
v1 AS (
  SELECT i, u // 4194304 AS v FROM u1
),
u2 AS (
  SELECT g.i,
         SUM(CAST(g.g AS HUGEINT) * CAST(v.v AS HUGEINT)) AS u
  FROM gram g JOIN v1 v ON g.j = v.i
  GROUP BY g.i
),
norm AS (SELECT MAX(abs(u)) AS m FROM u2),
ray AS (
  SELECT CAST(SUM(u2.u * CAST(v1.v AS HUGEINT))
              // SUM(CAST(v1.v AS HUGEINT) * CAST(v1.v AS HUGEINT))
              AS BIGINT) AS eig_scaled
  FROM u2 JOIN v1 ON u2.i = v1.i
)
SELECT u2.i AS dim,
       v1.v AS v1,
       CAST(u2.u * 1000000 // norm.m AS BIGINT) AS align_ppm,
       ray.eig_scaled
FROM u2 JOIN v1 ON u2.i = v1.i CROSS JOIN norm CROSS JOIN ray
""",
    tags=("embeddings", "pca", "iterative"),
)
def q283_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix by TWO unrolled power-iteration steps in exact integer
    arithmetic — the PCA/OPQ preprocessing decision input, computed
    without a linear-algebra library and bit-identical in both
    engines: coordinates quantize at 1e-3, the 64×64 Gram accumulates
    as exact integer outer products (pairwise dim join per vector —
    fan-out bounded by d², not N²), v₀ = 1, u₁ = G·v₀ rescaled by a
    fixed 2²² shift (both engines truncate division toward zero,
    verified), u₂ = G·v₁ accumulated in 38-digit wide integers
    (decimal(38,0) vs HUGEINT), then per-dim alignment ppm against
    max|u₂| and the scaled Rayleigh quotient ⟨u₂,v₁⟩/⟨v₁,v₁⟩.

    Scale shape: one shuffle builds the Gram (groupBy (i,j) with
    map-side combine to ≤ d² rows per partition); each iteration is a
    d²-row join against a d-row relation — broadcastable at any
    corpus size because the Gram never grows with N."""
    e = load_table(spark, sf_dir, "embeddings")
    coords = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.expr(_Q3.format(x="x")).alias("q"),
    )
    a, b = coords.alias("a"), coords.alias("b")
    gram = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("g"))
    )
    u1 = gram.groupBy("i").agg(F.sum("g").alias("u"))
    v1 = u1.select("i", F.expr("u div 4194304").alias("v"))
    u2 = (
        gram.join(v1.select(F.col("i").alias("j"), "v"), "j")
        .groupBy("i")
        .agg(
            F.sum(
                F.expr("CAST(g AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))")
            ).alias("u")
        )
    )
    norm = u2.agg(F.max(F.abs(F.col("u"))).alias("m"))
    ray = (
        u2.join(v1, "i")
        .agg(
            F.expr(
                "CAST(SUM(u * CAST(v AS DECIMAL(38,0)))"
                " div SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("eig_scaled")
        )
    )
    return (
        u2.join(v1, "i")
        .crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(ray))
        .select(
            F.col("i").alias("dim"),
            F.col("v").alias("v1"),
            F.expr("CAST(u * 1000000 div m AS BIGINT)").alias("align_ppm"),
            "eig_scaled",
        )
    )


@register(
    "q305_centroid_drift",
    oracle=f"""
WITH coords AS (
  SELECT label, vec_id % 2 AS half,
         generate_subscripts(embedding, 1) AS dim,
         {_Q.format(x="unnest(embedding)")} AS q
  FROM embeddings
),
sums AS (
  SELECT label, half, dim,
         COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s
  FROM coords GROUP BY label, half, dim
),
wide AS (
  SELECT label, dim,
         MAX(CASE WHEN half = 0 THEN n END) AS n_a,
         MAX(CASE WHEN half = 0 THEN s END) AS s_a,
         MAX(CASE WHEN half = 1 THEN n END) AS n_b,
         MAX(CASE WHEN half = 1 THEN s END) AS s_b
  FROM sums GROUP BY label, dim
)
SELECT label,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(SUM(abs(s_a * n_b - s_b * n_a)) AS BIGINT)
         // (MAX(n_a) * MAX(n_b)) AS l1_drift_q,
       CAST(MAX(abs(s_a * n_b - s_b * n_a) // (n_a * n_b)) AS BIGINT)
         AS max_dim_drift_q
FROM wide GROUP BY label
""",
    tags=("embeddings", "drift", "monitoring"),
)
def q305_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding centroid drift between two deterministic halves of
    the index (vec_id parity — the stand-in for "last month's
    embeddings vs this month's"): per label, the L1 distance between
    half-centroids and the worst single dimension, in exact quantized
    units via cross-multiplied rationals (s_a·n_b − s_b·n_a over
    n_a·n_b — no floating-point means anywhere). This is the
    re-embedding / model-rot monitor an embedding index runs on every
    refresh: drift above threshold means the ANN index and stored
    vectors disagree and a rebuild is due. One posexplode pass,
    map-side-combined (label, half, dim) moment census, 64-row-per-
    label arithmetic after that."""
    e = load_table(spark, sf_dir, "embeddings")
    coords = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "label",
        "half",
        (F.col("pos") + 1).alias("dim"),
        F.expr(_Q.format(x="x")).alias("q"),
    )
    sums = coords.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("s")
    )
    wide = sums.groupBy("label", "dim").agg(
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("half") == 0, F.col("s"))).alias("s_a"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("half") == 1, F.col("s"))).alias("s_b"),
    )
    return wide.groupBy("label").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.expr(
            "CAST(SUM(abs(s_a * n_b - s_b * n_a)) AS BIGINT)"
            " div (MAX(n_a) * MAX(n_b))"
        ).alias("l1_drift_q"),
        F.expr(
            "CAST(MAX(abs(s_a * n_b - s_b * n_a) div (n_a * n_b)) AS BIGINT)"
        ).alias("max_dim_drift_q"),
    )
