"""Deterministic resampling operators — weighted systematic sampling
and the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
for Massive Data Streams", Google 2012).

Both replace driver-side / rand()-based resampling with md5-derived
determinism (the same policy as sampling.py): the sample is
reproducible on any cluster layout and auditable row by row.

Scale notes:

* q238 (systematic ∝-size sampling) needs a GLOBAL cumulative weight —
  the textbook formulation is a single ordered window over the corpus,
  i.e. a one-partition sort. The implementation uses the q194
  two-phase shape instead: per-bucket (md5 first hex digit) weight
  sums roll up to 16 offset rows, the offsets broadcast back, and the
  running sum runs ordered *within* each bucket — the only
  SinglePartition work is over 16 rows. Because the bucket is a
  PREFIX of the global sort key, bucket-order + in-bucket-order ==
  global order exactly.
* q239 (Poisson bootstrap) is the resampling scheme that actually
  works distributed: instead of drawing n rows with replacement
  (global coordination), each row independently receives a
  Poisson(1) replica count — here derived from 16 md5 bits against
  baked inverse-CDF thresholds (⌊CDF·65536⌉), so both engines compute
  identical counts. 32 replicas explode map-side and collapse to 32
  groups by partial aggregation before the shuffle: the exchange
  carries 32 rows per task regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_K_SLOTS = 50  # q238: sample size (one doc per slot boundary crossed)

# Poisson(1) inverse-CDF thresholds scaled to 2^16: round(CDF(k)*65536)
# for k = 0..4; a u16 below threshold[k] maps to count k, the tail
# (P ≈ 0.37%) to 5. e^-1-derived constants baked as integers so no
# runtime transcendentals cross the hash boundary.
_POIS_T = (24109, 48219, 60273, 64292, 65296)

# Portable 16-bit uniform from the first 4 hex chars of md5(key):
# 1-based instr arithmetic, identical in Spark SQL and DuckDB.
_U16 = (
    "(instr('0123456789abcdef', substr(md5({key}), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5({key}), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5({key}), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5({key}), 4, 1)) - 1)"
)


def _pois_case(u16_expr: str) -> str:
    branches = " ".join(
        f"WHEN ({u16_expr}) < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 5 END"


@register(
    "q238_weighted_systematic_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS key
  FROM documents
),
cum AS (
  SELECT doc_id, w,
         COALESCE(SUM(w) OVER (ORDER BY key ASC, doc_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cb,
         SUM(w) OVER () AS total
  FROM keyed
)
SELECT doc_id, w AS n_chars,
       CAST((cb * {_K_SLOTS}) // total AS BIGINT) AS first_slot,
       CAST(((cb + w) * {_K_SLOTS}) // total - (cb * {_K_SLOTS}) // total AS BIGINT)
         AS spans
FROM cum
WHERE (cb * {_K_SLOTS}) // total < ((cb + w) * {_K_SLOTS}) // total
""",
    tags=("sampling", "deterministic", "weighted"),
)
def q238_weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (probability-proportional-to-size) sample
    of ~50 documents by character mass: docs are laid on a line in
    md5-key order, the line is cut into 50 equal-weight slots, and a
    doc is selected iff it spans a slot boundary (long docs can span
    several — `spans` counts them, preserving ∝-size semantics
    exactly). All arithmetic is int64; selection is reproducible and
    stable under reruns.

    The global cumulative weight uses the two-phase q194 shape: the
    md5 first hex digit buckets the corpus 16 ways, per-bucket sums
    roll up to a 16-row offset relation (the only SinglePartition
    window), offsets broadcast back, and the running sum is windowed
    within buckets — no global one-partition sort of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.md5(F.col("doc_id").cast("string")).alias("key"),
    ).withColumn("bucket", F.substring("key", 1, 1))

    per_bucket = keyed.groupBy("bucket").agg(F.sum("w").alias("bw"))
    w_off = (
        Window.orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("boff"),
        F.sum("bw").over(Window.partitionBy()).alias("total"),
    )

    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("key").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn("cb", F.col("boff") + F.coalesce(F.sum("w").over(w_in), F.lit(0)))
    )
    lo = F.expr(f"(cb * {_K_SLOTS}) div total")
    hi = F.expr(f"((cb + w) * {_K_SLOTS}) div total")
    return (
        cum.filter(lo < hi)
        .select(
            "doc_id",
            F.col("w").alias("n_chars"),
            lo.alias("first_slot"),
            (hi - lo).alias("spans"),
        )
    )


@register(
    "q239_poisson_bootstrap",
    oracle=f"""
WITH reps AS (SELECT unnest(generate_series(0, 31)) AS rep),
weighted AS (
  SELECT r.rep,
         {_pois_case(_U16.format(key="CAST(o_orderkey AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR)"))}
           AS cnt,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders CROSS JOIN reps r
)
SELECT rep,
       CAST(SUM(cnt) AS BIGINT) AS n_eff,
       CAST(SUM(cnt * cents) AS BIGINT) AS sum_cents,
       CAST(CAST(SUM(cnt * cents) AS BIGINT) // CAST(SUM(cnt) AS BIGINT) AS BIGINT)
         AS mean_cents
FROM weighted
GROUP BY rep
""",
    tags=("sampling", "bootstrap", "deterministic"),
)
def q239_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value: 32 deterministic
    replicas, each row's replica count drawn Poisson(1) from 16 md5
    bits against baked inverse-CDF thresholds. The spread of the 32
    per-replica means IS the uncertainty estimate — no global
    with-replacement draw, no driver-side resampling.

    Replicas explode row-side (32×) but partial aggregation collapses
    them to ≤ 32 groups per task before the exchange, so the shuffle
    carries 32 rows per partition at any corpus size. All outputs are
    exact integers (cents; floor division of positive sums)."""
    o = load_table(spark, sf_dir, "orders")
    exploded = o.select(
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).alias("cents"),
        F.col("o_orderkey"),
    )
    u16 = _U16.format(
        key="CAST(o_orderkey AS STRING) || ':' || CAST(rep AS STRING)"
    )
    weighted = exploded.select(
        "rep",
        F.expr(_pois_case(u16)).cast("long").alias("cnt"),
        "cents",
    )
    return (
        weighted.groupBy("rep")
        .agg(
            F.sum("cnt").alias("n_eff"),
            F.sum(F.col("cnt") * F.col("cents")).alias("sum_cents"),
        )
        .select(
            "rep",
            "n_eff",
            "sum_cents",
            F.expr("sum_cents div n_eff").alias("mean_cents"),
        )
    )
