"""Sketch-and-layout operators expressed relationally: a Count-Min
sketch with an exact over-estimate audit, a 2-D skyline (Pareto
frontier), and a dense-key gap census.

The Count-Min sketch here is the real algorithm (Cormode & Muthu-
krishnan 2005) — d=4 hash rows × w=256 counters, estimate = min over
rows — built as a GROUP BY instead of imperative counters, which is
exactly how a distributed engine materializes one: the (row, bucket)
counter table is an aggregation of the term stream, partial-combined
map-side, and the whole 1024-row sketch broadcasts to probes. Because
the hash functions are md5-derived (portable, deterministic), the
DuckDB oracle rebuilds the identical sketch and the comparison is
EXACT — including the over-estimation error, which for CMS is
one-sided (est ≥ true, never under).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_D = 4  # hash rows
# md5-derived bucket in [0, 256): first two lowercase-hex chars of
# md5('<i>#' || term). Same 1-based instr arithmetic as sampling.py —
# portable across Spark SQL and DuckDB.
_HEX = "0123456789abcdef"


def _bucket_sql(i: int, term: str, engine: str) -> str:
    key = (
        f"cast(concat('{i}#', {term}) as binary)"
        if engine == "spark"
        else f"'{i}#' || {term}"
    )
    return (
        f"(instr('{_HEX}', substr(md5({key}), 1, 1)) - 1) * 16"
        f" + instr('{_HEX}', substr(md5({key}), 2, 1)) - 1"
    )


_SQL_CMS_PRELUDE = f"""
terms AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS n FROM terms WHERE term <> '' GROUP BY term
),
pairs AS (
  {' UNION ALL '.join(
      f"SELECT term, n, {i} AS i, {_bucket_sql(i, 'term', 'duck')} AS bucket"
      " FROM counts"
      for i in range(_D)
  )}
),
sketch AS (
  SELECT i, bucket, CAST(SUM(n) AS BIGINT) AS bucket_n
  FROM pairs GROUP BY i, bucket
),
top20 AS (
  SELECT term, n FROM counts ORDER BY n DESC, term ASC LIMIT 20
)"""


@register(
    "q175_count_min_sketch",
    oracle=f"""
WITH {_SQL_CMS_PRELUDE}
SELECT t.term,
       CAST(t.n AS BIGINT) AS n_exact,
       CAST(MIN(s.bucket_n) AS BIGINT) AS cms_est,
       CAST(MIN(s.bucket_n) - t.n AS BIGINT) AS overestimate
FROM top20 t
JOIN pairs p ON p.term = t.term
JOIN sketch s ON s.i = p.i AND s.bucket = p.bucket
GROUP BY t.term, t.n
""",
    tags=("sketch", "cms", "text"),
)
def q175_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the document term stream (d=4 × w=256,
    md5 hashes), probed for the exact top-20 terms and audited against
    true counts: ``overestimate = min_i(counter[i][h_i(t)]) − n(t)``
    is ≥ 0 by construction (CMS errs one-sided).

    Relational construction: counter increments are a term-count
    aggregation re-keyed by (row, bucket) — map-side combinable, one
    shuffle of ≤ d·w rows — and the finished 1024-row sketch
    BROADCASTS to the probe join, so estimating any number of probe
    keys never reshuffles the corpus. This is the streaming-sketch
    pattern a 100 TB pipeline uses for frequency estimates without a
    full term dictionary."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split(F.lower("text"), " ")).alias("term")).filter(
        F.col("term") != ""
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    pairs = counts.select(
        "term",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(_bucket_sql(i, "term", "spark")).alias("bucket"),
                    )
                    for i in range(_D)
                ]
            )
        ).alias("rb"),
    ).select("term", "n", "rb.i", "rb.bucket")
    sketch = pairs.groupBy("i", "bucket").agg(
        F.sum("n").cast("long").alias("bucket_n")
    )
    top20 = counts.orderBy(F.col("n").desc(), F.col("term").asc()).limit(20)
    return (
        top20.join(pairs, "term")
        .join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("term", top20["n"])
        .agg(F.min("bucket_n").alias("est"))
        .select(
            "term",
            F.col("n").cast("long").alias("n_exact"),
            F.col("est").cast("long").alias("cms_est"),
            (F.col("est") - F.col("n")).cast("long").alias("overestimate"),
        )
    )


@register(
    "q177_skyline_frontier",
    oracle="""
WITH per_size AS (
  SELECT p_size,
         CAST(MIN(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS best_cents,
         COUNT(*) AS n_parts
  FROM part GROUP BY p_size
),
swept AS (
  SELECT p_size, best_cents, n_parts,
         min(best_cents) OVER (ORDER BY p_size ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_best
  FROM per_size
)
SELECT p_size, best_cents, CAST(n_parts AS BIGINT) AS n_parts
FROM swept WHERE prev_best IS NULL OR best_cents < prev_best
""",
    tags=("layout", "skyline", "window"),
)
def q177_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts minimizing (p_size,
    price): a size survives iff its cheapest part is STRICTLY cheaper
    than every smaller-or-equal size's cheapest part. The naive
    skyline is an O(n²) dominance anti-join; in two dimensions it
    collapses to per-key min + a running-min sweep — one aggregation
    (50 rows out) and one ordered window, no join at all. This is the
    plan that still works when `part` is 10^10 rows: dominance never
    touches row pairs."""
    p = load_table(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(
        F.min(F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("best_cents"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    w = (
        Window.orderBy(F.col("p_size").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = per_size.select(
        "p_size",
        "best_cents",
        "n_parts",
        F.min("best_cents").over(w).alias("prev_best"),
    )
    return swept.filter(
        F.col("prev_best").isNull() | (F.col("best_cents") < F.col("prev_best"))
    ).select("p_size", "best_cents", "n_parts")


@register(
    "q178_key_gap_census",
    oracle="""
WITH k AS (
  SELECT o_orderkey AS key FROM orders WHERE o_orderstatus = 'F'
),
d AS (
  SELECT key, lag(key) OVER (ORDER BY key ASC) AS prev FROM k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MIN(key) AS BIGINT) AS lo,
       CAST(MAX(key) AS BIGINT) AS hi,
       CAST(SUM(CASE WHEN key - prev > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN key - prev > 1 THEN key - prev - 1 ELSE 0 END)
            AS BIGINT) AS missing_total,
       CAST(MAX(key - prev - 1) AS BIGINT) AS max_gap
FROM d
""",
    tags=("audit", "islands", "window"),
)
def q178_key_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-key gap census (the sequence-integrity audit): over the
    ordered F-status orderkeys, count the gaps, total missing keys,
    and the largest hole via a single lag() pass — gaps-and-islands
    without materializing islands. Spark executes the global order as
    a range-partitioned sort; the census aggregate is a full
    reduction, so nothing but (key, prev) pairs flow. At 100 TB the
    same audit shards by key-range prefix and stitches the shard
    boundaries (one extra row per shard)."""
    o = load_table(spark, sf_dir, "orders")
    k = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("key")
    )
    d = k.select(
        "key", F.lag("key").over(Window.orderBy(F.col("key").asc())).alias("prev")
    )
    gap = F.col("key") - F.col("prev")
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("key").cast("long").alias("lo"),
        F.max("key").cast("long").alias("hi"),
        F.sum(F.when(gap > 1, 1).otherwise(0)).cast("long").alias("n_gaps"),
        F.sum(F.when(gap > 1, gap - 1).otherwise(0))
        .cast("long")
        .alias("missing_total"),
        F.max(gap - 1).cast("long").alias("max_gap"),
    )


@register(
    "q191_bitmap_retention",
    oracle="""
WITH oc AS (
  SELECT DISTINCT (year(o_orderdate) * 12 + month(o_orderdate)) AS midx,
         o_custkey AS k
  FROM orders
),
bm AS (
  SELECT midx, k // 32 AS w,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(k % 32 AS INTEGER)) AS BIGINT)
           AS bits
  FROM oc GROUP BY midx, k // 32
),
counts AS (
  SELECT midx, CAST(SUM(bit_count(bits)) AS BIGINT) AS n FROM bm GROUP BY midx
),
inter AS (
  SELECT a.midx, CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
  FROM bm a JOIN bm b ON b.midx = a.midx + 1 AND b.w = a.w
  GROUP BY a.midx
)
SELECT CAST(c1.midx AS BIGINT) AS month_idx,
       c1.n AS n_cur, c2.n AS n_next,
       COALESCE(i.n_both, 0) AS n_retained,
       c1.n + c2.n - COALESCE(i.n_both, 0) AS n_either
FROM counts c1
JOIN counts c2 ON c2.midx = c1.midx + 1
LEFT JOIN inter i ON i.midx = c1.midx
""",
    tags=("sketch", "bitmap", "retention"),
)
def q191_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra: each order-month's customer set as a
    packed bitmap (word = custkey div 32, bit_or of 1<<bit), then
    month-over-month retained/either counts via popcount(AND)/
    inclusion-exclusion — the roaring-bitmap pattern relational
    engines use for audience overlap, here with exact BIGINT words
    both engines compute identically.

    Scale shape: the bitmap is ~N/32 words per month REGARDLESS of
    order volume (the distinct reduction happens first), pairwise
    overlap joins align on (month+1, word) — an equi-join on tiny
    relations — and popcounts are JVM-side bit_count. Compare with the
    join-based retention (q129): same answer, but the bitmap form ships
    64× less data per member and unions/intersects any month combo
    without re-scanning."""
    o = load_table(spark, sf_dir, "orders")
    oc = o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        F.col("o_custkey").alias("k"),
    ).distinct()
    bm = oc.groupBy(
        "midx", F.expr("k div 32").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k % 32 AS INT))")
        ).alias("bits")
    )
    counts = bm.groupBy("midx").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n")
    )
    a, b = bm.alias("a"), bm.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.midx") == F.col("a.midx") + 1)
            & (F.col("b.w") == F.col("a.w")),
        )
        .groupBy(F.col("a.midx").alias("midx"))
        .agg(
            F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits"))))
            .cast("long")
            .alias("n_both")
        )
    )
    c1, c2 = counts.alias("c1"), counts.alias("c2")
    return (
        c1.join(c2, F.col("c2.midx") == F.col("c1.midx") + 1)
        .join(inter.alias("i"), F.col("i.midx") == F.col("c1.midx"), "left")
        .select(
            F.col("c1.midx").cast("long").alias("month_idx"),
            F.col("c1.n").alias("n_cur"),
            F.col("c2.n").alias("n_next"),
            F.coalesce(F.col("i.n_both"), F.lit(0).cast("long")).alias(
                "n_retained"
            ),
            (
                F.col("c1.n") + F.col("c2.n")
                - F.coalesce(F.col("i.n_both"), F.lit(0).cast("long"))
            ).alias("n_either"),
        )
    )


def _sql_key_sketch(rel: str, key: str) -> str:
    """Per-key-count CMS rows for one join side (d=4 × w=256)."""
    return f"""(
  WITH kc AS (SELECT {key} AS k, COUNT(*) AS n FROM {rel} GROUP BY 1)
  {' UNION ALL '.join(
      f"SELECT {i} AS i, {_bucket_sql(i, 'CAST(k AS VARCHAR)', 'duck')} AS bucket,"
      f" CAST(SUM(n) AS BIGINT) AS bucket_n FROM kc GROUP BY 1, 2"
      for i in range(_D)
  )}
)"""


@register(
    "q256_join_size_estimate",
    oracle=f"""
WITH se AS (SELECT * FROM {_sql_key_sketch("events", "user_id")} s),
sc AS (SELECT * FROM {_sql_key_sketch("customer", "c_custkey")} s),
per_row AS (
  SELECT se.i, CAST(SUM(se.bucket_n * sc.bucket_n) AS BIGINT) AS est
  FROM se JOIN sc ON se.i = sc.i AND se.bucket = sc.bucket
  GROUP BY se.i
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_size
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
)
SELECT x.exact_size,
       CAST(MIN(p.est) AS BIGINT) AS cms_est,
       CAST((MIN(p.est) - x.exact_size) * 1000000 // x.exact_size AS BIGINT)
         AS overest_ppm
FROM per_row p CROSS JOIN exact x
GROUP BY x.exact_size
""",
    tags=("sketch", "cms", "optimizer"),
)
def q256_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from Count-Min inner products
    (Cormode & Muthukrishnan 2005 §4.2: |A ⋈ B| ≈ min_i Σ_b
    cms_A[i][b]·cms_B[i][b], one-sided over-estimate) — the sketch
    statistic a cost-based optimizer consults before choosing a join
    strategy, audited against the true join size. Each side reduces
    to per-key counts (map-side combinable), sketches are ≤ d·w = 1024
    rows each, the inner product is a join of two TINY relations, and
    the exact size (the audit) is the only full join. At 100 TB the
    sketches are a metadata artifact: estimating a join costs no
    shuffle of either fact table."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")

    def key_sketch(df: DataFrame, key: str) -> DataFrame:
        kc = df.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        pairs = kc.select(
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            F.expr(_bucket_sql(i, "k", "spark")).alias("bucket"),
                        )
                        for i in range(_D)
                    ]
                )
            ).alias("rb"),
        ).select("rb.i", "rb.bucket", "n")
        return pairs.groupBy("i", "bucket").agg(F.sum("n").cast("long").alias("bucket_n"))

    se = key_sketch(e, "user_id")
    sc = key_sketch(c, "c_custkey")
    per_row = (
        se.alias("a")
        .join(F.broadcast(sc.alias("b")), ["i", "bucket"])
        .groupBy("i")
        .agg(F.sum(F.col("a.bucket_n") * F.col("b.bucket_n")).cast("long").alias("est"))
    )
    exact = e.join(
        F.broadcast(c.select(F.col("c_custkey").alias("user_id"))), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("exact_size"))
    return (
        per_row.crossJoin(F.broadcast(exact))
        .groupBy("exact_size")
        .agg(F.min("est").cast("long").alias("cms_est"))
        .select(
            "exact_size",
            "cms_est",
            F.expr("(cms_est - exact_size) * 1000000 div exact_size").alias("overest_ppm"),
        )
    )


@register(
    "q340_mergeable_quantiles",
    # Level 1: exact per-shard deciles over integer cents; level 2:
    # the shard boundaries (weighted by shard size) merge via the
    # cumulative-weight rule; the audit reports merged vs exact
    # global deciles with the signed error — all integer arithmetic.
    oracle="""
WITH cents AS (
  SELECT l_orderkey % 4 AS shard,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
shard_n AS (SELECT shard, COUNT(*) AS n FROM cents GROUP BY shard),
deciles AS (SELECT unnest(generate_series(1, 9)) AS decile),
vc AS (
  SELECT shard, c, COUNT(*) AS k FROM cents GROUP BY shard, c
),
r1 AS (
  SELECT shard, c,
         SUM(k) OVER (PARTITION BY shard ORDER BY c
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM vc
),
b1 AS (
  SELECT r.shard, d.decile, CAST(MIN(r.c) AS BIGINT) AS b
  FROM r1 r JOIN shard_n s ON r.shard = s.shard
  CROSS JOIN deciles d
  WHERE r.cum * 10 >= d.decile * s.n
  GROUP BY r.shard, d.decile
),
weighted AS (
  SELECT b1.decile AS src_decile, b1.b, s.n AS w
  FROM b1 JOIN shard_n s ON b1.shard = s.shard
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM weighted),
r2 AS (
  SELECT src_decile, b, w,
         SUM(w) OVER (ORDER BY b, src_decile
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM weighted
),
merged AS (
  SELECT d.decile, CAST(MIN(r.b) AS BIGINT) AS merged_cents
  FROM deciles d JOIN r2 r
    ON r.cum * 10 >= d.decile * (SELECT tw FROM tot)
  GROUP BY d.decile
),
gvc AS (SELECT c, COUNT(*) AS k FROM cents GROUP BY c),
rall AS (
  SELECT c, SUM(k) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT COUNT(*) FROM cents) AS na
  FROM gvc
),
exact AS (
  SELECT d.decile, CAST(MIN(r.c) AS BIGINT) AS exact_cents
  FROM deciles d JOIN rall r ON r.cum * 10 >= d.decile * r.na
  GROUP BY d.decile
)
SELECT m.decile, m.merged_cents, e.exact_cents,
       m.merged_cents - e.exact_cents AS err_cents
FROM merged m JOIN exact e ON m.decile = e.decile
""",
    tags=("sketches", "quantiles", "mergeable"),
)
def q340_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable two-level quantiles — the statistical foundation of
    distributed ANALYZE / equi-depth histograms (and the exactness
    contract behind GK/KLL sketches): four deterministic shards each
    compute EXACT deciles over integer cents (level 1 — bounded
    per-shard state), the 36 shard boundaries merge by the
    size-weighted cumulative rule (level 2 — constant-size input),
    and the audit reports the merged estimate against the exact
    global decile with its signed error — the error a planner accepts
    in exchange for never re-scanning shards. Everything is integer
    arithmetic over cents, so both engines agree bit-exactly on both
    levels AND on the error.

    Scale shape: level 1 is shard-parallel and each shard's sort is
    local to it; level 2 touches 36 rows whatever the table size —
    the whole point of mergeability at 100 TB (per-partition
    summaries, constant-cost reconciliation)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        (F.col("l_orderkey") % 4).alias("shard"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    shard_n = cents.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    # percentile_disc semantics must match DuckDB's quantile_disc:
    # the smallest value with cumulative row share >= p — expressed
    # directly as the window rule on both levels
    from pyspark.sql.window import Window as _W

    # census-collapse before any window (the q201 discipline): the
    # cumulative rule runs over DISTINCT cent values with counts —
    # never a row-level rank over the fact table
    vc = cents.groupBy("shard", "c").agg(F.count(F.lit(1)).alias("k"))
    ranked1 = vc.withColumn(
        "cum",
        F.sum("k").over(
            _W.partitionBy("shard").orderBy("c").rowsBetween(
                _W.unboundedPreceding, _W.currentRow
            )
        ),
    ).join(shard_n, "shard")
    b1 = (
        ranked1.crossJoin(F.broadcast(deciles))
        .filter(F.col("cum") * 10 >= F.col("decile") * F.col("n"))
        .groupBy("shard", "decile")
        .agg(F.min("c").cast("long").alias("b"))
    )
    weighted = b1.join(shard_n, "shard").select(
        F.col("decile").alias("src_decile"), "b", F.col("n").alias("w")
    )
    tot = weighted.agg(F.sum("w").cast("long").alias("tw"))
    ranked2 = weighted.withColumn(
        "cum",
        F.sum("w").over(
            _W.orderBy("b", "src_decile").rowsBetween(
                _W.unboundedPreceding, _W.currentRow
            )
        ),
    )
    merged = (
        ranked2.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(deciles))
        .filter(F.col("cum") * 10 >= F.col("decile") * F.col("tw"))
        .groupBy("decile")
        .agg(F.min("b").cast("long").alias("merged_cents"))
    )
    n_all = cents.agg(F.count(F.lit(1)).alias("na"))
    gvc = cents.groupBy("c").agg(F.count(F.lit(1)).alias("k"))
    exact = (
        gvc.withColumn(
            "cum",
            F.sum("k").over(
                _W.orderBy("c").rowsBetween(
                    _W.unboundedPreceding, _W.currentRow
                )
            ),
        )
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(deciles))
        .filter(F.col("cum") * 10 >= F.col("decile") * F.col("na"))
        .groupBy("decile")
        .agg(F.min("c").cast("long").alias("exact_cents"))
    )
    return (
        merged.join(exact, "decile")
        .select(
            "decile",
            "merged_cents",
            "exact_cents",
            (F.col("merged_cents") - F.col("exact_cents")).alias("err_cents"),
        )
    )
