"""Aggregation operators: distinct counts, rollup/cube/grouping sets,
pivot, ordered string_agg, min_by/max_by, moment statistics, exact
percentiles, approximate sketches.

Cross-engine notes:
* integer SUMs are cast to BIGINT in oracles (DuckDB widens to HUGEINT);
* stddev/var/corr are computed from exact decimal moment sums with the
  *same* closed-form arithmetic on both sides (Spark's built-ins use
  order-dependent streaming updates — not reproducible);
* approx sketches (HLL, approx percentile) are registered without an
  oracle: their values are algorithm-specific by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.functions.determinism import davg, dsum, sql_davg, sql_dsum
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q20_count_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS cust_cnt,
       COUNT(DISTINCT c_nationkey) AS nation_cnt,
       CAST(SUM(CAST(c_nationkey AS BIGINT)) AS BIGINT) AS nation_key_sum
FROM customer
GROUP BY c_mktsegment
""",
    tags=("agg", "distinct"),
)
def q20_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Spark plans this as a two-phase
    expand+agg; exact, unlike approx_count_distinct."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cust_cnt"),
        F.countDistinct("c_nationkey").alias("nation_cnt"),
        F.sum(F.col("c_nationkey").cast("long")).alias("nation_key_sum"),
    )


@register(
    "q21_rollup",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS cust_cnt,
       CAST(SUM(CAST(floor((c_acctbal) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS bal_sum
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup"),
)
def q21_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation): per-nation, per-region subtotal, and
    grand total rows (NULL group keys mark subtotal levels)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("cust_cnt"),
        dsum(F.col("c_acctbal")).alias("bal_sum"),
    )


@register(
    "q22_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_cnt,
       CAST(SUM(CAST(floor((o_totalprice) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS price_sum
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dsum(F.col("o_totalprice")).alias("price_sum"),
    )


@register(
    "q23_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(floor((l_quantity) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS qty_sum
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
    tags=("agg", "grouping_sets"),
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan as
    rollup/cube but user-chosen sets)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(floor((l_quantity) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS qty_sum
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q24_pivot",
    oracle="""
SELECT n_name,
       COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS "BUILDING",
       COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS "FURNITURE",
       COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS "HOUSEHOLD",
       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS "MACHINERY"
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("agg", "pivot"),
)
def q24_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot customers per nation × market segment (explicit value
    list so the plan is a single pass — Spark needs two passes when
    pivot values are discovered at runtime). Missing combinations are
    0-filled to match the oracle's FILTER semantics."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .count()
        .na.fill(0, segs)
    )


@register(
    "q25_moment_stats",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(floor((l_quantity) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sx,
         CAST(SUM(CAST(floor((l_quantity * l_quantity) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxx,
         CAST(SUM(CAST(floor((l_extendedprice) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sy,
         CAST(SUM(CAST(floor((l_extendedprice * l_extendedprice) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS syy,
         CAST(SUM(CAST(floor((l_quantity * l_extendedprice) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxx - sx * sx / n) / (n - 1) AS var_qty,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
       (sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
FROM m
""",
    tags=("agg", "stats"),
)
def q25_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation from exact
    moment sums. Identical closed-form IEEE arithmetic on both engines
    → bit-identical, unlike the built-in streaming implementations."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q).alias("sx"),
        dsum(q * q).alias("sxx"),
        dsum(p).alias("sy"),
        dsum(p * p).alias("syy"),
        dsum(q * p).alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr("(sxx - sx * sx / n) / (n - 1)").alias("var_qty"),
        F.expr("sqrt((sxx - sx * sx / n) / (n - 1))").alias("stddev_qty"),
        F.expr(
            "(sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))"
        ).alias("corr_qty_price"),
    )


@register(
    "q26_percentile_exact",
    oracle="""
SELECT o_orderstatus,
       round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50,
       round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90,
       CAST(min(o_totalprice) AS DOUBLE) AS lo,
       CAST(max(o_totalprice) AS DOUBLE) AS hi
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "percentile"),
)
def q26_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`); rounded to 4 decimals to absorb last-ulp
    interpolation differences."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q27_approx_sketches",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l_partkey) AS ndv_exact,
       TRUE AS ndv_ok,
       TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def q27_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches: HyperLogLog++ distinct count and
    approximate (Greenwald-Khanna) percentile. Raw sketch VALUES are
    algorithm-specific and can't hash-match another engine, so the
    graded output is the exact NDV plus tolerance verdicts: HLL at
    rsd=0.02 must land within 10% of the exact NDV (5 sigma), and the
    approx median (accuracy 10000 → rank error <= N/10000) must fall
    inside the exact [p45, p55] value band. The oracle asserts the
    same exact values with both verdicts TRUE. At 100 TB the point of
    the sketches is one-pass mergeable state instead of an exact
    distinct shuffle — the band check proves the sketch is actually
    close, not just present."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_partkey").alias("ndv_exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
            F.percentile("l_extendedprice", 0.45).alias("p45"),
            F.percentile("l_extendedprice", 0.55).alias("p55"),
        )
        .select(
            "l_returnflag",
            "n",
            "ndv_exact",
            (
                F.abs(F.col("approx_parts") - F.col("ndv_exact"))
                <= 0.10 * F.col("ndv_exact")
            ).alias("ndv_ok"),
            F.col("approx_median").between(F.col("p45"), F.col("p55")).alias("median_ok"),
        )
    )


@register(
    "q28_string_agg_sorted",
    oracle="""
SELECT c_mktsegment,
       string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), ',' ORDER BY CAST(c_nationkey AS VARCHAR)) AS nations_csv
FROM customer
GROUP BY c_mktsegment
""",
    tags=("agg", "collect"),
)
def q28_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined string (order-stable form of
    list aggregation; raw collect_list order is nondeterministic)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("c_nationkey").cast("string"))), ","
        ).alias("nations_csv")
    )


@register(
    "q29_min_by_max_by",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_max,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_min,
         COUNT(*) OVER (PARTITION BY o_custkey) AS order_cnt
  FROM orders
)
SELECT o_custkey,
       max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS latest_orderkey,
       max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS first_orderkey,
       max(order_cnt) AS order_cnt
FROM ranked
GROUP BY o_custkey
""",
    tags=("agg", "argminmax"),
)
def q29_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a composite (date, key) ordering struct —
    the deterministic replacement for first()/last(), whose results
    depend on partition arrival order."""
    o = load_table(spark, sf_dir, "orders")
    ordkey = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("latest_orderkey"),
        F.min_by("o_orderkey", ordkey).alias("first_orderkey"),
        F.count(F.lit(1)).alias("order_cnt"),
    )


@register(
    "q189_hll_sketch_union",
    oracle="""
WITH daily AS (
  SELECT CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '2024-01-01') // 7
              AS INTEGER) AS week_no,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         user_id
  FROM events
)
SELECT week_no,
       COUNT(DISTINCT day) AS n_days,
       COUNT(DISTINCT user_id) AS ndv_exact,
       TRUE AS hll_ok
FROM daily GROUP BY week_no
""",
    tags=("agg", "approx", "sketch"),
)
def q189_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Spark 4 Datasketches `hll_sketch_agg` /
    `hll_union_agg`): per-DAY user sketches built once, then UNIONED
    into weekly NDVs — the pre-aggregated-sketch pattern that lets a
    100 TB pipeline answer any rollup of distinct counts without
    re-touching raw data (sketches are tiny, unions are associative).

    Raw sketch estimates are engine-specific, so the graded columns
    are the exact NDV plus a verdict: the merged-sketch estimate must
    land within 5% of exact (HLL lgK=12 ⇒ σ≈1.6%, 5% ≈ 3σ); the hashed
    hll_ok verdict IS that assertion — the oracle pins it TRUE, so an
    estimate drifting past 3σ fails the hash gate."""
    e = load_table(spark, sf_dir, "events")
    week_no = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))) / 7
    ).cast("int")
    daily = (
        e.select(week_no.alias("week_no"), F.to_date("ts").alias("day"), "user_id")
        .groupBy("week_no", "day")
        .agg(
            F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
            F.countDistinct("user_id").alias("day_ndv"),
        )
    )
    weekly = daily.groupBy("week_no").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("est"),
    )
    exact = (
        e.select(week_no.alias("week_no"), "user_id")
        .groupBy("week_no")
        .agg(F.countDistinct("user_id").alias("ndv_exact"))
    )
    return (
        weekly.join(exact, "week_no")
        .select(
            "week_no",
            "n_days",
            "ndv_exact",
            (
                F.abs(F.col("est") - F.col("ndv_exact"))
                <= F.col("ndv_exact") * 0.05
            ).alias("hll_ok"),
        )
    )


@register(
    "q190_trailing_distinct",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
contrib AS (
  SELECT user_id, day + i.i AS report_day
  FROM ud CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS i) i
),
spine AS (SELECT DISTINCT day AS report_day FROM ud)
SELECT CAST(s.report_day AS STRING) AS day,
       COUNT(DISTINCT c.user_id) AS active_7d
FROM spine s JOIN contrib c ON c.report_day = s.report_day
GROUP BY s.report_day
""",
    tags=("agg", "window", "distinct"),
)
def q190_trailing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding
    COUNT(DISTINCT) that is NOT windowable (per-row window state would
    be a user set). Scalable rewrite: reduce to distinct (user, day),
    EXPLODE each into the ≤7 report days it supports, and run one
    plain distinct aggregation per report day — turning an O(days ×
    window) state problem into a 7× fan-out of the already-reduced
    key stream. The spine keeps only days present in the data (no
    synthetic calendar), matching the oracle join."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("i"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("i")).alias("report_day"))
    spine = ud.select(F.col("day").alias("report_day")).distinct()
    return (
        contrib.join(spine, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.col("report_day").cast("string").alias("day"), "active_7d")
    )


@register(
    "q413_bitmap_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
    tags=("aggregates", "bitmap", "exact_distinct", "mergeable"),
)
def q413_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via BITMAP AGGREGATES (Spark 3.5
    `bitmap_bit_position` / `bitmap_construct_agg` /
    `bitmap_or_agg` / `bitmap_count`) — the middle road between
    COUNT(DISTINCT) (exact, but re-shuffles raw values on every
    rollup) and HLL sketches (mergeable, but approximate): integer
    keys become fixed 4 KB bucket bitmaps that are EXACT and
    mergeable with cheap OR. Graded in the two-level shape that
    matters at 100 TB: per-SHARD bitmaps built independently
    (user_id % 8 shards — in production, one level per
    partition/day), then bitmap_or_agg merges shard bitmaps per
    bucket WITHOUT touching raw user ids again, then bitmap_count
    sums per group. A double-counted user across shards is absorbed
    by the OR (idempotent — the property that makes bitmap rollups
    re-aggregable across any dimension hierarchy); the bit-exact
    match against COUNT(DISTINCT) proves no bucket-boundary or
    position arithmetic error. n_events rides along to show the
    bitmap pass costs one scan like any census."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH shard_bitmaps AS (
  SELECT event_type,
         user_id % 8 AS shard,
         bitmap_bucket_number(user_id) AS bkt,
         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm,
         COUNT(*) AS n
  FROM events
  GROUP BY event_type, user_id % 8, bitmap_bucket_number(user_id)
),
merged AS (
  SELECT event_type, bkt, bitmap_or_agg(bm) AS bm, SUM(n) AS n
  FROM shard_bitmaps
  GROUP BY event_type, bkt
)
SELECT event_type,
       CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM merged
GROUP BY event_type
"""
    )
