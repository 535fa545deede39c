"""Distribution-curve analytics — revenue concentration (Pareto) and
exact distributed quantiles of inter-purchase gaps.

Both are built on the same scale discipline: REDUCE to a grouped
census first, run the ordered window over the census, never over the
facts. A concentration curve or a quantile needs a global (or
per-group) cumulative order — the naive formulation is a window over
every customer/order, which at 100 TB means sorting the fact table
inside ~5 region/segment partitions. Banding (q244) and value-
histogram quantiles (q245) shrink the windowed relation to
|groups| × |bands| rows while keeping the answers exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# q244: revenue band width in cents ($10k) — per-customer lifetime
# revenue lands in a few hundred bands.
_BAND_CENTS = 1_000_000


@register(
    "q244_pareto_revenue_curve",
    oracle=f"""
WITH per_cust AS (
  SELECT c.c_custkey, r.r_name AS region,
         CAST(SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY c.c_custkey, r.r_name
),
bands AS (
  SELECT region, cents // {_BAND_CENTS} AS band,
         COUNT(*) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS band_cents
  FROM per_cust GROUP BY region, band
)
SELECT region, band, n_customers, band_cents,
       CAST(SUM(band_cents) OVER (PARTITION BY region ORDER BY band DESC)
            * 1000000 // SUM(band_cents) OVER (PARTITION BY region) AS BIGINT)
         AS cum_cents_ppm,
       CAST(SUM(n_customers) OVER (PARTITION BY region ORDER BY band DESC)
            * 1000000 // SUM(n_customers) OVER (PARTITION BY region) AS BIGINT)
         AS cum_customers_ppm
FROM bands
""",
    tags=("analytics", "pareto", "concentration"),
)
def q244_pareto_revenue_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve per region: customers are
    banded by lifetime revenue ($10k bands of exact cents), and the
    curve reads top-down — cum_customers_ppm of the customers carry
    cum_cents_ppm of the revenue. The per-customer rollup is the only
    full-data aggregate (dims broadcast); the cumulative windows run
    over |regions| × |bands| census rows, not over customers — the
    scale-safe form of a per-region ranking window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_cust = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("c_custkey", F.col("r_name").alias("region"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)))
            .alias("cents")
        )
    )
    bands = (
        per_cust.select("region", F.expr(f"cents div {_BAND_CENTS}").alias("band"), "cents")
        .groupBy("region", "band")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum("cents").alias("band_cents"))
    )
    w_cum = (
        Window.partitionBy("region")
        .orderBy(F.col("band").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("region")
    return bands.select(
        "region",
        "band",
        "n_customers",
        "band_cents",
        F.sum("band_cents").over(w_cum).alias("_cc"),
        F.sum("band_cents").over(w_tot).alias("_tc"),
        F.sum("n_customers").over(w_cum).alias("_cn"),
        F.sum("n_customers").over(w_tot).alias("_tn"),
    ).select(
        "region",
        "band",
        "n_customers",
        "band_cents",
        F.expr("_cc * 1000000 div _tc").alias("cum_cents_ppm"),
        F.expr("_cn * 1000000 div _tn").alias("cum_customers_ppm"),
    )


@register(
    "q245_interpurchase_quantiles",
    oracle="""
WITH ordered AS (
  SELECT c.c_mktsegment AS segment,
         o.o_custkey,
         epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
gaps AS (
  SELECT segment,
         day - lag(day) OVER (PARTITION BY o_custkey
                              ORDER BY day ASC, o_orderkey ASC) AS gap_days
  FROM ordered
),
census AS (
  SELECT segment, gap_days, COUNT(*) AS c
  FROM gaps WHERE gap_days IS NOT NULL
  GROUP BY segment, gap_days
),
cum AS (
  SELECT segment, gap_days, c,
         SUM(c) OVER (PARTITION BY segment ORDER BY gap_days ASC) AS cum,
         SUM(c) OVER (PARTITION BY segment ORDER BY gap_days ASC) - c AS cum_before,
         SUM(c) OVER (PARTITION BY segment) AS n
  FROM census
)
SELECT segment,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days * c) AS BIGINT) AS sum_gap_days,
       CAST(SUM(gap_days * (CASE WHEN cum_before < (n + 1) // 2 AND (n + 1) // 2 <= cum
                                 THEN 1 ELSE 0 END
                          + CASE WHEN cum_before < (n + 2) // 2 AND (n + 2) // 2 <= cum
                                 THEN 1 ELSE 0 END)) AS BIGINT) AS median_x2_days,
       CAST(SUM(CASE WHEN cum_before < (9 * n + 9) // 10 AND (9 * n + 9) // 10 <= cum
                     THEN gap_days ELSE 0 END) AS BIGINT) AS p90_days
FROM cum
GROUP BY segment
""",
    tags=("analytics", "quantiles", "histogram"),
)
def q245_interpurchase_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and p90 of inter-purchase gaps (days between a
    customer's consecutive orders) per market segment — computed the
    scale-correct way: gaps reduce to a (segment, gap_days) census,
    the quantile is located by cumulative counts over that census
    (≤ a few hundred distinct gap values per segment), and the
    rank-r element is picked with integer comparisons. median_x2 is
    twice the interpolated median (lower + upper middle element —
    integer-exact, no division); p90 is the discrete lower quantile
    at rank ⌈0.9·n⌉. The per-customer lag is the only full-data
    window, partitioned by customer (millions of small partitions,
    not 5 giant ones)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ordered = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").alias("day"),
        "o_orderkey",
    )
    w_lag = Window.partitionBy("o_custkey").orderBy(
        F.col("day").asc(), F.col("o_orderkey").asc()
    )
    gaps = ordered.select(
        "segment",
        (F.col("day") - F.lag("day").over(w_lag)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    census = gaps.groupBy("segment", "gap_days").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("segment")
        .orderBy(F.col("gap_days").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("segment")
    cum = census.select(
        "segment",
        "gap_days",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        (F.sum("c").over(w_cum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(w_tot).alias("n"),
    )
    m1 = F.expr("(n + 1) div 2")
    m2 = F.expr("(n + 2) div 2")
    p90r = F.expr("(9 * n + 9) div 10")
    pick = lambda r: F.when((F.col("cum_before") < r) & (r <= F.col("cum")), 1).otherwise(0)
    return cum.groupBy("segment").agg(
        F.max("n").alias("n_gaps"),
        F.sum(F.col("gap_days") * F.col("c")).alias("sum_gap_days"),
        F.sum(F.col("gap_days") * (pick(m1) + pick(m2))).alias("median_x2_days"),
        F.sum(
            F.when((F.col("cum_before") < p90r) & (p90r <= F.col("cum")), F.col("gap_days"))
            .otherwise(F.lit(0))
        ).alias("p90_days"),
    )


@register(
    "q254_weighted_median_price",
    oracle="""
WITH census AS (
  SELECT l_returnflag AS grp,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT grp, cents, w,
         SUM(w) OVER (PARTITION BY grp ORDER BY cents ASC) AS cum,
         SUM(w) OVER (PARTITION BY grp ORDER BY cents ASC) - w AS cum_before,
         SUM(w) OVER (PARTITION BY grp) AS n
  FROM census
)
SELECT grp,
       CAST(MAX(n) AS BIGINT) AS total_weight,
       COUNT(*) AS n_price_points,
       CAST(SUM(CASE WHEN cum_before < (n + 1) // 2 AND (n + 1) // 2 <= cum
                     THEN cents ELSE 0 END) AS BIGINT) AS wmedian_lo_cents,
       CAST(SUM(CASE WHEN cum_before < (n + 2) // 2 AND (n + 2) // 2 <= cum
                     THEN cents ELSE 0 END) AS BIGINT) AS wmedian_hi_cents,
       CAST(SUM(CASE WHEN cum_before < (n + 9) // 10 AND (n + 9) // 10 <= cum
                     THEN cents ELSE 0 END) AS BIGINT) AS wp10_cents,
       CAST(SUM(CASE WHEN cum_before < (9 * n + 9) // 10 AND (9 * n + 9) // 10 <= cum
                     THEN cents ELSE 0 END) AS BIGINT) AS wp90_cents
FROM cum
GROUP BY grp
""",
    tags=("analytics", "quantiles", "weighted"),
)
def q254_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted price quantiles per return flag: the weighted
    median / p10 / p90 located on a (group, price) census where each
    price point carries its total quantity as weight — 'the median
    dollar of volume', not the median line item. Same scale shape as
    q245: reduce to a census, locate ranks by cumulative weights,
    integer-exact element picks (lo/hi median bracket the even-total
    case). No global sort, no per-row window."""
    li = load_table(spark, sf_dir, "lineitem")
    census = (
        li.select(
            F.col("l_returnflag").alias("grp"),
            F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("grp", "cents")
        .agg(F.sum("q").alias("w"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy(F.col("cents").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = census.select(
        "grp",
        "cents",
        "w",
        F.sum("w").over(w_cum).alias("cum"),
        (F.sum("w").over(w_cum) - F.col("w")).alias("cum_before"),
        F.sum("w").over(Window.partitionBy("grp")).alias("n"),
    )
    pick_at = lambda r: F.sum(
        F.when((F.col("cum_before") < r) & (r <= F.col("cum")), F.col("cents")).otherwise(0)
    )
    return cum.groupBy("grp").agg(
        F.max("n").alias("total_weight"),
        F.count(F.lit(1)).alias("n_price_points"),
        pick_at(F.expr("(n + 1) div 2")).alias("wmedian_lo_cents"),
        pick_at(F.expr("(n + 2) div 2")).alias("wmedian_hi_cents"),
        pick_at(F.expr("(n + 9) div 10")).alias("wp10_cents"),
        pick_at(F.expr("(9 * n + 9) div 10")).alias("wp90_cents"),
    )
