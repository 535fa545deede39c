"""Window-function operators: ranking, analytic (lag/lead), running
and sliding frames, RANGE frames, per-group top-K.

Determinism rules used throughout (the driver hash-compares rows):
* every ORDER BY inside a window ends with a unique key tie-break so
  row_number/ntile/lag pick identical rows in both engines;
* windowed SUM/AVG over doubles goes through the decimal quantization
  trick (both engines may use different accumulation trees — segment
  trees vs running state — so plain double frames aren't reproducible).

Scale: a window = one shuffle on partitionBy keys + per-partition
sort. Partition keys here are high-cardinality (custkey, user_id), so
state per key is small and AQE spreads skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.functions.determinism import dsum_over, quantize
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q30_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("window", "topk", "headline"),
)
def q30_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders by price (row_number ≤ k). The
    standard distributed per-group top-K: one shuffle on the group
    key, rank within partition, filter early."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q31_lag_lead",
    oracle="""
SELECT user_id, event_id, event_type,
       lag(value)  OVER w AS prev_value,
       lead(event_type) OVER w AS next_type,
       value - COALESCE(lag(value) OVER w, 0) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "analytic"),
)
def q31_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event streams (classic sessionized
    delta computation)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0))).alias("delta"),
    )


@register(
    "q32_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0 AS running_spend,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
    tags=("window", "frame"),
)
def q32_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend (ROWS UNBOUNDED PRECEDING →
    CURRENT ROW) with decimal-exact accumulation."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        dsum_over(F.col("o_totalprice"), frame).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "q33_sliding_frame_avg",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) OVER w4 AS DOUBLE) / 10000.0 / COUNT(value) OVER w4 AS avg_last4,
       CAST(min(value) OVER w4 AS DOUBLE) AS min_last4,
       CAST(max(value) OVER w4 AS DOUBLE) AS max_last4
FROM events
WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame"),
)
def q33_sliding_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 4-row frame (moving average / min / max per user)."""
    e = load_table(spark, sf_dir, "events")
    w4 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        (dsum_over(F.col("value"), w4) / F.count("value").over(w4)).alias(
            "avg_last4"
        ),
        F.min("value").over(w4).alias("min_last4"),
        F.max("value").over(w4).alias("max_last4"),
    )


@register(
    "q34_rank_functions",
    oracle="""
SELECT c_nationkey, c_custkey,
       rank()        OVER w AS bal_rank,
       dense_rank()  OVER w AS bal_dense_rank,
       ntile(4)      OVER wt AS bal_quartile,
       percent_rank() OVER w AS bal_pct_rank,
       cume_dist()   OVER w AS bal_cume_dist
FROM customer
WINDOW w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC),
       wt AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("window", "rank"),
)
def q34_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank/cume_dist per nation.
    rank-family functions tolerate ties (identical given the same sort
    key); ntile assigns by row position so its window adds a unique
    tie-break."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(wt).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@register(
    "q35_range_between",
    oracle="""
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
                      RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS orders_last_90d
FROM orders
""",
    tags=("window", "range"),
)
def q35_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric day offset: per customer, how many
    orders fell in the trailing 90-day window (value-based frame, so
    ties in the order column share a frame — no tie-break needed)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-90, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_last_90d"),
    )


@register(
    "q36_interval_range_window",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW) AS n_1h,
       CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 10000.0 AS value_1h
FROM events
""",
    tags=("window", "range", "interval"),
)
def q36_interval_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed by *time*, not row offsets: per user, the
    trailing-1-hour event count and (quantized-exact) value sum. The
    frame is value-based so rows with equal ts share it — identical
    peer semantics in both engines, no tie-break needed. The Python
    Window API only takes long offsets, so the interval frame is
    expressed in SQL window syntax via selectExpr — same Catalyst
    plan as a native rangeBetween."""
    e = load_table(spark, sf_dir, "events")
    frame = (
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW"
    )
    return e.selectExpr(
        "event_id",
        "user_id",
        f"COUNT(*) OVER ({frame}) AS n_1h",
        "CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) "
        f"OVER ({frame}) AS DOUBLE) / 10000.0 AS value_1h",
    )


@register(
    "q187_window_funcs2",
    oracle="""
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         o_orderdate AS od
  FROM orders
)
SELECT o_orderkey, o_custkey,
       first_value(cents) OVER w_full AS first_cents,
       last_value(cents) OVER w_full AS last_cents,
       nth_value(cents, 2) OVER w_full AS second_cents,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 8) AS pct_rank,
       round(cume_dist() OVER w, 8) AS cum_dist
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY od ASC, o_orderkey ASC),
       w_full AS (PARTITION BY o_custkey ORDER BY od ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "rank", "frames"),
)
def q187_window_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second window-function pack: first/last/nth_value over the FULL
    partition frame (explicit ROWS UNBOUNDED..UNBOUNDED — the default
    frame stops at CURRENT ROW, a classic silent-wrong-answer),
    ntile(4), percent_rank and cume_dist per customer order history.
    percent_rank=(rank−1)/(n−1) and cume_dist=rank/n are exact
    rationals of identical integers — cross-engine-identical doubles
    (rounded 8dp for belt-and-braces). One user-key shuffle serves all
    six functions: same partitioning, same sort."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
        F.col("o_orderdate").alias("od"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("od").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.select(
        "o_orderkey",
        "o_custkey",
        F.first("cents").over(w_full).alias("first_cents"),
        F.last("cents").over(w_full).alias("last_cents"),
        F.nth_value("cents", 2).over(w_full).alias("second_cents"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cum_dist"),
    )


@register(
    "q406_window_group_limit",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rk
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
    tags=("windows", "top_k", "plan_gated", "window_group_limit"),
)
def q406_window_group_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WindowGroupLimit physical optimization (SPARK-37099, 3.5+),
    plan-asserted: a `row_number() <= k` per-group top-K must NOT
    materialize and fully sort every group before filtering — the
    optimizer pushes the limit INTO the window operator, keeping a
    bounded k-row heap per group on the map side and dropping the
    rest before the shuffle. At 100 TB this is the difference
    between shuffling every order a customer ever placed and
    shuffling at most k per customer — same asymptotics as a top-K
    aggregate, expressed in plain window SQL (q30/q116 grade the
    SEMANTICS of top-k-per-group; this pins the PLAN the engine
    must use for it). The executed plan is asserted to contain
    WindowGroupLimit; an optimizer regression (rank expression the
    rule can't match, a frame that defeats it) fails loudly.
    Deterministic: price ties broken by order key on both sides."""
    from pyspark.sql.window import Window as _W

    o = load_table(spark, sf_dir, "orders")
    w = _W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    res = (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    if "WindowGroupLimit" not in plan:
        raise RuntimeError(
            "q406: executed plan lacks WindowGroupLimit — the top-K "
            "filter was not pushed into the window operator"
        )
    return res
