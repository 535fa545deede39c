"""TPC-H-shaped composite queries (Q6/Q7/Q8/Q10 analogues over the
driver's star schema) — multi-block plans stacking the primitive
operators the rest of the registry grades individually: selective
scans, multi-way broadcast star joins, conditional aggregation,
market-share ratios, and top-K over grouped revenue.

Scale notes: every dimension side broadcasts (BROADCAST_DIMS); the
fact table (lineitem) is filtered at the scan and never shuffled
except for the final small-key aggregations; revenue sums use the
determinism layer's exact quantized form so the ratio queries (Q8
market share) divide identical integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.functions.determinism import dsum, sql_dsum
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# lazy: building a Column invokes the JVM, which must not happen at
# import time (the registry imports this module before any session)
def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q61_tpch_q6_forecast",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue_delta,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "tpch", "selective_scan"),
)
def q61_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the fully-pushed-down selective scan + global
    aggregate. All three predicates reach the parquet reader; the
    aggregation is a single partial+final pair over one column pair."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q62_tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {sql_dsum(_SQL_REV)} AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
    tags=("join", "tpch", "star"),
)
def q62_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year. Five joins — every dimension broadcasts, the nation-pair
    predicate prunes before aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(_rev()).alias("volume"))


@register(
    "q63_tpch_q8_market_share",
    oracle=f"""
WITH all_orders AS (
  SELECT year(o.o_orderdate) AS o_year,
         {_SQL_REV} AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST(floor(volume * 10000.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / SUM(CAST(floor(volume * 10000.0 + 0.5) AS BIGINT)) AS mkt_share
FROM all_orders
GROUP BY o_year
""",
    tags=("agg", "tpch", "conditional", "ratio"),
)
def q63_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total order volume per
    year — conditional aggregation producing a ratio. Numerator and
    denominator are both exact int64 quantized sums, so the final
    division is one IEEE op on identical operands in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    from cli_spark.functions.determinism import quantize

    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.year("o_orderdate").alias("o_year"), quantize(_rev()).alias("qvol"), "supp_nation")
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("qvol")).otherwise(0)).cast("double")
            / F.sum("qvol")
        ).alias("mkt_share")
    )


@register(
    "q64_tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum(_SQL_REV)} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("join", "tpch", "topk"),
)
def q64_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.
    Returned-flag filter at the scan, star join with broadcast dims,
    TakeOrderedAndProject top-K (unique c_custkey tie-break)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
