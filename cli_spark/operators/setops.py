"""Set operators: UNION (ALL / by-name), INTERSECT (ALL), EXCEPT
(ALL), DISTINCT / dropDuplicates, plus global sort / limit / top-K.

Spark's set ops are positional (`union`) — `unionByName` is used where
schemas are assembled independently. INTERSECT/EXCEPT plan as
left-semi/anti joins over distinct inputs; the ALL variants keep
multiplicity via a hidden count column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q40_union_by_name",
    oracle="""
SELECT 'customer' AS kind, c_name AS name, c_nationkey AS nationkey FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_name AS name, s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "union"),
)
def q40_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two independently projected schemas via
    unionByName (column-name-resolved, not positional)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s)


@register(
    "q41_intersect_except",
    oracle="""
SELECT 'both' AS tag, nk FROM (
  SELECT c_nationkey AS nk FROM customer
  INTERSECT
  SELECT s_nationkey AS nk FROM supplier
)
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (
  SELECT c_nationkey AS nk FROM customer
  EXCEPT
  SELECT s_nationkey AS nk FROM supplier
)
""",
    tags=("setop", "intersect", "except"),
)
def q41_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics) of nation keys
    reachable from customers vs suppliers, tagged and unioned."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "nk")
    cust_only = c.exceptAll(s.distinct()).distinct().select(
        F.lit("cust_only").alias("tag"), "nk"
    )
    # `except` semantics == distinct(left) minus right; use the built-in:
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("tag"), "nk")
    return both.unionByName(cust_only)


@register(
    "q42_intersect_all_except_all",
    oracle="""
SELECT 'inter' AS tag, o_orderpriority AS pri FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'exc' AS tag, o_orderpriority AS pri FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
""",
    tags=("setop", "multiset"),
)
def q42_intersect_all_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL (multiplicity-preserving)."""
    o = load_table(spark, sf_dir, "orders")
    open_p = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("pri"))
    done_p = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("pri"))
    inter = open_p.intersectAll(done_p).select(F.lit("inter").alias("tag"), "pri")
    exc = open_p.exceptAll(done_p).select(F.lit("exc").alias("tag"), "pri")
    return inter.unionByName(exc)


@register(
    "q43_distinct_pairs",
    oracle="""
SELECT DISTINCT c_nationkey, c_mktsegment
FROM customer
WHERE c_acctbal > 0
""",
    tags=("setop", "distinct"),
)
def q43_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over a full projection (≡ SELECT DISTINCT).
    Subset-column dropDuplicates keeps an arbitrary row, so the
    deterministic keep-first variant lives in the dedup pack."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 0).select("c_nationkey", "c_mktsegment").dropDuplicates()


@register(
    "q44_global_sort_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
LIMIT 25
""",
    tags=("sort", "topk"),
)
def q44_global_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: orderBy().limit(k) plans TakeOrderedAndProject —
    each partition keeps k rows, the driver merges; no full sort, no
    shuffle of the whole table. Explicit NULLS ordering (Spark desc =
    NULLS LAST; DuckDB desc default = NULLS FIRST — always spell it)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .limit(25)
    )
