"""Subquery operators: correlated scalar subqueries (Catalyst
decorrelates these into aggregated joins — SURVEY.md §4.2) and
IN / NOT IN subqueries (planned as semi/anti joins).

Both run through `spark.sql` with the *same* SQL text the DuckDB
oracle executes — the quantized-average expression is engine-portable
(see functions/determinism.py), so one string serves both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_Q45_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(floor(c2.c_acctbal * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 / COUNT(c2.c_acctbal)
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


@register(
    "q45_correlated_scalar_subquery",
    oracle=_Q45_SQL,
    tags=("subquery", "correlated"),
)
def q45_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance. Catalyst
    rewrites the correlated scalar subquery into an aggregate +
    join (RewriteCorrelatedScalarSubquery) — no per-row re-execution,
    which is what makes this shape viable at 100 TB."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_Q45_SQL)


_Q46_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
"""


@register(
    "q46_in_not_in_subquery",
    oracle=_Q46_SQL,
    tags=("subquery", "semi", "anti"),
)
def q46_in_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN → left-semi join, NOT IN → null-aware left-anti join
    (the subquery key is non-null here; with nullable keys NOT IN
    becomes the classic three-valued-logic trap)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q46_SQL)
