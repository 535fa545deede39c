"""Reshape operators: unpivot/melt, posexplode, explode_outer, stack.

Oracle mirrors use UNION ALL / lateral unnest — the portable ANSI
shapes of the same transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q47_unpivot",
    oracle="""
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
""",
    tags=("reshape", "unpivot"),
)
def q47_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide measure columns → long (key, value) rows —
    the inverse of q24's pivot. Narrow-format outputs are what keep
    downstream aggregations generic at scale."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")


@register(
    "q48_posexplode_outer",
    oracle="""
SELECT doc_id, i - 1 AS pos, list_extract(w, i) AS word, 'pos' AS src
FROM (SELECT doc_id, string_split(text, ' ')[1:3] AS w FROM documents WHERE doc_id < 50)
CROSS JOIN unnest(generate_series(1, 3)) AS t(i)
WHERE i <= len(w)
UNION ALL
SELECT doc_id, CAST(NULL AS BIGINT) AS pos, CAST(NULL AS VARCHAR) AS word, 'outer' AS src
FROM documents WHERE doc_id < 50
""",
    tags=("reshape", "explode"),
)
def q48_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (position-preserving expansion) + explode_outer
    (row-preserving on empty arrays — the outer variant emits a NULL
    row instead of dropping the parent)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    pos_part = d.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long"), "word", F.lit("pos").alias("src"))
    # an always-empty match → explode_outer must still keep each doc
    empty = F.filter(F.split("text", " "), lambda w: w == F.lit("impossible_token"))
    outer_part = d.select(
        "doc_id", F.explode_outer(empty).alias("word")
    ).select(
        "doc_id",
        F.lit(None).cast("long").alias("pos"),
        "word",
        F.lit("outer").alias("src"),
    )
    return pos_part.unionByName(outer_part)


@register(
    "q49_stack",
    oracle="""
SELECT r_regionkey, 'name' AS k, r_name AS v FROM region
UNION ALL
SELECT r_regionkey, 'key_str' AS k, CAST(r_regionkey AS VARCHAR) AS v FROM region
""",
    tags=("reshape", "stack"),
)
def q49_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL STACK(): inline row generation from column pairs."""
    r = load_table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.expr(
            "stack(2, 'name', r_name, 'key_str', CAST(r_regionkey AS STRING))"
        ).alias("k", "v"),
    )
