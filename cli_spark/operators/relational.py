"""Scan / projection / filter / predicate operators.

Covers SURVEY.md §2 Tier B "Projection / filter / predicates": select,
withColumn, filter with full boolean algebra, IN, BETWEEN, LIKE/RLIKE,
NULL handling / three-valued logic, CASE WHEN. Everything here is
built-in Catalyst expressions — filters and projections reach the
parquet scan (PushedFilters / ReadSchema), so at 100 TB these queries
read only the row groups and columns they need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.functions.determinism import davg, dsum, sql_davg, sql_dsum
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→project→agg.

    Flagship query (SURVEY.md §7 M0). Filter pushes to parquet; the
    groupBy is a partial+final hash aggregate on 2 low-cardinality
    keys — at 100 TB the shuffle moves only ~6 rows per map task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice,
       CASE WHEN o_totalprice > 400000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS size_class
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 50000 AND 500000
  AND o_orderpriority LIKE '_-%'
  AND NOT (o_orderpriority LIKE '%LOW%')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
""",
    tags=("filter",),
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pack: IN, BETWEEN, LIKE, NOT, CASE WHEN.

    All predicates are Catalyst-pushable; `.explain` shows them in
    PushedFilters (In, GreaterThanOrEqual, StringStartsWith-convertible
    LIKEs) so parquet row-group stats prune at scale.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(50000, 500000)
            & F.col("o_orderpriority").like("_-%")
            & ~F.col("o_orderpriority").like("%LOW%")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_orderstatus",
            "o_totalprice",
            F.when(F.col("o_totalprice") > 400000, "big")
            .when(F.col("o_totalprice") > 150000, "mid")
            .otherwise("small")
            .alias("size_class"),
        )
    )


@register(
    "q03_null_three_valued_logic",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal = 0 THEN 'zero'
            ELSE 'pos' END AS bal_class,
       (c_acctbal > 5000 AND c_nationkey > 12) AS both_flag,
       (NULLIF(c_acctbal, c_acctbal) IS NULL) AS null_probe
FROM customer
WHERE (c_acctbal > 1000 OR c_mktsegment = 'BUILDING')
  AND c_name IS NOT NULL
""",
    tags=("filter", "null"),
)
def q03_null_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif / coalesce / boolean outputs / IS NULL."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        ((F.col("c_acctbal") > 1000) | (F.col("c_mktsegment") == "BUILDING"))
        & F.col("c_name").isNotNull()
    ).select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("pos")
        .alias("bal_class"),
        ((F.col("c_acctbal") > 5000) & (F.col("c_nationkey") > 12)).alias("both_flag"),
        F.nullif(F.col("c_acctbal"), F.col("c_acctbal")).isNull().alias("null_probe"),
    )


@register(
    "q04_projection_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
       l_quantity * 2.5 + 1 AS scaled_qty,
       - l_discount AS neg_disc
FROM lineitem
WHERE l_linenumber <= 3 AND l_returnflag = 'A'
""",
    tags=("projection",),
)
def q04_projection_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level arithmetic projection (IEEE ops — bit-identical
    cross-engine without quantization since no reordering happens)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") <= 3) & (F.col("l_returnflag") == "A"))
        .withColumn("net_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .withColumn("gross_price", F.col("net_price") * (1 + F.col("l_tax")))
        .withColumn("scaled_qty", F.col("l_quantity") * 2.5 + 1)
        .withColumn("neg_disc", -F.col("l_discount"))
        .select(
            "l_orderkey", "l_linenumber", "net_price", "gross_price", "scaled_qty", "neg_disc"
        )
    )


@register(
    "q05_rlike_regex_filter",
    oracle=r"""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE regexp_matches(p_name, '^(small|large) (widget|bolt)$')
  AND regexp_matches(p_brand, 'Brand#(1[0-9]|2)$')
""",
    tags=("filter", "regex"),
)
def q05_rlike_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE regex predicates (Java regex ≡ duck RE2 for this class)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike(r"^(small|large) (widget|bolt)$")
        & F.col("p_brand").rlike(r"Brand#(1[0-9]|2)$")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "q415_api_equivalence",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "api_surface", "equivalence"),
)
def q415_api_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-API EQUIVALENCE capstone: the q01-shape census expressed
    through every batch API surface the engine exposes — (1) the
    DataFrame API, (2) classic SQL, (3) Spark 4.1 SQL pipe syntax
    (`|>`), (4) pandas-on-Spark groupby — and asserted IN-QUERY to
    produce identical row sets before one of them is returned for
    grading. This is the contract a mixed team actually relies on:
    the analyst's SQL, the engineer's DataFrame chain, and the data
    scientist's pandas groupby must be the SAME query to Catalyst
    (same semantics; the declarative surfaces literally share one
    optimized plan shape), so nobody's dialect silently disagrees
    with the dashboard. A divergence in any surface (a pandas-API
    aggregation subtlety, a pipe-syntax rewrite bug) fails the query
    loudly rather than shipping four almost-equal answers."""
    import warnings

    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    cutoff = F.lit("1998-09-02").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem")
    qty_q = F.floor(F.col("l_quantity") * 10000.0 + 0.5).cast("decimal(38,0)")
    df_api = (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(qty_q).cast("double") / 10000.0).alias("sum_qty"),
        )
    )
    sql_text = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(floor(l_quantity * 10000.0 + 0.5)
                     AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    sql_api = spark.sql(sql_text)
    pipe_api = spark.sql("""
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> EXTEND CAST(floor(l_quantity * 10000.0 + 0.5) AS DECIMAL(38,0)) AS qq
|> AGGREGATE COUNT(*) AS n_rows,
             CAST(SUM(qq) AS DOUBLE) / 10000.0 AS sum_qty
   GROUP BY l_returnflag, l_linestatus
""")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pdf = (
            li.filter(F.col("l_shipdate") <= cutoff)
            .select("l_returnflag", "l_linestatus", qty_q.alias("qq"))
            .pandas_api()
        )
        ps_api = (
            pdf.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(n_rows=("qq", "count"), qsum=("qq", "sum"))
            .to_spark()
            .select(
                "l_returnflag", "l_linestatus",
                F.col("n_rows").cast("long").alias("n_rows"),
                (F.col("qsum").cast("double") / 10000.0).alias("sum_qty"),
            )
        )
    canonical = sorted(tuple(r) for r in df_api.collect())
    for label, frame in (("sql", sql_api), ("pipe", pipe_api),
                         ("pandas", ps_api)):
        got = sorted(tuple(r) for r in frame.collect())
        if got != canonical:
            raise RuntimeError(
                f"q415: {label} API surface diverged from the DataFrame "
                f"API on the same census"
            )
    return df_api
