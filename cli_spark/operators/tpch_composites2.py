"""TPC-H-shaped composite pack 2 (Q2/Q4/Q9/Q11/Q12/Q13/Q14/Q15/Q16/
Q17/Q18/Q19/Q20/Q21/Q22 analogues over the driver's star schema —
with pack 1's Q6/Q7/Q8/Q10 and the standalone Q1/Q3/Q5 shapes, all
22 classic TPC-H query shapes are covered).

The driver's tables omit several classic TPC-H columns (``partsupp``,
``l_shipmode``, ``l_commitdate``, ``p_container``, ``c_phone``), so
queries that depend on them are re-expressed as faithful *analogues*
that preserve the plan shape being graded: correlated-min selection
(Q2), EXISTS semi-join with a non-equi arm (Q4), multi-way profit
rollup (Q9), outer-join histogram (Q13), conditional-ratio (Q14),
argmax-by-aggregate (Q15), correlated-average threshold (Q17),
HAVING-filtered fact self-aggregation (Q18), OR-of-band-predicates
(Q19), share-of-group window threshold (Q20), and anti-join +
scalar-average gate (Q22).

Scale notes (100 TB framing): part/supplier/customer/nation always
broadcast; lineitem is filtered at the scan (predicates visible as
PushedFilters) and shuffles at most once per query, on its aggregation
key. Correlated subqueries are expressed as window functions over the
fact's natural key (partkey/orderkey) so Catalyst plans one shuffle
instead of a rescan; every double aggregate uses the determinism
layer's quantized-int64 form so threshold comparisons and ratios are
IEEE-identical cross-engine (see functions/determinism.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.functions.determinism import (
    MONEY_SCALE,
    date_str,
    dsum,
    quantize,
    sql_dsum,
    sql_quantize,
)
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"
_SCALE_F = float(10**MONEY_SCALE)


@register(
    "q130_tpch_q2_min_price_supplier",
    oracle="""
SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, n.n_name,
       l.l_extendedprice AS min_price
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
""",
    tags=("tpch", "subquery", "correlated"),
)
def q130_tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp → lineitem analogue): for each
    STANDARD small part, the supplier(s) that shipped it at its
    minimum observed price. The correlated min is a window over
    l_partkey — one shuffle on the part key instead of a second scan
    of the fact; `min` is order-independent so the double compares
    exactly cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("l_partkey")
    # join the (broadcast) filtered part set FIRST: the per-part min is
    # unaffected by a partkey-level filter, and the window then runs on
    # ~1/20th of the fact rows.
    cand = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
    )
    return (
        cand.join(F.broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "min_price")
        .distinct()
    )


@register(
    "q131_tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
    tags=("tpch", "semi", "exists"),
)
def q131_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commitdate → shipdate-lag analogue): orders in
    a half-year window with at least one line shipped >60 days after
    order date, counted by priority. EXISTS becomes a left-semi join
    whose equi-arm (orderkey) drives a hash join; the non-equi arm
    rides along as the join condition — no BNLJ."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q132_tpch_q9_profit",
    oracle=f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {sql_dsum(_SQL_REV + " - p.p_retailprice * l.l_quantity * CAST(0.01 AS DOUBLE)")} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
    tags=("tpch", "star", "agg"),
)
def q132_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ps_supplycost → retailprice-fraction analogue):
    profit by supplier nation and order year for parts matching a
    name pattern. Four broadcast dims + one orders join; the LIKE
    prunes parts before the fact join so the broadcast side is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum(amount).alias("profit"))


@register(
    "q133_tpch_q13_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY c.c_custkey) t
GROUP BY c_count
""",
    tags=("tpch", "outer", "histogram"),
)
def q133_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, with the
    priority filter inside the LEFT JOIN's ON clause (so zero-order
    customers survive as count 0). Two aggregations: the first
    shuffles on c_custkey, the second on the tiny count domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o["o_custkey"] == c["c_custkey"])
            & (~o["o_orderpriority"].isin("1-URGENT", "2-HIGH")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q134_tpch_q14_promo_revenue",
    oracle=f"""
SELECT CAST(100.0 AS DOUBLE)
       * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN {sql_quantize(_SQL_REV)} ELSE 0 END) AS DOUBLE)
       / CAST(SUM({sql_quantize(_SQL_REV)}) AS DOUBLE) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    tags=("tpch", "ratio", "conditional"),
)
def q134_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO parts.
    Numerator and denominator are exact quantized int64 sums, so the
    final two IEEE ops (×100, ÷) see identical operands cross-engine.
    Single broadcast join, single global aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = quantize(_rev())
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", q).otherwise(F.lit(0))).cast("double")
            / F.sum(q).cast("double")
        ).alias("promo_pct")
    )


@register(
    "q135_tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({sql_quantize(_SQL_REV)}) AS qrev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       CAST(r.qrev AS DOUBLE) / {_SCALE_F!r} AS total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.qrev = (SELECT max(qrev) FROM revenue)
""",
    tags=("tpch", "argmax", "subquery"),
)
def q135_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue.
    The argmax compares exact int64 quantized revenues (no float-max
    ambiguity). The revenue CTE aggregates once on l_suppkey; its max
    is a 1-row broadcast joined back — no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(quantize(_rev())).alias("qrev")
    )
    mx = rev.agg(F.max("qrev").alias("max_qrev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["qrev"] == mx["max_qrev"])
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            (F.col("qrev").cast("double") / F.lit(_SCALE_F)).alias("total_revenue"),
        )
    )


@register(
    "q136_tpch_q17_small_qty_revenue",
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice')} / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
    SELECT (CAST(SUM({sql_quantize('l2.l_quantity')}) AS DOUBLE) / {_SCALE_F!r})
           / COUNT(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
    tags=("tpch", "correlated", "threshold"),
)
def q136_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually-small-quantity orders
    of one brand's parts. The correlated per-part average becomes a
    window over l_partkey (one shuffle, no rescan). The average is
    exact-int-sum / count, so the 0.2× threshold compare is
    IEEE-identical cross-engine.

    Note the window must run over ALL lineitems of each part (the
    oracle's inner query has no brand filter), so the brand filter
    joins AFTER the window — order matters for correctness here, and
    the plan trades that for a full-fact window shuffle exactly like
    the SQL's correlated rescan would."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    qavg = (
        F.sum(quantize(F.col("l_quantity"))).over(w).cast("double") / F.lit(_SCALE_F)
    ) / F.count("l_quantity").over(w)
    small = li.withColumn("qavg", qavg).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("qavg")
    )
    return small.join(F.broadcast(p), small["l_partkey"] == p["p_partkey"]).agg(
        (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )


@register(
    "q137_tpch_q18_large_volume",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
       o.o_totalprice, t.sum_qty
FROM (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({sql_quantize('l_quantity')}) > {int(250 * 10**MONEY_SCALE)}) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    tags=("tpch", "having", "topk"),
)
def q137_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: top-100 largest-volume orders (total quantity >
    250). The HAVING gate compares exact int64 sums; the top-K runs
    as TakeOrderedAndProject with o_orderkey as unique tie-break.
    lineitem shuffles once on its natural key; orders joins the small
    survivor set; customer broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(quantize(F.col("l_quantity"))).alias("qsum"))
        .filter(F.col("qsum") > F.lit(int(250 * 10**MONEY_SCALE)))
        .select(
            "l_orderkey",
            (F.col("qsum").cast("double") / F.lit(_SCALE_F)).alias("sum_qty"),
        )
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            date_str(F.col("o_orderdate")).alias("o_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q138_tpch_q19_or_bands",
    oracle=f"""
SELECT {sql_dsum(_SQL_REV)} AS revenue, COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("tpch", "or_predicates", "agg"),
)
def q138_tpch_q19_or_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR of three brand/size/quantity
    band predicates. Stays one broadcast hash join on partkey with
    the OR as a post-join filter; Catalyst also derives the implied
    disjunction residuals (quantity/size bands) for scan pruning."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))


@register(
    "q139_tpch_q20_share_suppliers",
    oracle=f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM({sql_quantize('l_quantity')}) AS sup_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey),
shares AS (
  SELECT l_partkey, l_suppkey, sup_qty,
         CAST(SUM(sup_qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty
  FROM ps)
SELECT DISTINCT s.s_name, n.n_name
FROM shares sh
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE CAST(sh.sup_qty AS DOUBLE)
      > CAST(0.2 AS DOUBLE) * CAST(sh.part_qty AS DOUBLE)
""",
    tags=("tpch", "window", "share"),
)
def q139_tpch_q20_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availqty → shipped-share analogue):
    suppliers who shipped >20% of any part's total quantity. The fact
    shuffles once on (l_partkey, l_suppkey) WITH map-side partial
    aggregation (~4 lines/pair combine before the wire); the per-part
    window then re-shuffles only the aggregated pair relation — at
    100 TB that is ~half the bytes of a repartition-first plan that
    would shuffle raw fact rows to share one partitioning. Survivors
    broadcast against supplier/nation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(quantize(F.col("l_quantity"))).alias("sup_qty")
    )
    w = Window.partitionBy("l_partkey")
    sh = ps.withColumn("part_qty", F.sum("sup_qty").over(w)).filter(
        F.col("sup_qty").cast("double")
        > F.lit(0.2) * F.col("part_qty").cast("double")
    )
    return (
        sh.join(F.broadcast(s), sh["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "q140_tpch_q22_idle_customers",
    oracle=f"""
SELECT n.n_name AS nation,
       COUNT(*) AS numcust,
       {sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (
    SELECT (CAST(SUM({sql_quantize('c2.c_acctbal')}) AS DOUBLE) / {_SCALE_F!r})
           / COUNT(c2.c_acctbal)
    FROM customer c2 WHERE c2.c_acctbal > CAST(0.0 AS DOUBLE))
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n.n_name
""",
    tags=("tpch", "anti", "scalar_subquery"),
)
def q140_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix → nation analogue): customers
    richer than the average positive balance with no orders since
    1999, rolled up by nation. The scalar average is a 1-row
    broadcast cross join (exact int-sum average); the NOT EXISTS is a
    left-anti hash join against date-filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > F.lit(0.0)).agg(
            (
                (
                    F.sum(quantize(F.col("c_acctbal"))).cast("double")
                    / F.lit(_SCALE_F)
                )
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        idle.join(F.broadcast(n), idle["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "q141_tpch_q11_important_parts",
    oracle=f"""
WITH nat AS (
  SELECT l.l_partkey, {sql_quantize(_SQL_REV)} AS qv
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'),
tot AS (SELECT SUM(qv) AS total_qv FROM nat)
SELECT nat.l_partkey AS p_key,
       CAST(SUM(nat.qv) AS DOUBLE) / {_SCALE_F!r} AS part_value
FROM nat, tot
GROUP BY nat.l_partkey, tot.total_qv
HAVING CAST(SUM(nat.qv) AS DOUBLE)
       > CAST(0.002 AS DOUBLE) * CAST(tot.total_qv AS DOUBLE)
""",
    tags=("tpch", "having", "scalar_subquery"),
)
def q141_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → shipped-revenue analogue):
    parts representing >0.2% of one nation's total shipped value.
    The global total is a 1-row broadcast (no rescan); the HAVING
    compares exact quantized int64 sums cast to double identically
    in both engines. lineitem shuffles once, on l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    nat = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), quantize(_rev()).alias("qv"))
    )
    per_part = nat.groupBy("l_partkey").agg(F.sum("qv").alias("part_qv"))
    tot = nat.agg(F.sum("qv").alias("total_qv"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_qv").cast("double")
            > F.lit(0.002) * F.col("total_qv").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_key"),
            (F.col("part_qv").cast("double") / F.lit(_SCALE_F)).alias("part_value"),
        )
    )


@register(
    "q142_tpch_q12_late_lines",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_linestatus
""",
    tags=("tpch", "conditional", "agg"),
)
def q142_tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus analogue): lines shipped
    late (>30 days after order) in 1997, split into high/low priority
    counts per line status. Integer conditional counts — no float
    determinism concerns. The ship-year filter is pushed to the scan;
    the late predicate rides the join condition."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
    )
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q143_tpch_q16_supplier_count",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0.0 AS DOUBLE))
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("tpch", "distinct", "not_in"),
)
def q143_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → lineitem pairs; complaint-comment
    exclusion → negative-balance exclusion): distinct supplier count
    per surviving (brand, type, size). The NOT IN is a left-anti
    broadcast join (suppkey is non-null on both sides, so NOT IN's
    null trap is inert and anti-join is semantics-identical); the
    distinct count shuffles once on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < F.lit(0.0)
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q144_tpch_q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 50
""",
    tags=("tpch", "exists", "anti", "topk"),
)
def q144_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (commit/receipt lateness → ship-lag analogue):
    suppliers who were the SOLE late shipper (>90 days) on a
    finished multi-supplier order, counted and top-50 ranked. The
    double correlation compiles to one semi and one anti hash join,
    both equi on l_orderkey with the supplier-inequality (and
    lateness, for the anti side) as join-condition residuals — no
    nested-loop rescan of the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = (
        li.join(
            o,
            (li["l_orderkey"] == o["o_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    # late lines of ANY order (not just status-F): mirrors the oracle's
    # l3 subquery, which re-derives lateness from orders independently.
    o_all = load_table(spark, sf_dir, "orders")
    l3 = (
        li.join(
            o_all,
            (li["l_orderkey"] == o_all["o_orderkey"])
            & (li["l_shipdate"] > o_all["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        )
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3"))
    )
    waiting = (
        l1.join(
            l2,
            (l1["l_orderkey"] == l2["k2"]) & (l1["l_suppkey"] != l2["sk2"]),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3["k3"]) & (F.col("l_suppkey") != l3["sk3"]),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(50)
    )
