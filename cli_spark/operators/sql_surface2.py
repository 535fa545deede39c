"""SQL-surface pack 2, round 10 — recursive CTE over DATA (not a
generator spine), the generator-function family, bitwise aggregates,
and the second datetime-function ladder.

Each query is exact-integer (or floor-quantized) so the DuckDB oracle
hash-matches bit-for-bit; where the two engines' function vocabularies
diverge (getbit, next_day, dayofweek numbering), the oracle mirrors
the SEMANTICS with arithmetic rather than skipping the surface — the
grade pins Spark's function behavior against an independent
derivation, not against the same function re-spelled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table, register_views


@register(
    "q421_recursive_hierarchy_rollup",
    oracle="""
WITH RECURSIVE walk(node, cur, lvl, cents) AS (
  SELECT c_custkey, c_custkey, 0,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT node, cur // 10, lvl + 1, cents FROM walk WHERE cur >= 10
)
SELECT CAST(cur AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(lvl) AS INTEGER) AS max_depth,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS acctbal_sum
FROM walk WHERE cur < 10
GROUP BY cur
""",
    tags=("sql", "recursive_cte", "hierarchy"),
)
def q421_recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE over data (Spark 4.1 `WITH RECURSIVE`): every
    customer walks a derived 10-ary org chart (parent = custkey DIV
    10) up to its single-digit root, and account balances roll up per
    root subtree — the org-hierarchy / BOM-explosion shape that a
    fixed-depth self-join cannot express because the depth is
    data-dependent. Unlike q117 (recursion as a 36-row month
    GENERATOR), the recursion here carries one row PER INPUT ROW per
    level: at 100 TB the per-iteration frame is a full shuffle-free
    projection and the iteration count is log10(max key) — bounded
    parallel work, the same plan Spark executes for UNION-ALL loop
    unrolling. Balances are floor-quantized to exact cents before
    summing."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH RECURSIVE walk(node, cur, lvl, cents) AS (
  SELECT c_custkey, c_custkey, 0,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT node, cur DIV 10, lvl + 1, cents FROM walk WHERE cur >= 10
)
SELECT CAST(cur AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(lvl) AS INT) AS max_depth,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS acctbal_sum
FROM walk WHERE cur < 10
GROUP BY cur
"""
    )


@register(
    "q422_generator_pack",
    oracle="""
WITH base AS (
  SELECT o_orderkey % 5 AS m5, o_orderkey % 7 AS m7,
         o_orderkey % 11 AS m11, o_orderkey % 3 AS m3,
         o_orderkey % 4 AS m4
  FROM orders
)
SELECT variant, n_rows, val_sum FROM (
  SELECT 'posexplode_outer' AS variant,
         CAST(SUM(CASE WHEN m5 = 0 THEN 1 ELSE 2 END) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN m5 = 0 THEN 0 ELSE m7 + m11 + 1 END) AS BIGINT) AS val_sum
  FROM base
  UNION ALL
  SELECT 'inline:a', CAST(COUNT(*) AS BIGINT), CAST(SUM(m3) AS BIGINT) FROM base
  UNION ALL
  SELECT 'inline:b', CAST(COUNT(*) AS BIGINT), CAST(SUM(m4) AS BIGINT) FROM base
  UNION ALL
  SELECT 'stack:x', CAST(COUNT(*) AS BIGINT), CAST(SUM(m3) AS BIGINT) FROM base
  UNION ALL
  SELECT 'stack:y', CAST(COUNT(*) AS BIGINT), CAST(SUM(m4) AS BIGINT) FROM base
  UNION ALL
  SELECT 'stack:z', CAST(COUNT(*) AS BIGINT), CAST(SUM(m5) AS BIGINT) FROM base
  UNION ALL
  SELECT 'sequence', CAST(SUM(1 + m4) AS BIGINT),
         CAST(SUM(((1 + m4) * (2 + m4)) / 2) AS BIGINT) FROM base
) t
""",
    tags=("sql", "generators", "explode", "lateral_view"),
)
def q422_generator_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATOR-FUNCTION family in one graded pack: posexplode_outer
    (NULL arrays must still emit one null row — the outer contract
    that plain posexplode silently violates by dropping the parent
    row), inline over an array of structs (struct fan-out without
    per-field explodes), stack (the n-ary unpivot generator), and
    explode(sequence(...)) (data-dependent row amplification). The
    oracle never unnests: every census is re-derived ARITHMETICALLY
    from the generating expressions (e.g. the sequence sum is
    m(m+1)/2), so a generator that drops, duplicates, or mis-numbers
    rows breaks the hash against closed-form ground truth. Generators
    are Spark's row-amplification workhorse — at 100 TB they run
    inside whole-stage codegen with no shuffle, which is why each
    variant here is a narrow map-side plan. val_sum for
    posexplode_outer adds pos+val per emitted row (so POSITIONS are
    graded too); NULL rows contribute zero."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH base AS (
  SELECT o_orderkey % 5 AS m5, o_orderkey % 7 AS m7,
         o_orderkey % 11 AS m11, o_orderkey % 3 AS m3,
         o_orderkey % 4 AS m4
  FROM orders
),
pe AS (
  SELECT pos, val FROM base
  LATERAL VIEW OUTER posexplode(
    CASE WHEN m5 = 0 THEN CAST(NULL AS ARRAY<BIGINT>)
         ELSE array(m7, m11) END) AS pos, val
),
inl AS (
  SELECT k, v FROM base
  LATERAL VIEW inline(array(named_struct('k', 'a', 'v', m3),
                            named_struct('k', 'b', 'v', m4))) AS k, v
),
st AS (
  SELECT lbl, v FROM base
  LATERAL VIEW stack(3, 'x', m3, 'y', m4, 'z', m5) AS lbl, v
),
sq AS (
  SELECT s FROM base LATERAL VIEW explode(sequence(1, 1 + m4)) AS s
)
SELECT 'posexplode_outer' AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(coalesce(pos, 0) + coalesce(val, 0)) AS BIGINT) AS val_sum
FROM pe
UNION ALL
SELECT concat('inline:', k), CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS BIGINT)
FROM inl GROUP BY k
UNION ALL
SELECT concat('stack:', lbl), CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS BIGINT)
FROM st GROUP BY lbl
UNION ALL
SELECT 'sequence', CAST(COUNT(*) AS BIGINT), CAST(SUM(s) AS BIGINT) FROM sq
"""
    )


@register(
    "q423_bitwise_agg_pack",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(bit_and(o_orderkey % 8192) AS BIGINT) AS key_and,
       CAST(bit_or(o_orderkey % 8192) AS BIGINT) AS key_or,
       CAST(bit_xor(o_orderkey % 8192) AS BIGINT) AS key_xor,
       CAST(SUM(bit_count(CAST(o_orderkey % 8192 AS BIGINT))) AS BIGINT) AS popcount_sum,
       CAST(SUM((o_orderkey % 8192) >> 3 & 1) AS BIGINT) AS bit3_ones
FROM orders
GROUP BY o_orderpriority
""",
    tags=("sql", "bitwise", "aggregates"),
)
def q423_bitwise_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE aggregate pack: bit_and / bit_or / bit_xor aggregates
    plus bit_count and getbit scalars over a 13-bit key space. These
    are the primitives under flag-mask rollups, feature-bitmap
    intersection, and XOR-checksum reconciliation (bit_xor over a
    column is an order-independent content checksum — the mechanism
    q384's checksum sink builds on). The oracle computes getbit via
    explicit shift-and-mask, so Spark's getbit bit-numbering (LSB =
    position 0) is graded against first-principles arithmetic, not
    against itself. All three bitwise aggregates merge associatively
    and commutatively — map-side partial aggregation applies, so the
    100 TB plan is one narrow exchange of per-group 8-byte states."""
    li = load_table(spark, sf_dir, "orders")
    x = (F.col("o_orderkey") % 8192).cast("long")
    return li.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.bit_and(x).cast("long").alias("key_and"),
        F.bit_or(x).cast("long").alias("key_or"),
        F.bit_xor(x).cast("long").alias("key_xor"),
        F.sum(F.bit_count(x)).cast("long").alias("popcount_sum"),
        F.sum(F.getbit(x, F.lit(3))).cast("long").alias("bit3_ones"),
    )


@register(
    "q424_datetime_pack2",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(day(last_day(CAST(o_orderdate AS DATE)))) AS BIGINT) AS lastday_sum,
       CAST(SUM(8 - isodow(o_orderdate)) AS BIGINT) AS nextmon_gap_sum,
       CAST(SUM(weekofyear(o_orderdate)) AS BIGINT) AS week_sum,
       CAST(SUM(month(date_trunc('quarter', o_orderdate))) AS BIGINT) AS qmonth_sum,
       CAST(SUM(month(o_orderdate + INTERVAL 2 MONTH)) AS BIGINT) AS addm_sum,
       CAST(SUM(dayofweek(o_orderdate) + 1) AS BIGINT) AS dow_sum,
       CAST(SUM(CASE WHEN make_timestamp(year(o_orderdate), month(o_orderdate),
                                         day(o_orderdate), 0, 0, 0)
                       = date_trunc('day', o_orderdate)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_mts_eq
FROM orders
GROUP BY year(o_orderdate)
""",
    tags=("sql", "datetime", "functions"),
)
def q424_datetime_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATETIME ladder 2 — the calendar-boundary functions that
    silently disagree between engines unless graded: last_day
    (month-end snap), next_day (strictly-next weekday: a Monday input
    yields +7, graded as the gap datediff so DuckDB's isodow
    arithmetic is the independent derivation), ISO weekofyear (the
    week-53/week-1 year-boundary trap), date_trunc to QUARTER,
    add_months overflow clamping (Jan 31 + 1 month = Feb 28, never
    Mar 3), dayofweek numbering (Spark 1=Sunday vs DuckDB 0=Sunday —
    graded through the explicit +1 mapping), and make_timestamp
    field-reassembly round-tripping against date_trunc. Every value
    is summed per order-year, so a single mis-snapped boundary
    anywhere in the corpus breaks the hash."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.groupBy(F.year(d).cast("int").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.dayofmonth(F.last_day(d.cast("date")))).cast("long")
        .alias("lastday_sum"),
        F.sum(F.datediff(F.next_day(d.cast("date"), "Monday"), d.cast("date")))
        .cast("long").alias("nextmon_gap_sum"),
        F.sum(F.weekofyear(d)).cast("long").alias("week_sum"),
        F.sum(F.month(F.date_trunc("quarter", d))).cast("long")
        .alias("qmonth_sum"),
        F.sum(F.month(F.add_months(d.cast("date"), 2))).cast("long")
        .alias("addm_sum"),
        F.sum(F.dayofweek(d)).cast("long").alias("dow_sum"),
        F.sum(
            F.when(
                F.make_timestamp(
                    F.year(d), F.month(d), F.dayofmonth(d),
                    F.lit(0), F.lit(0), F.lit(0),
                )
                == F.date_trunc("day", d),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_mts_eq"),
    )
