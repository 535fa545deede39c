"""Incremental-maintenance operators: algebraic partial-aggregate
merge (materialized-view refresh) and event-stream debounce.

* q114 is the pattern behind every incremental rollup at 100 TB: keep
  per-partition PARTIAL states (quantized int64 sums + counts — the
  algebraic form that merges associatively), and on refresh merge
  yesterday's partials with today's delta instead of rescanning
  history. The query computes the same rollup through two disjoint
  partial runs + a merge, and must equal the oracle's single-pass
  aggregation exactly — the algebraic-correctness property that makes
  the incremental path safe to deploy. avg is derived from
  (sum, count) at merge time; never partial-averaged.
* q109 is batch debounce — drop an event when the previous event of
  the same (user, type) is closer than 5 minutes — the standard
  dedup-by-proximity cleanup before sessionization. One window (one
  shuffle on user_id); in streaming form the same predicate runs on
  applyInPandasWithState (streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.functions.determinism import sql_quantize
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_DEBOUNCE_US = 300_000_000  # 5 minutes in microseconds


@register(
    "q109_event_debounce",
    oracle=f"""
WITH seq AS (
  SELECT event_id, user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC
         ) AS prev_us
  FROM events
)
SELECT user_id, event_type,
       COUNT(*) AS total_events,
       CAST(SUM(CASE WHEN prev_us IS NULL OR t_us - prev_us > {_DEBOUNCE_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS kept_events
FROM seq GROUP BY user_id, event_type
""",
    tags=("events", "debounce", "window"),
)
def q109_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce census: per (user, event_type), how many events
    survive a 5-minute proximity filter (an event is kept iff no
    same-key event occurred within the previous 5 minutes — tie-broken
    by event_id). One window over one shuffle on user_id; the kept
    set feeds sessionization without double-counting bursts."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", "event_type").orderBy(
        t_us.asc(), F.col("event_id").asc()
    )
    seq = e.select(
        "user_id",
        "event_type",
        t_us.alias("t_us"),
        F.lag(t_us).over(w).alias("prev_us"),
    )
    keep = F.col("prev_us").isNull() | (F.col("t_us") - F.col("prev_us") > _DEBOUNCE_US)
    return seq.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("kept_events"),
    )


@register(
    "q114_partial_agg_merge",
    oracle=f"""
SELECT date_trunc('month', l_shipdate) AS ship_month, l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM({sql_quantize('l_extendedprice')}) AS BIGINT) AS price_q_sum,
       CAST(CAST(SUM({sql_quantize('l_extendedprice')}) AS BIGINT) AS DOUBLE)
         / 10000.0 / COUNT(*) AS avg_price
FROM lineitem GROUP BY date_trunc('month', l_shipdate), l_returnflag
""",
    tags=("incremental", "aggregate", "merge"),
)
def q114_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup refresh: build the (month, returnflag)
    pricing rollup as TWO disjoint partial aggregations (odd/even
    orderkey — standing in for 'yesterday's stored partials' and
    'today's delta') merged by summing their states. Quantized int64
    sums + counts are the algebraic state: merge order never changes
    the result, so this must equal the oracle's single-pass rollup
    bit-for-bit. The merge aggregation touches only rollup-sized
    data — the full-history rescan is gone."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    q = F.floor(F.col("l_extendedprice") * 10000.0 + 0.5)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month, "l_returnflag").agg(
            F.count(F.lit(1)).alias("p_rows"), F.sum(q).alias("p_price_q")
        )

    old = partial(li.filter(F.col("l_orderkey") % 2 == 0))
    delta = partial(li.filter(F.col("l_orderkey") % 2 == 1))
    merged = old.unionByName(delta)
    return merged.groupBy("ship_month", "l_returnflag").agg(
        F.sum("p_rows").cast("long").alias("n_rows"),
        F.sum("p_price_q").cast("long").alias("price_q_sum"),
        (
            F.sum("p_price_q").cast("double") / 10000.0 / F.sum("p_rows")
        ).alias("avg_price"),
    )


# q390: deterministic change-feed byte (the q105/q280 portable hex
# idiom) — classes: <48 DELETE, 48..127 UPDATE (+500 cents),
# >=224 INSERT (new key, cents+123).
_IVM_BYTE = (
    "(instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS {s})), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS {s})), 2, 1)) - 1"
)


@register(
    "q390_incremental_view_maintenance",
    # The oracle takes the OTHER route: apply the change feed to the
    # base rows, then aggregate the merged relation from scratch.
    # The Spark side never materializes the merged table — only
    # MV0 + delta aggregation — so a hash match proves the
    # maintenance algebra.
    oracle=f"""
WITH src AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         {_IVM_BYTE.format(s='VARCHAR')} AS b
  FROM orders
),
merged AS (
  SELECT o_orderpriority,
         CASE WHEN b >= 48 AND b < 128 THEN cents + 500 ELSE cents END AS cents
  FROM src WHERE b >= 48
  UNION ALL
  SELECT o_orderpriority, cents + 123 FROM src WHERE b >= 224
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS price_cents
FROM merged GROUP BY o_orderpriority
""",
    tags=("incremental", "ivm", "materialized_view"),
)
def q390_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (the delta-aggregation algebra
    under every materialized-view engine and Delta/Iceberg MV
    refresh): a per-priority revenue MV is maintained from a CDC
    delta stream WITHOUT touching the merged base table — deletes
    contribute (-1, -cents), updates (0, +delta-cents), inserts
    (+1, +cents) — and the maintained MV must equal a from-scratch
    recompute over the merged relation, which is exactly what the
    oracle builds by the other route. This works because COUNT/SUM
    are abelian-group aggregates (every delta has an inverse);
    min/max would need the full recompute path — the distinction
    that decides which MVs refresh in O(|delta|) at 100 TB and which
    in O(|table|). One scan of the base for MV0, one scan of the
    (small) delta, a 5-row merge join — never a merged-table scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(_IVM_BYTE.format(s="STRING")).alias("b"),
    )
    mv0 = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )
    deletes = o.filter("b < 48").select(
        "o_orderpriority", F.lit(-1).alias("dn"), (-F.col("cents")).alias("dc")
    )
    updates = o.filter("b >= 48 AND b < 128").select(
        "o_orderpriority", F.lit(0).alias("dn"), F.lit(500).alias("dc")
    )
    inserts = o.filter("b >= 224").select(
        "o_orderpriority", F.lit(1).alias("dn"),
        (F.col("cents") + 123).alias("dc"),
    )
    delta = (
        deletes.unionByName(updates).unionByName(inserts)
        .groupBy("o_orderpriority")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )
    ivm = (
        mv0.join(delta, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long").alias("n_orders"),
            (F.coalesce("c", F.lit(0)) + F.coalesce("dc", F.lit(0)))
            .cast("long").alias("price_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return ivm
