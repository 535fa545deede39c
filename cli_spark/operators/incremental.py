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
