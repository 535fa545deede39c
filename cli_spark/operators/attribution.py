"""Multi-touch attribution — position-based (U-shaped 40/20/40)
credit assignment over per-user event journeys.

Complements q195's last-touch model: each purchase closes a journey
consisting of the user's non-purchase events since the previous
purchase; credit for the conversion is split 40% to the first touch,
40% to the last, 20% across the middle touches. All credit is exact
integer ppm — the middle share uses floor division with the
remainder distributed one ppm at a time to the earliest middle
touches, so every converted journey's credits sum to exactly
1,000,000 (pinned by a property test).

Scale shape: two window passes, both partitioned on user_id (the
journey tag rides the same hash partitioning as the per-journey
rank — Spark reuses the exchange), then one census aggregation per
event type. No joins, no skewed partitions (a user's history is the
partition unit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_T_US = "epoch_us(CAST(ts AS TIMESTAMP))"


@register(
    "q248_position_attribution",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, {_T_US} AS t_us,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY {_T_US} ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id) AS total_conv
  FROM events
),
touches AS (
  SELECT user_id, event_id, event_type, journey,
         row_number() OVER (PARTITION BY user_id, journey
                            ORDER BY t_us ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, journey) AS n
  FROM ordered
  WHERE event_type <> 'purchase' AND journey < total_conv
),
credited AS (
  SELECT event_type,
         CASE
           WHEN n = 1 THEN 1000000
           WHEN n = 2 THEN 500000
           WHEN rn = 1 OR rn = n THEN 400000
           ELSE 200000 // (n - 2)
                + CASE WHEN rn - 1 <= 200000 % (n - 2) THEN 1 ELSE 0 END
         END AS credit_ppm
  FROM touches
)
SELECT event_type,
       COUNT(*) AS n_touches,
       CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_total
FROM credited
GROUP BY event_type
""",
    tags=("analytics", "attribution", "window"),
)
def q248_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: per event
    type, the touches credited and the total conversion credit in ppm.
    Journeys are delimited by purchases (the journey tag is the count
    of purchases strictly before the event); only journeys that end in
    a purchase earn credit. A single-touch journey takes the full
    1e6 ppm, two touches split 500k/500k, otherwise ends take 400k
    each and the middle floor-divides 200k with the remainder going
    one ppm at a time to the earliest middles — exactly 1e6 per
    conversion, all integers."""
    e = load_table(spark, sf_dir, "events")
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w_j = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("user_id")
    ordered = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t_us"),
    ).select(
        "*",
        F.coalesce(F.sum(is_p).over(w_j), F.lit(0)).alias("journey"),
        F.sum(is_p).over(w_tot).alias("total_conv"),
    )
    w_rn = Window.partitionBy("user_id", "journey").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    w_n = Window.partitionBy("user_id", "journey")
    touches = (
        ordered.filter(
            (F.col("event_type") != "purchase")
            & (F.col("journey") < F.col("total_conv"))
        )
        .select(
            "event_type",
            F.row_number().over(w_rn).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(400000))
        .otherwise(
            F.expr("200000 div (n - 2)")
            + F.when(F.col("rn") - 1 <= F.expr("200000 % (n - 2)"), 1).otherwise(0)
        )
    )
    return (
        touches.select("event_type", credit.alias("credit_ppm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_ppm").alias("credit_ppm_total"),
        )
    )
