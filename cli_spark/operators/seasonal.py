"""Seasonality & smoothing operators over the event stream — EWMA
smoothing, hour-of-week load profiles, and autocorrelation structure.

These are the classic capacity-planning / anomaly-baseline queries an
event warehouse runs daily. Scale notes:

* q235's EWMA is the dyadic-weight (α = 1/2) formulation truncated at
  8 taps: the weights are powers of two, so the smoothed value is an
  exact integer ratio — no float recurrence, no cross-engine drift —
  and the whole thing is 8 ``lag`` reads over ONE window spec (one
  shuffle on user_id, identical to any per-user analytic pass).
* q236 is a census + two-phase share: the (event_type, hour-of-week)
  grid is at most |types|·168 rows after the first aggregation, so
  the ranking window runs on a relation the size of the answer, not
  the size of the data. Day-of-week comes from integer epoch-day
  arithmetic ((days+4) % 7, Thursday-anchored) — not from the
  engines' locale-dependent dayofweek functions (Spark Sunday=1 vs
  DuckDB dow Sunday=0, SURVEY.md §2's gotcha list).
* q237 reduces the stream to an hourly per-type series FIRST (map-side
  combine collapses events per hour before the shuffle), then builds
  lag pairs with a window — the expensive part is one hash agg over
  the raw events; everything after runs on |types|·|hours| rows. The
  Pearson terms stay in exact int64 sums; the final ratio is computed
  with an identical IEEE expression (int→double casts, one multiply,
  one sqrt, one divide — each correctly rounded) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_T_US = "epoch_us(CAST(ts AS TIMESTAMP))"

# EWMA with alpha = 1/2, truncated at 8 taps: weight of lag k is
# 2^(7-k). With all 8 taps present the denominator is 255 (not 256 —
# the truncated tail mass is renormalized over the taps actually
# present, which also gives partial-history rows an exact answer).
_N_TAPS = 8


@register(
    "q235_ewma_dyadic",
    oracle=f"""
WITH cents AS (
  SELECT event_id, user_id, {_T_US} AS t_us,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase'
),
lagged AS (
  SELECT event_id, user_id, c,
         {", ".join(
             f"lag(c, {k}) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC) AS l{k}"
             for k in range(1, _N_TAPS)
         )}
  FROM cents
)
SELECT event_id, user_id, c,
       (c * 128 + {" + ".join(f"COALESCE(l{k} * {1 << (7 - k)}, 0)" for k in range(1, _N_TAPS))})
         // (128 + {" + ".join(f"CASE WHEN l{k} IS NOT NULL THEN {1 << (7 - k)} ELSE 0 END" for k in range(1, _N_TAPS))})
         AS ewma_cents
FROM lagged
""",
    tags=("timeseries", "window", "ewma"),
)
def q235_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of per-user purchase
    amounts, α = 1/2 truncated at 8 taps. Dyadic weights (128, 64, …,
    1) make the smoothed value an exact integer division of two int64
    sums — deterministic on any partitioning and bit-identical to the
    oracle (values are non-negative, so `div` and `//` agree). One
    window spec → one shuffle on user_id; the 8 lag reads share the
    sort."""
    e = load_table(spark, sf_dir, "events")
    cents = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("t_us"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).alias("c"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t_us").asc(), F.col("event_id").asc())
    lagged = cents.select(
        "event_id",
        "user_id",
        "c",
        *[F.lag("c", k).over(w).alias(f"l{k}") for k in range(1, _N_TAPS)],
    )
    num = F.col("c") * F.lit(128)
    den = F.lit(128)
    for k in range(1, _N_TAPS):
        wk = 1 << (7 - k)
        num = num + F.coalesce(F.col(f"l{k}") * F.lit(wk), F.lit(0))
        den = den + F.when(F.col(f"l{k}").isNotNull(), F.lit(wk)).otherwise(F.lit(0))
    return (
        lagged.select(
            "event_id",
            "user_id",
            "c",
            num.cast("long").alias("_num"),
            den.cast("long").alias("_den"),
        )
        .select("event_id", "user_id", "c", F.expr("_num div _den").alias("ewma_cents"))
    )


@register(
    "q236_hour_of_week_profile",
    oracle=f"""
WITH grid AS (
  SELECT event_type,
         ((({_T_US} // 86400000000) + 4) % 7) * 24
           + (({_T_US} % 86400000000) // 3600000000) AS how,
         COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, how,
       how // 24 AS dow, how % 24 AS hour,
       n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_ppm,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, how ASC) AS BIGINT) AS rnk
FROM grid
""",
    tags=("timeseries", "seasonality"),
)
def q236_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week load profile per event type: the 7×24 seasonality
    grid (census + share of the type's total in ppm + peak rank).
    Day-of-week via Thursday-anchored integer epoch-day arithmetic —
    identical in both engines, unlike their dayofweek builtins. The
    raw-event aggregation is the only full-data pass; the share/rank
    windows run over ≤ 168 rows per type."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    how = (
        ((t_us / F.lit(86400000000)).cast("long") + F.lit(4)) % F.lit(7) * F.lit(24)
        + (t_us % F.lit(86400000000) / F.lit(3600000000)).cast("long")
    )
    grid = (
        e.select("event_type", how.alias("how"))
        .groupBy("event_type", "how")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("event_type")
    w_rnk = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("how").asc())
    return grid.select(
        "event_type",
        "how",
        F.expr("how div 24").alias("dow"),
        (F.col("how") % F.lit(24)).alias("hour"),
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
        F.sum("n").over(w_tot).alias("_tot"),
        F.row_number().over(w_rnk).cast("long").alias("rnk"),
    ).select(
        "event_type",
        "how",
        "dow",
        "hour",
        "n",
        F.expr("_num div _tot").alias("share_ppm"),
        "rnk",
    )


@register(
    "q237_autocorr_lags",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, {_T_US} // 3600000000 AS hr, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, c AS x,
         lag(c, 1) OVER (PARTITION BY event_type ORDER BY hr ASC) AS y1,
         lag(c, 2) OVER (PARTITION BY event_type ORDER BY hr ASC) AS y2,
         lag(c, 3) OVER (PARTITION BY event_type ORDER BY hr ASC) AS y3
  FROM hourly
),
pairs AS (
  SELECT event_type, 1 AS lag_h, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2 AS lag_h, x, y2 AS y FROM lagged WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3 AS lag_h, x, y3 AS y FROM lagged WHERE y3 IS NOT NULL
),
sums AS (
  SELECT event_type, lag_h,
         COUNT(*) AS n,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag_h, n, sxy, sx, sy, sxx, syy,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
         CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
       END AS corr_ppm
FROM sums
""",
    tags=("timeseries", "autocorrelation"),
)
def q237_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of hourly event volume at lags 1–3 h per event
    type — the seasonality detector behind alerting baselines. The
    stream is first reduced to an hourly series (the only full-data
    aggregation; map-side combine does most of it pre-shuffle), lag
    pairs come from one ordered window over that tiny series, and the
    Pearson terms are exact int64 sums. corr_ppm is floor(1e6·r)
    computed with the *same* IEEE double expression in both engines
    (int→double casts, multiply, sqrt, divide — all correctly rounded,
    hence bit-identical). Zero-variance series yield NULL."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("hr").asc())
    lagged = hourly.select(
        "event_type",
        F.col("c").alias("x"),
        F.lag("c", 1).over(w).alias("y1"),
        F.lag("c", 2).over(w).alias("y2"),
        F.lag("c", 3).over(w).alias("y3"),
    )
    pairs = lagged.select(
        "event_type",
        F.expr("stack(3, 1, y1, 2, y2, 3, y3)").alias("lag_h", "y"),
        "x",
    ).filter(F.col("y").isNotNull())
    sums = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = F.when(
        (d1 * d2) > 0,
        F.floor(
            num.cast("double") * F.lit(1000000.0) / F.sqrt(d1.cast("double") * d2.cast("double"))
        ),
    )
    return sums.select(
        "event_type", "lag_h", "n", "sxy", "sx", "sy", "sxx", "syy",
        corr.alias("corr_ppm"),
    )
