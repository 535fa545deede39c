"""As-of join — nearest predecessor match on a time axis.

Spark has no native batch AS-OF join (SURVEY.md §2 "Joins"); DuckDB
does (``ASOF JOIN``), which makes a perfect oracle. The implementation
here is the union+window rewrite:

    tag right rows side=0, left rows side=1
    union, sort within each key partition by (ts, side, seq)
    carry the latest right payload forward with last(ignorenulls)
    keep only left rows

One shuffle on the join key + one per-partition sort — the same cost
profile as a sort-merge join, and it streams: no per-key buffering of
the whole right side. At 100 TB both sides shuffle-partition on the
key; skewed keys are split by AQE like any sort-based join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.functions.determinism import ts_str
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_seq: str,
) -> DataFrame:
    """Left as-of join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (inclusive, matching DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``).

    ``right_seq`` breaks ordering ties among right rows at an
    identical timestamp (latest wins) so results are deterministic.
    Matched payload columns come back as ``asof_<col>`` (NULL when no
    predecessor exists).
    """
    l2 = left.withColumn("_side", F.lit(1)).withColumn("_seq", F.lit(None).cast("long")).withColumn(
        "_payload", F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload) + ">"
        )
    )
    r2 = right.select(
        F.col(right_ts).alias(left_ts),
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(right_seq).cast("long").alias("_seq"),
        F.struct(*right_payload).alias("_payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts), F.col("_side"), F.col("_seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_matched", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_seq", "_payload")
    for c in right_payload:
        out = out.withColumn(f"asof_{c}", F.col("_matched").getField(c))
    return out.drop("_matched")


@register(
    "q60_asof_join",
    oracle="""
SELECT l.event_id AS purchase_id,
       l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       l.value AS purchase_value,
       r.event_id AS asof_event_id,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
       r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
    tags=("join", "asof"),
)
def q60_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before
    it (classic attribution as-of join). Oracle: native DuckDB ASOF."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("asof_src_id"), "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["asof_src_id", "ts", "value"],
        right_seq="asof_src_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        ts_str(F.col("ts")).alias("purchase_ts"),
        "purchase_value",
        F.col("asof_asof_src_id").alias("asof_event_id"),
        ts_str(F.col("asof_ts")).alias("asof_ts"),
        F.col("asof_value"),
    )


@register(
    "q259_nearest_event_join",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe,
         CASE WHEN event_type = 'error' THEN epoch_us(CAST(ts AS TIMESTAMP)) END
           AS err_us
  FROM events
  WHERE event_type IN ('purchase', 'error')
),
scanned AS (
  SELECT user_id, event_id, t_us, is_probe,
         last_value(err_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_us,
         first_value(err_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_us
  FROM tagged
)
SELECT event_id, user_id,
       t_us - back_us AS back_gap_us,
       fwd_us - t_us AS fwd_gap_us,
       CASE
         WHEN back_us IS NULL AND fwd_us IS NULL THEN 'none'
         WHEN fwd_us IS NULL THEN 'backward'
         WHEN back_us IS NULL THEN 'forward'
         WHEN t_us - back_us <= fwd_us - t_us THEN 'backward'
         ELSE 'forward' END AS nearest
FROM scanned
WHERE is_probe = 1
""",
    tags=("asof", "window", "join"),
)
def q259_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-event join: for every purchase, the gap
    to the closest 'error' event before AND after it in the same
    user's stream, plus which side wins (ties → backward — q60's
    as-of convention). The whole join is ONE ordered window pass over
    the merged, pre-filtered stream (IGNORE NULLS carry-forward for
    the backward side, the mirrored forward frame for the other) —
    no self-join, no range join, one shuffle on user_id. An error
    event at the exact probe timestamp counts as backward with gap 0
    (it sorts before the probe only by event_id; the frame includes
    CURRENT ROW, matching the oracle exactly)."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t_us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_probe"),
        F.when(F.col("event_type") == "error", F.unix_micros(F.col("ts"))).alias("err_us"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t_us").asc(), F.col("event_id").asc())
    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    scanned = tagged.select(
        "user_id",
        "event_id",
        "t_us",
        "is_probe",
        F.last("err_us", ignorenulls=True).over(w_back).alias("back_us"),
        F.first("err_us", ignorenulls=True).over(w_fwd).alias("fwd_us"),
    )
    back_gap = F.col("t_us") - F.col("back_us")
    fwd_gap = F.col("fwd_us") - F.col("t_us")
    return scanned.filter(F.col("is_probe") == 1).select(
        "event_id",
        "user_id",
        back_gap.alias("back_gap_us"),
        fwd_gap.alias("fwd_gap_us"),
        F.when(F.col("back_us").isNull() & F.col("fwd_us").isNull(), "none")
        .when(F.col("fwd_us").isNull(), "backward")
        .when(F.col("back_us").isNull(), "forward")
        .when(back_gap <= fwd_gap, "backward")
        .otherwise("forward")
        .alias("nearest"),
    )


@register(
    "q314_point_in_time_features",
    # Native DuckDB ASOF against the embargoed lookup time; the
    # census aggregates per (feature type found, purchase hour) with
    # an exact integer gap sum in seconds.
    oracle="""
WITH labels AS (
  SELECT event_id, user_id, ts, ts - INTERVAL 30 MINUTE AS lts
  FROM events WHERE event_type = 'purchase'
),
feats AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type <> 'purchase'
),
joined AS (
  SELECT l.event_id, l.ts,
         r.event_type AS feat_type,
         CASE WHEN r.user_id IS NULL THEN NULL
              ELSE epoch_us(l.lts) // 1000000 - epoch_us(r.ts) // 1000000
         END AS gap_s
  FROM labels l
  ASOF LEFT JOIN feats r
    ON l.user_id = r.user_id AND l.lts >= r.ts
)
SELECT COALESCE(feat_type, 'none') AS feature_type,
       COUNT(*) AS n_labels,
       CAST(COALESCE(SUM(gap_s), 0) AS BIGINT) AS sum_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM joined
GROUP BY COALESCE(feat_type, 'none')
""",
    tags=("join", "asof", "feature_store", "leakage"),
)
def q314_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature lookup with an embargo — THE
    training-data leakage guard in feature-store pipelines: for every
    label event (purchase) join the user's latest feature event at or
    before label time MINUS a 30-minute embargo, so features that
    could only be known within the embargo window can never leak into
    training rows (the "time-travel join" of Feast/production feature
    stores). Census per feature type found: label count and exact
    integer gap statistics in seconds.

    Scale shape: the as-of resolves as ONE union + doc-keyed running
    window over user_id (asof_join helper — no join explosion, no
    range cross product); the census is bounded by the event-type
    grid. The embargo is applied to the LOOKUP time, not the feature
    filter, so correctness does not depend on feature-side
    pre-filtering."""
    e = load_table(spark, sf_dir, "events")
    labels = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("lts"),
    )
    feats = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("fts"),
        F.col("event_id").alias("feat_id"),
        F.col("event_type").alias("feat_type"),
    )
    joined = asof_join(
        labels,
        feats.withColumnRenamed("fts", "lts"),
        on="user_id",
        left_ts="lts",
        right_ts="lts",
        right_payload=["feat_id", "feat_type", "lts"],
        right_seq="feat_id",
    )
    gap_s = (
        F.unix_timestamp("lts") - F.unix_timestamp("asof_lts")
    ).cast("long")
    return (
        joined.select(
            F.coalesce(F.col("asof_feat_type"), F.lit("none")).alias("feature_type"),
            F.when(F.col("asof_feat_type").isNotNull(), gap_s).alias("gap_s"),
        )
        .groupBy("feature_type")
        .agg(
            F.count(F.lit(1)).alias("n_labels"),
            F.coalesce(F.sum("gap_s"), F.lit(0)).cast("long").alias("sum_gap_s"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
    )


@register(
    "q403_pandas_api_asof",
    oracle="""
WITH pur AS (
  SELECT user_id, ts, event_id
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT user_id AS e_user, ts AS e_ts
  FROM events WHERE event_type = 'error'
),
m AS (
  SELECT p.user_id, p.ts, e.e_ts
  FROM pur p
  ASOF LEFT JOIN err e
    ON p.user_id = e.e_user AND e.e_ts <= p.ts
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(e_ts) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(epoch_us(ts) - epoch_us(e_ts)), 0) AS BIGINT)
         AS gap_us_sum
FROM m GROUP BY user_id
""",
    tags=("asof", "pandas_api", "api_surface"),
)
def q403_pandas_api_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pyspark.pandas.merge_asof` — the PANDAS-ON-SPARK public API
    surface for as-of joins (SURVEY §2 named it alongside the
    union+window trick q60 implements by hand): each purchase picks
    the user's LATEST earlier-or-equal error, backward direction,
    grouped `by=user_id`. The point of grading it: pandas users get
    the pandas signature, but the work must still be a distributed
    Catalyst plan (pandas-on-Spark compiles merge_asof to a
    broadcast-range or union+window strategy — no driver
    materialization), and its semantics must agree bit-exactly with
    the union+window engine implementation AND DuckDB's native ASOF
    JOIN, which is what the exact per-user gap census proves. The
    ps frame converts back via to_spark() and the census aggregates
    distributed — the pandas API is a veneer, not a collect()."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        e = load_table(spark, sf_dir, "events")
        pur = (
            e.filter(F.col("event_type") == "purchase")
            .select("user_id", "ts", "event_id")
            .pandas_api()
        )
        err = (
            e.filter(F.col("event_type") == "error")
            .select(F.col("user_id"), F.col("ts").alias("e_ts"))
            .pandas_api()
        )
        m = ps.merge_asof(
            pur.sort_values("ts"),
            err.sort_values("e_ts"),
            left_on="ts",
            right_on="e_ts",
            by="user_id",
            direction="backward",
        ).to_spark()
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("e_ts"))
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("e_ts").alias("n_matched"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_sum"),
    )
