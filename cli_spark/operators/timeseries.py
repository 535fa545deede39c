"""Time-series relational operators — LOCF gap-fill, gaps-and-islands
streaks, interval union/coverage, deterministic mode, ratio-to-report.

These are the standard event-stream reshaping queries (observability,
sessions-adjacent analytics) that SQL engines express with ordered
windows. Scale notes:

* Every per-user pass here partitions one shuffle on ``user_id`` and
  stays inside that partitioning for the follow-up window/groupBy —
  Spark reuses the hash partitioning, so each query is ONE exchange of
  the (already-reduced) per-user stream regardless of corpus size.
* All arithmetic that crosses the oracle hash boundary is integer
  (epoch micros, day counts, quantized cents, ppm shares) — exact in
  both engines, order-independent, AQE-stable.
* The interval-merge sweep (q168) is the window formulation of the
  classic stabbing/coverage problem: running ``max(end)`` decides
  island starts without a self-join — O(n log n) sort vs the naive
  O(n²) overlap join, and the sort is per-user (bounded partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.functions.determinism import sql_quantize, quantize
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_T_US = "epoch_us(CAST(ts AS TIMESTAMP))"


@register(
    "q166_locf_forward_fill",
    oracle=f"""
WITH masked AS (
  SELECT event_id, user_id, {_T_US} AS t_us,
         CASE WHEN event_type <> 'view' THEN value END AS v
  FROM events
)
SELECT event_id, user_id,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       (v IS NULL) AS was_gap
FROM masked
""",
    tags=("timeseries", "window", "locf"),
)
def q166_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: sensor-style streams
    where some rows carry no reading ('view' events here) take the most
    recent non-null value per user (``last(..., ignorenulls=True)`` over
    an ordered frame ≡ DuckDB ``last_value(... IGNORE NULLS)``).
    Leading gaps stay NULL. Values pass through untouched (no float
    arithmetic), so the cross-engine hash is exact. One shuffle on
    user_id; the frame state is a single value per partition cursor."""
    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.when(F.col("event_type") != "view", F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "q167_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day ASC)
                    AS INTEGER) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS run_len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
""",
    tags=("timeseries", "islands", "window"),
)
def q167_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity runs per user via the
    classic ``day − row_number()`` island key (consecutive days share a
    constant anchor date). Events reduce to distinct (user, day) before
    any window — the shuffle carries at most users × days rows — and the
    two windows plus both groupBys share the user_id partitioning."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("day").asc())
    )
    isl = days.select("user_id", "day", F.date_sub(F.col("day"), rn).alias("island"))
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


@register(
    "q168_interval_coverage",
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, {_T_US} AS s, {_T_US} + 600000000 AS e
  FROM events
),
swept AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv
),
tagged AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
           AS new_island
  FROM swept
),
numbered AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM tagged
),
islands AS (
  SELECT user_id, island_id,
         max(e) - min(s) AS island_us, COUNT(*) AS n_iv
  FROM numbered GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
       COUNT(*) AS n_islands,
       CAST(SUM(island_us) AS BIGINT) AS covered_us,
       CAST(MAX(island_us) AS BIGINT) AS max_island_us
FROM islands GROUP BY user_id
""",
    tags=("timeseries", "intervals", "window"),
)
def q168_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping intervals (each event opens a 10-minute
    activity window): total covered time per user with touching/nested
    intervals merged. The sweep is the O(n log n) window formulation —
    an interval starts a new island iff its start exceeds the running
    ``max(end)`` of everything before it — replacing the O(n²)
    self-overlap-join. All epoch-microsecond integer arithmetic; one
    user_id shuffle shared by both windows and both groupBys."""
    e = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts"))
    iv = e.select(
        "user_id", "event_id", t.alias("s"), (t + F.lit(600000000)).alias("e")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = iv.select(
        "user_id", "s", "e", F.max("e").over(w_prev).alias("prev_max_e")
    )
    tagged = swept.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("s").asc(), F.col("e").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = tagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    islands = numbered.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).alias("island_us"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return islands.groupBy("user_id").agg(
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_us").cast("long").alias("covered_us"),
        F.max("island_us").cast("long").alias("max_island_us"),
    )


@register(
    "q169_modal_event_type",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS distinct_types
  FROM counts
)
SELECT user_id, event_type AS modal_type, n AS modal_n,
       CAST(distinct_types AS BIGINT) AS distinct_types
FROM ranked WHERE rk = 1
""",
    tags=("timeseries", "mode", "window"),
)
def q169_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent event_type per
    user, ties broken lexicographically. Built-in ``mode()`` returns an
    arbitrary tie winner in both engines, so the portable (and
    auditable) form is count → ``row_number() OVER (ORDER BY n DESC,
    key ASC)`` — the same per-group-top-K plan Spark executes for any
    argmax, with partial aggregation on the raw counts."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    wc = Window.partitionBy("user_id")
    ranked = counts.select(
        "user_id",
        "event_type",
        "n",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).cast("long").alias("distinct_types"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "user_id",
        F.col("event_type").alias("modal_type"),
        F.col("n").alias("modal_n"),
        "distinct_types",
    )


@register(
    "q170_revenue_share",
    oracle=f"""
WITH nat AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         CAST(SUM({sql_quantize('o.o_totalprice', 2)}) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name
)
SELECT nation, region, rev_cents,
       CAST(rev_cents * 1000000 // SUM(rev_cents) OVER (PARTITION BY region)
            AS BIGINT) AS region_share_ppm,
       CAST(rev_cents * 1000000 // SUM(rev_cents) OVER ()
            AS BIGINT) AS global_share_ppm
FROM nat
""",
    tags=("timeseries", "ratio", "window"),
)
def q170_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share of its region and
    of the world, as exact integer parts-per-million (cents × 1e6 //
    total — no float division crosses the hash). The fact table
    reduces to 25 nation rows BEFORE the share windows, so the window
    pass is driver-trivial at any scale; the joins are all
    broadcast-sized dims. Overflow headroom: cents·1e6 needs
    rev < 9.2e12 cents per slice — shard by region/day first at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(quantize(F.col("o_totalprice"), 2)).alias("rev_cents"))
    )
    return nat.select(
        "nation",
        "region",
        "rev_cents",
        F.expr(
            "CAST((rev_cents * CAST(1000000 AS BIGINT)) div "
            "SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)"
        ).alias("region_share_ppm"),
        F.expr(
            "CAST((rev_cents * CAST(1000000 AS BIGINT)) div "
            "SUM(rev_cents) OVER () AS BIGINT)"
        ).alias("global_share_ppm"),
    )


@register(
    "q188_linear_interpolation",
    oracle=f"""
WITH masked AS (
  SELECT event_id, user_id, {_T_US} AS t,
         CASE WHEN event_type <> 'view'
              THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END AS c
  FROM events
),
ctx AS (
  SELECT event_id, user_id, t, c,
         last_value(c IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
         last_value(CASE WHEN c IS NOT NULL THEN t END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         first_value(c IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t ASC, event_id ASC
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc,
         first_value(CASE WHEN c IS NOT NULL THEN t END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t ASC, event_id ASC
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM masked
)
SELECT event_id, user_id,
       CASE WHEN c IS NOT NULL THEN 'obs'
            WHEN pc IS NOT NULL AND nc IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS kind,
       CASE WHEN c IS NOT NULL THEN c
            WHEN pc IS NOT NULL AND nc IS NOT NULL
            THEN pc + (nc - pc) * (t - pt) // (nt - pt)
            END AS v_cents
FROM ctx
""",
    tags=("timeseries", "interpolate", "window"),
)
def q188_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of gap rows between their
    surrounding observations (the upgrade from q166's step-function
    LOCF): v = prev + (next − prev)·(t − t_prev) ÷ (t_next − t_prev),
    computed entirely in BIGINT cents/micros with floor division —
    bit-identical cross-engine, no float error accumulation. The
    before/after context comes from four IGNORE-NULLS frame scans over
    ONE user_id partitioning (Spark: last/first with ignorenulls over
    mirrored frames); rows keep their 'obs'/'interp'/'edge' lineage so
    downstream consumers can weight imputed points. Product bound:
    |Δcents|·Δt_us < 2^63 holds for spans under ~2 years at money
    scale."""
    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
        F.when(
            F.col("event_type") != "view",
            F.floor(F.col("value") * 100.0 + 0.5).cast("long"),
        ).alias("c"),
    )
    base = Window.partitionBy("user_id").orderBy(
        F.col("t").asc(), F.col("event_id").asc()
    )
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    t_obs = F.when(F.col("c").isNotNull(), F.col("t"))
    ctx = masked.select(
        "event_id",
        "user_id",
        "t",
        "c",
        F.last("c", ignorenulls=True).over(w_prev).alias("pc"),
        F.last(t_obs, ignorenulls=True).over(w_prev).alias("pt"),
        F.first("c", ignorenulls=True).over(w_next).alias("nc"),
        F.first(t_obs, ignorenulls=True).over(w_next).alias("nt"),
    )
    has_both = F.col("pc").isNotNull() & F.col("nc").isNotNull()
    return ctx.select(
        "event_id",
        "user_id",
        F.when(F.col("c").isNotNull(), F.lit("obs"))
        .when(has_both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("kind"),
        F.when(F.col("c").isNotNull(), F.col("c"))
        .when(
            has_both,
            F.col("pc")
            + F.expr("(nc - pc) * (t - pt) div (nt - pt)"),
        )
        .alias("v_cents"),
    )


@register(
    "q209_event_transitions",
    oracle=f"""
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY {_T_US} ASC, event_id ASC) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS row_total
  FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n_trans,
       CAST(t.n_trans * 1000000 // o.row_total AS BIGINT) AS p_ppm,
       t.from_type = t.to_type AS self_loop
FROM trans t JOIN tot o ON t.from_type = o.from_type
""",
    tags=("timeseries", "markov", "transitions"),
)
def q209_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams:
    P(next event type | current event type) as integer ppm, with each
    user's stream ordered by (ts, event_id) and transitions never
    crossing users — the behavioral model behind next-action
    prediction, funnel leak analysis, and bot detection (bots show
    degenerate near-1e6 self-loops).

    Scale shape: ONE shuffle on user_id for the lead() window over
    the raw stream, then a map-side combined groupBy to at most
    |types|² cells; row totals re-aggregate the cells and join back
    on the tiny matrix. The per-user window state is one row."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("row_total")
    )
    return trans.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr("n_trans * 1000000 div row_total").cast("long").alias("p_ppm"),
        (F.col("from_type") == F.col("to_type")).alias("self_loop"),
    )


@register(
    "q210_cusum_changepoint",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM hourly GROUP BY event_type
),
dev AS (
  SELECT h.event_type, h.hour_us, h.c,
         h.c * s.n_hours - s.total AS d,
         s.n_hours, s.total
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
),
cusum AS (
  SELECT event_type, hour_us, n_hours, total,
         SUM(d) OVER (PARTITION BY event_type ORDER BY hour_us ASC
                      ROWS UNBOUNDED PRECEDING) AS cu
  FROM dev
),
ranked AS (
  SELECT event_type, hour_us, cu, n_hours, total,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cu) DESC, hour_us ASC) AS rnk
  FROM cusum
)
SELECT event_type, n_hours, total AS total_events,
       hour_us AS changepoint_hour_us,
       CAST(cu AS BIGINT) AS max_abs_cusum_scaled
FROM ranked WHERE rnk = 1
""",
    tags=("timeseries", "changepoint", "cusum"),
)
def q210_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954) per event type: the
    hour where the cumulative deviation of hourly event counts from
    the type's mean rate peaks — the classic split point for "when
    did the rate change". All-integer formulation: deviation is
    c·n_hours − total (summing to 0 over the series, no division),
    so the cumulative sum and its argmax are exact in both engines.
    Hours with zero events don't appear in the series (documented;
    a spine join would zero-fill them).

    Scale shape: raw events collapse to (type, hour) counts with
    map-side combine FIRST; every later step (stats join, running
    sum, argmax window) runs on the tiny hourly relation partitioned
    by event_type."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        )
        .groupBy("event_type", "hour_us")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    dev = hourly.join(stats, "event_type").select(
        "event_type",
        "hour_us",
        "n_hours",
        "total",
        (F.col("c") * F.col("n_hours") - F.col("total")).alias("d"),
    )
    cu_w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour_us").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = dev.select(
        "event_type", "hour_us", "n_hours", "total",
        F.sum("d").over(cu_w).alias("cu"),
    )
    rnk_w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cu")).desc(), F.col("hour_us").asc()
    )
    return (
        cusum.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            "n_hours",
            F.col("total").alias("total_events"),
            F.col("hour_us").alias("changepoint_hour_us"),
            F.col("cu").cast("long").alias("max_abs_cusum_scaled"),
        )
    )


@register(
    "q215_missing_hours",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY event_type
),
spine AS (
  SELECT b.event_type, s.h AS hr
  FROM bounds b, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS s(h)
)
SELECT sp.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_spine_hours,
       CAST(SUM(CASE WHEN h.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(SUM(CASE WHEN h.c IS NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS missing_ppm,
       strftime(MIN(CASE WHEN h.c IS NULL THEN sp.hr END),
                '%Y-%m-%d %H:%M:%S') AS first_missing_hour
FROM spine sp LEFT JOIN hourly h
  ON sp.event_type = h.event_type AND sp.hr = h.hr
GROUP BY sp.event_type
""",
    tags=("timeseries", "spine", "gaps"),
)
def q215_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-hour detection via a generated calendar spine — the
    completeness check q210's CUSUM documents as its blind spot:
    per event type, generate every hour between the type's first and
    last event (sequence + explode), anti-match against the observed
    hourly census, and report gap counts plus the first silent hour
    (the "when did the feed stop" query of every ingestion monitor).

    Scale shape: the spine is generated from the BOUNDS relation
    (|types| rows → |types| × hours spine rows — never from raw
    events), the observed side is the map-side combined hourly
    census, and the left join keys on (type, hour). Raw event volume
    only affects the first census aggregation."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_spine_hours"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
        F.expr(
            "sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) * 1000000 div count(1)"
        ).cast("long").alias("missing_ppm"),
        F.date_format(
            F.min(F.when(F.col("c").isNull(), F.col("hr"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_missing_hour"),
    )


@register(
    "q224_rate_burst_flags",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour_us, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY hour_us ASC
                      ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS trail_sum,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_us ASC
                        ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS trail_n
  FROM hourly
)
SELECT event_type, hour_us, c,
       CAST(COALESCE(trail_sum, 0) AS BIGINT) AS trail_sum,
       CAST(trail_n AS BIGINT) AS trail_n,
       trail_n = 6 AND c * 6 > 3 * trail_sum AS burst
FROM scored
""",
    tags=("timeseries", "burst", "window"),
)
def q224_rate_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: an hour is a burst when its event count
    exceeds 3× the trailing 6-hour average (integer cross-multiplied
    — c·6 > 3·Σtrail — so no division) with a FULL trailing window
    (warm-up hours can't alarm). The streaming-monitor complement to
    q210's offline change-point: CUSUM finds the one structural
    break, this flags every transient spike.

    Scale shape: raw events collapse to the hourly census first; the
    trailing frame runs per event_type over the tiny census. The
    window state is 6 rows per partition cursor."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        )
        .groupBy("event_type", "hour_us")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    trail = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour_us").asc())
        .rowsBetween(-6, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_us",
        "c",
        F.sum("c").over(trail).alias("trail_sum0"),
        F.count(F.lit(1)).over(trail).alias("trail_n"),
    )
    return scored.select(
        "event_type",
        "hour_us",
        "c",
        F.coalesce("trail_sum0", F.lit(0)).cast("long").alias("trail_sum"),
        F.col("trail_n").cast("long").alias("trail_n"),
        ((F.col("trail_n") == 6) & (F.col("c") * 6 > 3 * F.col("trail_sum0"))).alias(
            "burst"
        ),
    )


@register(
    "q229_session_paths",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, {_T_US} AS t_us, event_id,
         CASE WHEN {_T_US} - lag({_T_US}) OVER (PARTITION BY user_id
                ORDER BY {_T_US} ASC, event_id ASC) > 1800000000
              OR lag({_T_US}) OVER (PARTITION BY user_id
                ORDER BY {_T_US} ASC, event_id ASC) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_type, t_us, event_id,
         SUM(new_session) OVER (PARTITION BY user_id
           ORDER BY t_us ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
),
paths AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM sessions
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY t_us ASC, event_id ASC)
),
census AS (
  SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM paths WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY e1, e2, e3
)
SELECT e1, e2, e3, n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, e1, e2, e3) AS BIGINT) AS rnk
FROM census
ORDER BY rnk LIMIT 15
""",
    tags=("timeseries", "paths", "sessions"),
)
def q229_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type TRIGRAM paths within 30-minute sessions — the
    order-2 extension of q209's Markov matrix and the raw material of
    funnel discovery ("what do users actually do in a sitting"):
    sessionize by inactivity gap (lag + running sum of boundaries,
    the q102 pattern), slide a 3-step lead window that never crosses
    a session boundary, and TakeOrder the 15 most common paths.

    Scale shape: ONE shuffle on user_id feeds both the
    sessionization windows and the per-(user, session) path windows
    (same partitioning, Spark reuses the exchange); the path census
    collapses to |types|³ cells with map-side combine."""
    e = load_table(spark, sf_dir, "events")
    base_w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    ordered = e.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t_us"), "event_id"
    ).withColumn(
        "new_session",
        F.when(
            F.lag("t_us").over(base_w).isNull()
            | ((F.col("t_us") - F.lag("t_us").over(base_w)) > 1800000000),
            1,
        ).otherwise(0),
    )
    sessions = ordered.withColumn(
        "session_id",
        F.sum("new_session").over(base_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    path_w = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("t_us").asc(), F.col("event_id").asc()
    )
    paths = sessions.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(path_w).alias("e2"),
        F.lead("event_type", 2).over(path_w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    census = paths.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    rnk_w = Window.orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
    return (
        census.withColumn("rnk", F.row_number().over(rnk_w).cast("long"))
        .orderBy("rnk")
        .limit(15)
    )


@register(
    "q230_concurrent_intervals",
    oracle="""
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 30 AS e
  FROM orders
),
deltas AS (
  SELECT s AS day, 1 AS d FROM iv
  UNION ALL
  SELECT e AS day, -1 AS d FROM iv
),
net AS (
  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM deltas GROUP BY day
),
running AS (
  SELECT day, delta,
         CAST(SUM(delta) OVER (ORDER BY day ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS n_open
  FROM net
),
ranked AS (
  SELECT day, n_open,
         row_number() OVER (ORDER BY n_open DESC, day ASC) AS rnk
  FROM running
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_open, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10
""",
    tags=("timeseries", "intervals", "sweep"),
)
def q230_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep: treating each order as a 30-day open
    interval, find the 10 days with the most simultaneously-open
    orders — the classic "max concurrent sessions / open tickets /
    room occupancy" question, solved with the +1/−1 delta sweep
    (two projections + a running sum over the day spine) instead of
    a quadratic day×interval containment join.

    Scale shape: the fact table projects to (day, ±1) deltas that
    collapse to the day-spine cardinality with map-side combine; the
    running sum and top-K ride the tiny spine. Interval count never
    touches the window."""
    o = load_table(spark, sf_dir, "orders")
    starts = o.select(F.to_date("o_orderdate").alias("day"), F.lit(1).alias("d"))
    ends = o.select(
        F.date_add(F.to_date("o_orderdate"), 30).alias("day"), F.lit(-1).alias("d")
    )
    net = starts.union(ends).groupBy("day").agg(
        F.sum("d").cast("long").alias("delta")
    )
    run_w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = net.select(
        "day", F.sum("delta").over(run_w).cast("long").alias("n_open")
    )
    rnk_w = Window.orderBy(F.col("n_open").desc(), F.col("day").asc())
    return (
        running.withColumn("rnk", F.row_number().over(rnk_w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "n_open", "rnk"
        )
    )


@register(
    "q443_event_disorder_audit",
    oracle=f"""
WITH d AS (
  SELECT event_type, event_id,
         MAX({_T_US}) OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)) ASC, event_id ASC
           ROWS UNBOUNDED PRECEDING) - {_T_US} AS dis
  FROM events
),
late AS (
  SELECT event_type, dis,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dis ASC, event_id ASC) AS rn
  FROM d WHERE dis > 0
),
nl AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_late FROM late
  GROUP BY event_type
),
pct AS (
  SELECT l.event_type,
         MIN(CASE WHEN l.rn = (nl.n_late + 1) // 2
                  THEN l.dis END) AS p50_us,
         MIN(CASE WHEN l.rn = (99 * nl.n_late + 99) // 100
                  THEN l.dis END) AS p99_us
  FROM late l JOIN nl ON l.event_type = nl.event_type
  GROUP BY l.event_type
),
base AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN dis > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
         CAST(MAX(dis) // 1000000 AS BIGINT) AS max_disorder_s
  FROM d GROUP BY event_type
)
SELECT b.event_type, b.n_events, b.n_late,
       CAST(b.n_late * 1000000 // b.n_events AS BIGINT) AS late_ppm,
       b.max_disorder_s,
       CAST(p.p50_us // 1000000 AS BIGINT) AS p50_late_s,
       CAST(p.p99_us // 1000000 AS BIGINT) AS p99_late_s
FROM base b LEFT JOIN pct p ON b.event_type = p.event_type
""",
    tags=("timeseries", "streaming", "watermark", "disorder", "audit"),
)
def q443_event_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time DISORDER census — the watermark-planning tool: how
    late does data actually arrive, per stream? Arrival order is the
    adversarial md5 permutation of event_id (the same simulated
    network reordering the graded watermark late-drop query replays
    through its streaming source), disorder(e) = running-max event
    time at e's arrival minus e's own event time. Per event type:
    late share and the rank-located (percentile_disc-style,
    integer-only positions) p50/p99 disorder in whole seconds — p99
    IS the `withWatermark` delay you would configure, and max shows
    the tail a watermark that tight would drop. One
    type-partitioned window over arrival order, one census — no
    self-joins, the same plan at any event volume (watermark
    planning at 100 TB is exactly this query over a day of Kafka
    offsets). Fully-ordered streams are REPORTED (n_late = 0, NULL
    percentiles — they need no watermark delay), not dropped. Ties in
    the md5 order break on event_id so both engines walk identical
    arrival sequences."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    arr = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")).asc(),
        F.col("event_id").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = ev.select(
        "event_type", "event_id",
        (F.max(t_us).over(arr) - t_us).alias("dis"),
    )
    late = d.filter(F.col("dis") > 0).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type")
            .orderBy(F.col("dis").asc(), F.col("event_id").asc())
        ),
    )
    nl = late.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_late"))
    pct = (
        late.join(nl, "event_type")
        .groupBy("event_type")
        .agg(
            F.min(F.when(
                F.col("rn") == F.expr("(n_late + 1) DIV 2"),
                F.col("dis"))).alias("p50_us"),
            F.min(F.when(
                F.col("rn") == F.expr("(99 * n_late + 99) DIV 100"),
                F.col("dis"))).alias("p99_us"),
        )
    )
    base = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("dis") > 0, 1).otherwise(0)).cast("long")
        .alias("n_late"),
        F.expr("CAST(MAX(dis) DIV 1000000 AS BIGINT)")
        .alias("max_disorder_s"),
    )
    # LEFT join (ADVICE r10): a fully-ordered stream — one needing no
    # watermark delay at all — appears with n_late = 0 and NULL
    # percentiles instead of vanishing from the census.
    return base.join(pct, "event_type", "left").select(
        "event_type", "n_events", "n_late",
        F.expr("CAST(n_late * 1000000 DIV n_events AS BIGINT)")
        .alias("late_ppm"),
        "max_disorder_s",
        F.expr("CAST(p50_us DIV 1000000 AS BIGINT)").alias("p50_late_s"),
        F.expr("CAST(p99_us DIV 1000000 AS BIGINT)").alias("p99_late_s"),
    )
