"""Event-analytics operators: growth accounting and cohort retention —
the two query shapes every product/events pipeline runs daily.

Scale notes:
* A running COUNT(DISTINCT) is not windowable at scale (per-row state
  is the whole user set). The standard rewrite: reduce events to each
  user's FIRST day (one shuffle on user_id — the distinct-key set,
  not the event volume), then a cumulative sum over the tiny per-day
  new-user counts. q128 is that rewrite, exact.
* Cohort retention is first-touch assignment + a (cohort × period)
  census: again one shuffle on user_id to find first weeks, then a
  broadcast-joinable re-join against events reduced to distinct
  (user, week). Event payloads never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q128_growth_accounting",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT first_day, COUNT(*) AS new_users FROM firsts GROUP BY first_day
)
SELECT CAST(first_day AS STRING) AS day,
       new_users,
       CAST(SUM(new_users) OVER (ORDER BY first_day ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM per_day
""",
    tags=("analytics", "growth", "window"),
)
def q128_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day, computed as first-seen-day
    reduction + running sum — the scalable rewrite of a running
    COUNT(DISTINCT) (whose window state would be the entire user set).
    Shuffles only user_ids and then day-level counts."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    per_day = firsts.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy(F.col("first_day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "q129_cohort_retention",
    oracle="""
WITH weeks AS (
  SELECT DISTINCT user_id,
         CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '2024-01-01') // 7
              AS INTEGER) AS week_no
  FROM events
),
cohorts AS (
  SELECT user_id, min(week_no) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week,
       w.week_no - c.cohort_week AS weeks_since,
       COUNT(*) AS active_users
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, w.week_no - c.cohort_week
""",
    tags=("analytics", "cohort", "retention"),
)
def q129_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by their first
    active week, counted in every subsequent week they return. Week
    numbering is an absolute diff from a fixed Monday anchor so both
    engines bucket identically (never engine week-of-year, whose
    ISO/locale rules differ). Events reduce to distinct (user, week)
    before any join — the fact table's volume is gone by the time
    anything shuffles twice."""
    e = load_table(spark, sf_dir, "events")
    week_no = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))) / 7
    ).cast("int")
    weeks = e.select("user_id", week_no.alias("week_no")).distinct()
    cohorts = weeks.groupBy("user_id").agg(F.min("week_no").alias("cohort_week"))
    return (
        weeks.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week_no") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "q149_funnel_steps",
    oracle="""
WITH v AS (
  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS step_view,
       (SELECT COUNT(*) FROM c) AS step_click_after_view,
       (SELECT COUNT(*) FROM p) AS step_purchase_after_click
""",
    tags=("analytics", "funnel", "sequential"),
)
def q149_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each step counts
    users whose FIRST qualifying event strictly follows their entry
    into the previous step — the sequential-pattern query engines
    with MATCH_RECOGNIZE express natively, here as cascaded
    first-event reductions. Each stage is one aggregation on user_id
    (the same shuffle key throughout, so Spark reuses the
    partitioning), and event payloads reduce to (user, min_ts) before
    every join."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))

    def first_after(etype: str, prev: DataFrame | None, prev_col: str, out: str) -> DataFrame:
        s = e.filter(F.col("event_type") == etype).select(
            "user_id", t_us.alias("t")
        )
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("t") > F.col(prev_col))
        return s.groupBy("user_id").agg(F.min("t").alias(out))

    v = first_after("view", None, "", "t_view")
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")
    return (
        v.agg(F.count(F.lit(1)).alias("step_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("step_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("step_purchase_after_click")))
    )


@register(
    "q195_last_touch_attribution",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS touch_event,
         last_value(CASE WHEN event_type = 'click'
                         THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
           OVER w AS touch_t
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS purchase_event, t_us AS purchase_t,
       touch_event, touch_t,
       (t_us - touch_t) // 1000000 AS latency_s
FROM seq
WHERE event_type = 'purchase' AND touch_t IS NOT NULL
  AND t_us - touch_t <= CAST(7 AS BIGINT) * 86400 * 1000000
""",
    tags=("analytics", "attribution", "window"),
)
def q195_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase attributes to the user's
    most recent PRIOR click within a 7-day lookback — the conversion
    query every ads/analytics stack runs, expressed as one
    IGNORE-NULLS last_value over a trailing frame (no self-join).

    Scale shape: one shuffle on user_id; the window carries two
    narrow conditional columns. The naive alternative (purchases
    ASOF-joined against clicks) shuffles both event subsets — this
    form shuffles the stream once and filters in place."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(t_us.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_t = F.when(F.col("event_type") == "click", t_us)
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        t_us.alias("t_us"),
        F.last(click_id, ignorenulls=True).over(w).alias("touch_event"),
        F.last(click_t, ignorenulls=True).over(w).alias("touch_t"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_t").isNotNull()
            & (F.col("t_us") - F.col("touch_t") <= 7 * 86400 * 1000000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event"),
            F.col("t_us").alias("purchase_t"),
            "touch_event",
            "touch_t",
            # integer division on BOTH sides: DuckDB's CAST(x/1e6 AS
            # BIGINT) rounds while Spark's cast truncates — `div` and
            # `//` both floor on the positive deltas here
            F.expr("(t_us - touch_t) div 1000000").alias("latency_s"),
        )
    )


@register(
    "q226_rfm_segmentation",
    oracle="""
WITH anchor AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS max_day FROM orders
),
per_cust AS (
  SELECT o.o_custkey AS custkey,
         CAST(a.max_day - MAX(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders o CROSS JOIN anchor a
  GROUP BY o.o_custkey, a.max_day
)
SELECT custkey, recency_days, frequency, monetary_cents,
       CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_quintile,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_quintile,
       CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, custkey ASC) AS BIGINT) AS m_quintile,
       CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC) * 100
            + ntile(5) OVER (ORDER BY frequency DESC, custkey ASC) * 10
            + ntile(5) OVER (ORDER BY monetary_cents DESC, custkey ASC) AS BIGINT)
         AS rfm_code
FROM per_cust
""",
    tags=("analytics", "rfm", "window"),
)
def q226_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-analytics
    triple: days since last order (vs the corpus max date, so the
    query is reproducible), order count, and lifetime spend in exact
    integer cents, each cut into quintiles (NTILE(5) with custkey
    tie-breaks so both engines bucket identically) and combined into
    the 3-digit RFM code.

    Scale shape: one groupBy(custkey) over orders (map-side
    combined), then three global NTILE windows over the
    customer-sized relation — at 100 TB the quintile boundaries
    would come from approx percentiles instead of a global sort, but
    the per-customer aggregate shape is identical."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("max_day"))
    per_cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("custkey"), "max_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
            F.max(F.to_date("o_orderdate")).alias("last_day"),
        )
        .select(
            "custkey",
            F.datediff("max_day", "last_day").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("custkey").asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("custkey").asc())
    m_w = Window.orderBy(F.col("monetary_cents").desc(), F.col("custkey").asc())
    out = per_cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(r_w).cast("long").alias("r_quintile"),
        F.ntile(5).over(f_w).cast("long").alias("f_quintile"),
        F.ntile(5).over(m_w).cast("long").alias("m_quintile"),
    )
    return out.withColumn(
        "rfm_code",
        (F.col("r_quintile") * 100 + F.col("f_quintile") * 10 + F.col("m_quintile"))
        .cast("long"),
    )


@register(
    "q228_hierarchical_shares",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
region_tot AS (
  SELECT region, CAST(SUM(rev_cents) AS BIGINT) AS region_cents FROM rev GROUP BY region
),
grand AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM rev)
SELECT v.region, v.nation, v.rev_cents,
       CAST(v.rev_cents * 1000000 // rt.region_cents AS BIGINT) AS share_of_region_ppm,
       CAST(rt.region_cents * 1000000 // g.total_cents AS BIGINT) AS region_share_ppm,
       CAST(v.rev_cents * 1000000 // g.total_cents AS BIGINT) AS share_of_total_ppm
FROM rev v
JOIN region_tot rt ON v.region = rt.region
CROSS JOIN grand g
""",
    tags=("analytics", "hierarchy", "shares"),
)
def q228_hierarchical_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent hierarchical rollup (region → nation): each
    nation's revenue share of its region AND of the grand total, in
    exact integer cents/ppm — the percent-of-parent drilldown every
    OLAP frontend issues, expressed without GROUPING SETS by
    re-aggregating the leaf relation (q21's rollup gives the levels;
    this gives the RATIOS between them).

    Scale shape: one fact aggregation to the (region, nation) leaf
    grain with all three dims broadcast; parent and grand totals
    re-aggregate the leaf relation (never a second fact scan)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    region_tot = rev.groupBy("region").agg(
        F.sum("rev_cents").cast("long").alias("region_cents")
    )
    grand = rev.agg(F.sum("rev_cents").cast("long").alias("total_cents"))
    return (
        rev.join(region_tot, "region")
        .crossJoin(F.broadcast(grand))
        .select(
            "region",
            "nation",
            "rev_cents",
            F.expr("rev_cents * 1000000 div region_cents").cast("long")
            .alias("share_of_region_ppm"),
            F.expr("region_cents * 1000000 div total_cents").cast("long")
            .alias("region_share_ppm"),
            F.expr("rev_cents * 1000000 div total_cents").cast("long")
            .alias("share_of_total_ppm"),
        )
    )


@register(
    "q255_user_feature_vector",
    oracle="""
WITH ref AS (
  SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS ref_us FROM events
)
SELECT e.user_id,
       CAST((r.ref_us - MAX(epoch_us(CAST(e.ts AS TIMESTAMP)))) // 86400000000
            AS BIGINT) AS days_since_last,
       COUNT(*) AS n_events_all,
       CAST(SUM(CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP))
                          > r.ref_us - 7 * 86400000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_events_7d,
       CAST(SUM(CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP))
                          > r.ref_us - 30 * 86400000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_events_30d,
       CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS purchase_ppm,
       COUNT(DISTINCT e.event_type) AS n_types,
       CAST(SUM(CASE WHEN e.event_type = 'purchase'
                     THEN CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS purchase_cents
FROM events e CROSS JOIN ref r
GROUP BY e.user_id, r.ref_us
""",
    tags=("analytics", "features", "ml"),
)
def q255_user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ML feature assembly as of the corpus watermark:
    recency (days since last event), trailing 7-/30-day activity
    counts, purchase propensity in ppm, type diversity, and lifetime
    purchase cents — the feature-engineering pass a churn/LTV model
    trains on, computed in ONE scan. The reference timestamp is a
    1-row broadcast (cross join), every window is a conditional
    aggregate rather than a time-window self-join, and all outputs
    are exact integers. Shuffle: one exchange on user_id with
    map-side partial aggregation."""
    e = load_table(spark, sf_dir, "events")
    ref = e.agg(F.max(F.unix_micros(F.col("ts"))).alias("ref_us"))
    t_us = F.unix_micros(F.col("ts"))
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
    is_p = F.col("event_type") == "purchase"
    return (
        e.crossJoin(F.broadcast(ref))
        .groupBy("user_id", "ref_us")
        .agg(
            F.max(t_us).alias("_last_us"),
            F.count(F.lit(1)).alias("n_events_all"),
            F.sum(F.when(t_us > F.col("ref_us") - 7 * 86400000000, 1).otherwise(0))
            .alias("n_events_7d"),
            F.sum(F.when(t_us > F.col("ref_us") - 30 * 86400000000, 1).otherwise(0))
            .alias("n_events_30d"),
            F.sum(F.when(is_p, 1).otherwise(0)).alias("_n_purch"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.when(is_p, cents).otherwise(0)).alias("purchase_cents"),
        )
        .select(
            "user_id",
            F.expr("(ref_us - _last_us) div 86400000000").alias("days_since_last"),
            "n_events_all",
            "n_events_7d",
            "n_events_30d",
            F.expr("_n_purch * 1000000 div n_events_all").alias("purchase_ppm"),
            "n_types",
            "purchase_cents",
        )
    )


@register(
    "q273_ab_proportion_test",
    oracle="""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
),
arms AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(conv) AS BIGINT) AS conversions
  FROM flagged GROUP BY arm
),
wide AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
         MAX(CASE WHEN arm = 'A' THEN conversions END) AS c_a,
         MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
         MAX(CASE WHEN arm = 'B' THEN conversions END) AS c_b
  FROM arms
)
SELECT n_a, c_a, n_b, c_b,
       CAST(c_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
       CAST(c_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
       CAST(floor((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000000.0
            / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
            AS BIGINT) AS z_micro
FROM wide
""",
    tags=("analytics", "abtest", "stats"),
)
def q273_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between experiment arms (deterministic
    parity split on user_id): per-arm event counts and purchase
    conversions, rates in ppm, and the pooled-variance z statistic
    ×1e6 — the A/B-test readout, computed from one census pass. The
    z expression is written as the IDENTICAL IEEE double chain in
    both engines (every operand an exact int→double cast, pooled rate
    computed once per operand position), so floor(z·1e6) matches
    bit-for-bit. Everything before it is exact integer arithmetic."""
    e = load_table(spark, sf_dir, "events")
    flagged = e.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    arms = flagged.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("conversions")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conversions"))).alias("c_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conversions"))).alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = F.floor(
        (
            F.col("c_a").cast("double") / F.col("n_a").cast("double")
            - F.col("c_b").cast("double") / F.col("n_b").cast("double")
        )
        * F.lit(1000000.0)
        / F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / F.col("n_a").cast("double") + F.lit(1.0) / F.col("n_b").cast("double"))
        )
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.expr("c_a * 1000000 div n_a").alias("rate_a_ppm"),
        F.expr("c_b * 1000000 div n_b").alias("rate_b_ppm"),
        z.cast("long").alias("z_micro"),
    )


@register(
    "q281_bot_regularity",
    oracle="""
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_us
  FROM events
),
gaps AS (
  SELECT user_id, (ts_us - prev_us) // 60000000 AS gap_m
  FROM seq WHERE prev_us IS NOT NULL
),
per_user AS (
  SELECT user_id,
         COUNT(*) AS n_gaps,
         CAST(SUM(gap_m) AS BIGINT) AS sum_m,
         CAST(SUM(gap_m * gap_m) AS BIGINT) AS sumsq_m
  FROM gaps GROUP BY user_id
)
SELECT user_id, n_gaps,
       sum_m // n_gaps AS mean_gap_m,
       CASE WHEN sum_m = 0 THEN NULL
            ELSE n_gaps * sumsq_m * 1000 // (sum_m * sum_m) - 1000 END
         AS disp_pml,
       CASE WHEN n_gaps >= 20 AND sum_m > 0
                 AND n_gaps * sumsq_m * 1000 // (sum_m * sum_m) - 1000 < 50
            THEN 1 ELSE 0 END AS is_bot
FROM per_user
WHERE n_gaps >= 10
""",
    tags=("analytics", "behavioral", "anomaly"),
)
def q281_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness from inter-arrival regularity: per user, the
    squared coefficient of variation of event gaps (minutes), as the
    exact integer dispersion per-mille ``n·Σx²·1000 div (Σx)² − 1000``
    — organic humans are bursty (high dispersion), scripted clients
    are metronomic (near 0). One lag window per user plus a moment
    rollup; gaps are floor-divided to integer minutes so every term is
    overflow-safe BIGINT arithmetic identical in both engines (ties
    inside the lag ordering broken on event_id). Users with < 10 gaps
    are suppressed; the bot verdict needs ≥ 20 gaps, nonzero total
    time, and dispersion < 5%."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    gaps = seq.filter(F.col("prev_us").isNotNull()).select(
        "user_id", F.expr("(ts_us - prev_us) div 60000000").alias("gap_m")
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_m").alias("sum_m"),
        F.sum(F.col("gap_m") * F.col("gap_m")).alias("sumsq_m"),
    )
    disp = F.expr("n_gaps * sumsq_m * 1000 div (sum_m * sum_m) - 1000")
    return per_user.filter(F.col("n_gaps") >= 10).select(
        "user_id",
        "n_gaps",
        F.expr("sum_m div n_gaps").alias("mean_gap_m"),
        F.when(F.col("sum_m") == 0, F.lit(None).cast("long"))
        .otherwise(disp)
        .alias("disp_pml"),
        F.when(
            (F.col("n_gaps") >= 20) & (F.col("sum_m") > 0) & (disp < 50),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_bot"),
    )


@register(
    "q295_event_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_funnels,
       CAST(len(regexp_extract_all(s, 've')) AS BIGINT) AS n_abandons,
       CAST(length(s) AS BIGINT) AS seq_len
FROM seq
""",
    tags=("analytics", "cep", "pattern"),
)
def q295_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex event processing without the
    clause (Spark has none): each user's event stream becomes an
    ordered initial-letter string — one grouped aggregation with an
    order-stabilized struct sort, the q28 idiom — and sequence
    patterns run as regexes over it: `vc*p` (view, any clicks, then
    purchase — the conversion funnel with noise tolerance) and `ve`
    (view straight into error — the abandonment signature). Both
    engines scan leftmost-non-overlapping with greedy star, verified
    equivalent. Per-user strings are bounded by per-user activity, so
    the pattern stage is a scan-stage projection; the only shuffle is
    the per-user collect."""
    e = load_table(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("i"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("rec")), lambda x: x["c"]
                ),
                "",
            ).alias("s"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.expr("regexp_count(s, 'vc*p')").cast("long").alias("n_funnels"),
        F.expr("regexp_count(s, 've')").cast("long").alias("n_abandons"),
        F.length("s").cast("long").alias("seq_len"),
    )


@register(
    "q298_cohort_ltv_matrix",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS m,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
firsts AS (SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey),
joined AS (
  SELECT f.cohort_m, o.m - f.cohort_m AS offset_m, o.o_custkey, o.cents
  FROM o JOIN firsts f ON o.o_custkey = f.o_custkey
  WHERE o.m - f.cohort_m <= 11
),
cells AS (
  SELECT cohort_m, offset_m,
         COUNT(DISTINCT o_custkey) AS active_customers,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM joined GROUP BY cohort_m, offset_m
),
sized AS (
  SELECT f.cohort_m, COUNT(*) AS cohort_size FROM firsts f GROUP BY f.cohort_m
)
SELECT c.cohort_m, c.offset_m, s.cohort_size, c.active_customers,
       c.revenue_cents,
       CAST(SUM(c.revenue_cents) OVER (
         PARTITION BY c.cohort_m ORDER BY c.offset_m
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents,
       CAST(SUM(c.revenue_cents) OVER (
         PARTITION BY c.cohort_m ORDER BY c.offset_m
         ROWS UNBOUNDED PRECEDING) AS BIGINT) // s.cohort_size
         AS ltv_cents_per_customer
FROM cells c JOIN sized s ON c.cohort_m = s.cohort_m
""",
    tags=("analytics", "cohort", "ltv"),
)
def q298_cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix — q129's retention grid with the
    MONETARY dimension: customers cohorted by first-order month
    (integer month index, no date arithmetic ambiguity), revenue in
    exact cents per (cohort, months-since-first) cell for the first
    12 months, cumulated per cohort into LTV-per-customer — the
    payback-curve table subscription analytics runs nightly.

    Two shuffles: the first-order census (map-side combined) and the
    cohort join + cell rollup on the customer key; the cumulative
    window runs over ≤ 12 rows per cohort. Integer month index
    year·12+month−1 is identical in both engines; cents stay exact
    BIGINT end-to-end."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    joined = (
        o.join(firsts, "o_custkey")
        .withColumn("offset_m", F.col("m") - F.col("cohort_m"))
        .filter(F.col("offset_m") <= 11)
    )
    cells = joined.groupBy("cohort_m", "offset_m").agg(
        F.countDistinct("o_custkey").alias("active_customers"),
        F.sum("cents").alias("revenue_cents"),
    )
    sized = firsts.groupBy("cohort_m").agg(F.count(F.lit(1)).alias("cohort_size"))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("cohort_m")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(sized, "cohort_m")
        .withColumn("cum_revenue_cents", F.sum("revenue_cents").over(w))
        .select(
            "cohort_m",
            "offset_m",
            "cohort_size",
            "active_customers",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr("cum_revenue_cents div cohort_size").alias(
                "ltv_cents_per_customer"
            ),
        )
    )


@register(
    "q304_leadtime_quantiles",
    oracle="""
WITH lt AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
census AS (
  SELECT priority, lead_days, COUNT(*) AS c FROM lt GROUP BY priority, lead_days
),
cum AS (
  SELECT priority, lead_days, c,
         SUM(c) OVER (PARTITION BY priority ORDER BY lead_days
                      ROWS UNBOUNDED PRECEDING) AS cc,
         SUM(c) OVER (PARTITION BY priority) AS n
  FROM census
)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN cc * 2 >= n THEN lead_days END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cc * 10 >= n * 9 THEN lead_days END) AS BIGINT) AS p90_days,
       CAST(MIN(CASE WHEN cc * 100 >= n * 99 THEN lead_days END) AS BIGINT) AS p99_days,
       CAST(MAX(lead_days) AS BIGINT) AS max_days
FROM cum GROUP BY priority
""",
    tags=("analytics", "quantiles", "supply-chain"),
)
def q304_leadtime_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment lead-time SLA report: integer days from order to
    line shipment, exact p50/p90/p99 per order priority LOCATED BY
    CUMULATIVE COUNTS over a (priority, lead_days) census — the q245
    histogram-quantile pattern on a join-derived measure. The census
    is map-side-combined to |priorities|×|distinct day values| rows
    before any window runs, so the quantile stage never sorts fact
    rows — the difference between sorting 100 TB of lineitems and
    windowing a few hundred census rows. Discrete quantile rule
    (smallest value with cum·k ≥ n·q) is exact integer arithmetic,
    cross-multiplied to avoid division."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("lead_days"),
    )
    census = lt.groupBy("priority", "lead_days").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy("priority")
        .orderBy("lead_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("priority")
    cum = census.select(
        "priority",
        "lead_days",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wtot).alias("n"),
    )
    return cum.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("lead_days")))
        .cast("long")
        .alias("p50_days"),
        F.min(F.when(F.col("cc") * 10 >= F.col("n") * 9, F.col("lead_days")))
        .cast("long")
        .alias("p90_days"),
        F.min(F.when(F.col("cc") * 100 >= F.col("n") * 99, F.col("lead_days")))
        .cast("long")
        .alias("p99_days"),
        F.max("lead_days").cast("long").alias("max_days"),
    )


@register(
    "q307_ab_funnel_conversion",
    oracle="""
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
),
conv AS (
  SELECT u.user_id,
         MAX(CASE WHEN e.event_type = 'purchase' AND e.ts > u.first_view
             THEN 1 ELSE 0 END) AS converted
  FROM u JOIN events e ON e.user_id = u.user_id
  WHERE u.first_view IS NOT NULL
  GROUP BY u.user_id
),
arms AS (
  SELECT u.arm,
         COUNT(*) AS viewers,
         CAST(SUM(c.converted) AS BIGINT) AS conversions
  FROM u JOIN conv c ON u.user_id = c.user_id
  GROUP BY u.arm
),
wide AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN viewers END) AS n_a,
         MAX(CASE WHEN arm = 'A' THEN conversions END) AS c_a,
         MAX(CASE WHEN arm = 'B' THEN viewers END) AS n_b,
         MAX(CASE WHEN arm = 'B' THEN conversions END) AS c_b
  FROM arms
)
SELECT CAST(n_a AS BIGINT) AS n_a, c_a,
       CAST(n_b AS BIGINT) AS n_b, c_b,
       CAST(c_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
       CAST(c_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL ELSE
       CAST(floor((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000000.0
            / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
            AS BIGINT) END AS z_micro
FROM wide
""",
    tags=("analytics", "abtest", "funnel"),
)
def q307_ab_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout on an ORDERED funnel metric — q273
    tested raw event proportions; real experiments test "viewed, then
    later purchased" per USER: each arm's denominator is its viewer
    count, a conversion requires a purchase event strictly after the
    user's first view (sequence constraint, not co-occurrence), and
    the two-proportion z comes from the same fixed-operand-order IEEE
    chain as q273 so floor(z·1e6) is bit-exact. Shuffles: the
    per-user funnel census (map-side combined) and one user-key join;
    the arm pivot is 2 rows."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
    ).withColumn(
        "arm", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    )
    viewers = u.filter(F.col("first_view").isNotNull())
    conv = (
        viewers.join(e, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_view")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    arms = (
        viewers.join(conv, "user_id")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("viewers"),
            F.sum("converted").alias("conversions"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("viewers"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conversions"))).alias("c_a"),
        F.max(F.when(F.col("arm") == "B", F.col("viewers"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conversions"))).alias("c_b"),
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = F.floor(
        (
            F.col("c_a").cast("double") / F.col("n_a").cast("double")
            - F.col("c_b").cast("double") / F.col("n_b").cast("double")
        )
        * F.lit(1000000.0)
        / F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        )
    )
    degenerate = (F.col("c_a") + F.col("c_b") == 0) | (
        F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        "c_a",
        F.col("n_b").cast("long").alias("n_b"),
        "c_b",
        F.expr("c_a * 1000000 div n_a").alias("rate_a_ppm"),
        F.expr("c_b * 1000000 div n_b").alias("rate_b_ppm"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(z.cast("long"))
        .alias("z_micro"),
    )


@register(
    "q324_group_kfold",
    # Folds are md5(custkey) mod 5 — group-ATOMIC by construction
    # (every order of a customer shares the fold), which the census
    # re-proves by counting distinct folds per customer.
    oracle="""
WITH assigned AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(concat('0x', substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 AS fold,
         o.o_totalprice
  FROM orders o
),
per_cust AS (
  SELECT o_custkey, COUNT(DISTINCT fold) AS n_folds
  FROM assigned GROUP BY o_custkey
)
SELECT a.fold,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT a.o_custkey) AS n_customers,
       CAST(SUM(CAST(round(a.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST((SELECT COUNT(*) FROM per_cust WHERE n_folds > 1) AS BIGINT)
         AS leaky_customers
FROM assigned a
GROUP BY a.fold
""",
    tags=("ml", "split", "kfold", "leakage"),
)
def q324_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment (sklearn's GroupKFold contract,
    done the distributed way): every order lands in the fold of its
    CUSTOMER's hash — md5(custkey) mod 5 — so no customer ever spans
    folds and per-user signal cannot leak from train folds into the
    validation fold. The census reports per-fold order/customer
    counts and exact price mass, plus the leaky-customer count, which
    the construction forces to 0 and the query re-proves rather than
    assumes (the audit a pipeline runs after any refactor of the
    assignment rule).

    Scale shape: assignment is a scan-stage hash projection (no
    shuffle); the fold census partial-aggregates; the leakage check
    is a customer-keyed two-level aggregation — all bounded by key
    cardinality, never order pairs."""
    o = load_table(spark, sf_dir, "orders")
    assigned = o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 5
        ).alias("fold"),
        "o_totalprice",
    )
    leaky = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("n_folds"))
        .filter(F.col("n_folds") > 1)
        .agg(F.count(F.lit(1)).alias("leaky_customers"))
    )
    return (
        assigned.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("price_cents"),
        )
        .crossJoin(F.broadcast(leaky))
        .select("fold", "n_orders", "n_customers", "price_cents", "leaky_customers")
    )


@register(
    "q325_oof_target_encoding",
    # Out-of-fold mean per nation: (total − own fold) / (n − own n),
    # all in exact cents with floor division; folds from q324's rule.
    oracle="""
WITH base AS (
  SELECT o.o_orderkey, c.c_nationkey,
         CAST(concat('0x', substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 AS fold,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
fold_sums AS (
  SELECT c_nationkey, fold, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s
  FROM base GROUP BY c_nationkey, fold
),
nat_tot AS (
  SELECT c_nationkey, CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
  FROM fold_sums GROUP BY c_nationkey
)
SELECT f.c_nationkey, f.fold, f.n AS n_in_fold,
       CASE WHEN t.nt - f.n = 0 THEN NULL
            ELSE (t.st - f.s) // (t.nt - f.n) END AS oof_mean_cents
FROM fold_sums f JOIN nat_tot t ON f.c_nationkey = t.c_nationkey
""",
    tags=("ml", "target_encoding", "leakage"),
)
def q325_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the leakage-free way to turn a
    categorical (customer nation) into a numeric feature: each fold's
    encoding for a nation is the mean order value computed ONLY from
    the other folds ((total − own-fold sum) / (total n − own-fold n),
    exact integer cents), so a row never sees a statistic its own
    label contributed to — naive whole-dataset means are the classic
    silent overfit in tabular pipelines. Folds come from q324's
    group-atomic hash rule.

    Scale shape: ONE (nation, fold) census over the joined facts
    (partial-aggregated map-side, bounded by 25 nations × 5 folds),
    then the leave-one-fold-out arithmetic runs on that tiny relation
    via a second aggregation + join — the fact table is scanned once
    and never re-shuffled per fold (the naive per-fold-loop plan
    would scan it k times)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_nationkey",
            (
                F.conv(
                    F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
                    16, 10,
                ).cast("long") % 5
            ).alias("fold"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    fold_sums = base.groupBy("c_nationkey", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    nat_tot = fold_sums.groupBy("c_nationkey").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    return (
        fold_sums.join(nat_tot, "c_nationkey")
        .select(
            "c_nationkey",
            "fold",
            F.col("n").alias("n_in_fold"),
            F.when(F.col("nt") - F.col("n") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr("(st - s) div (nt - n)")
            ).alias("oof_mean_cents"),
        )
    )


# z chain shared verbatim by engine and oracle (identical IEEE double
# operation order, the q273 discipline): inputs are exact integers —
# u2 = 2*U_A, tie term T = sum(t^3 - t) over tie groups. Degenerate
# cases guarded identically on both sides (ADVICE r10): an empty arm
# (n_a or n_b = 0, which also covers N = 1) and a zero tie-corrected
# variance (every value identical) yield NULL, never inf/NaN — DuckDB
# errors casting inf to BIGINT while non-ANSI Spark clamps, so the
# guard is what keeps the engines identical on pathological data.
_Q445_Z = (
    "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE "
    "CAST(floor(CAST(u2_a - n_a * n_b AS DOUBLE) * 1000000.0 / "
    "nullif(2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * "
    "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE) / "
    "(CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))), 0.0)) "
    "AS BIGINT) END"
)


@register(
    "q445_mann_whitney_u",
    oracle=f"""
WITH base AS (
  SELECT event_type, value,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
  FROM events
),
ranked AS (
  SELECT event_type, arm,
         2 * rank() OVER (PARTITION BY event_type ORDER BY value ASC)
           + COUNT(*) OVER (PARTITION BY event_type, value) - 1 AS r2
  FROM base
),
per_arm AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN r2 ELSE 0 END) AS BIGINT) AS r2_a
  FROM ranked GROUP BY event_type
),
ties AS (
  SELECT event_type, CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT event_type, value, COUNT(*) AS t
        FROM base GROUP BY event_type, value)
  GROUP BY event_type
),
stats AS (
  SELECT p.event_type, p.n_a, p.n_b,
         p.r2_a - p.n_a * (p.n_a + 1) AS u2_a,
         t.tie_term
  FROM per_arm p JOIN ties t ON p.event_type = t.event_type
)
SELECT event_type, n_a, n_b, CAST(u2_a AS BIGINT) AS u2_a, tie_term,
       {_Q445_Z} AS z_micro
FROM stats
""",
    tags=("analytics", "abtest", "stats", "nonparametric"),
)
def q445_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–WHITNEY U rank-sum test (Wilcoxon two-sample) between the
    parity-split arms, per event type — the NONPARAMETRIC member of
    the testing family (q273 z-proportions, q261 chi-squared, q-ANOVA
    compare means/rates; this one compares whole value DISTRIBUTIONS
    with no normality assumption, the robust default when revenue-
    style metrics are heavy-tailed). Everything up to the z is exact
    integer arithmetic: average ranks are kept DOUBLED (2·rank_min +
    tie_size − 1, an integer), so U_A arrives as u2_a = 2·U_A =
    2·R_A − n_a(n_a+1) = r2_a − n_a(n_a+1) with no .5 ever
    materializing (round 11 fixes the r10 form, which computed 2·U_B
    under the u2_a name — ADVICE r10; z_micro is now the
    correctly-signed A-arm statistic); the tie-corrected variance
    term Σ(t³−t) is an integer census of tie-group sizes. The normal
    approximation z = (U_A − n_a·n_b/2)/σ_tie is the one float step,
    written as the identical IEEE chain in both engines (the q273
    discipline), floor(z·1e6), NULL-guarded identically on both sides
    for empty arms and zero variance. Plan: one event_type-partitioned
    rank window + two aggregates sharing that partitioning — no joins
    of fact rows, the same plan at any event volume."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", "value",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
    )
    r2 = (
        2 * F.rank().over(
            Window.partitionBy("event_type").orderBy(F.col("value").asc()))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "value"))
        - 1
    )
    ranked = base.select("event_type", "arm", r2.alias("r2"))
    per_arm = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("r2")).otherwise(0))
        .cast("long").alias("r2_a"),
    )
    ties = (
        base.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
             .cast("long").alias("tie_term"))
    )
    stats = per_arm.join(ties, "event_type").select(
        "event_type", "n_a", "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long").alias("u2_a"),
        "tie_term",
    )
    return stats.select(
        "event_type", "n_a", "n_b", "u2_a", "tie_term",
        F.expr(_Q445_Z).alias("z_micro"),
    )
