"""Round-10 exact-statistics pack: Pearson correlation from integer
moment components, an exact-Gini decision stump, and Holt-Winters
double-exponential smoothing in scaled-integer arithmetic.

The shared discipline (this repo's EWMA-dyadic / moment-stats
pattern): keep every data-dependent accumulation in EXACT integer or
decimal(38,0) arithmetic — associative, order-independent, map-side
combinable — and apply at most a final, explicitly-ordered pair of
IEEE double ops that both engines evaluate identically. No float ever
enters a SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table, register_views


@register(
    "q432_pearson_exact_components",
    oracle="""
WITH src AS (
  SELECT o_orderpriority AS grp,
         o_custkey % 1000 AS x,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 100000 AS y
  FROM orders
),
m AS (
  SELECT grp, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM src GROUP BY grp
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
       CAST(n * syy - sy * sy AS BIGINT) AS vary_num,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r6
FROM m
""",
    tags=("stats", "correlation", "exact"),
)
def q432_pearson_exact_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEARSON CORRELATION from exact integer moment components —
    the numerically-honest alternative to corr(): per group the five
    raw moments (Σx, Σy, Σx², Σy², Σxy) accumulate as exact integers
    (associative → map-side combinable → one narrow exchange at any
    scale, and NO catastrophic cancellation: n·Σxy − ΣxΣy computed
    in integers is exact where the streaming-float covariance loses
    digits). The graded output is the exact integer numerators
    themselves PLUS r to 6 decimals computed as one sqrt + one
    divide over those identical integers — the only float ops in the
    query, bit-reproducible across engines because IEEE divide/sqrt
    are correctly rounded. Inputs are bounded (x mod 1000, cents mod
    1e5) so every component provably fits int64 at any corpus
    size."""
    o = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 1000).cast("long")
    y = (
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long") % 100000
    )
    m = (
        o.select(F.col("o_orderpriority").alias("grp"), x.alias("x"), y.alias("y"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        cov.cast("long").alias("cov_num"),
        vx.cast("long").alias("varx_num"),
        vy.cast("long").alias("vary_num"),
        F.round(
            cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
            6,
        ).alias("r6"),
    )


@register(
    "q433_decision_stump_gini",
    # Split quality: weighted Gini cost = n - (A_l/n_l + A_r/n_r)
    # where A = pos² + neg² per side; minimizing cost == maximizing
    # S = A_l/n_l + A_r/n_r. S is computed as exactly two IEEE
    # divisions + one add over exact integers — identical in both
    # engines — and the argmax tie-breaks on the threshold.
    oracle="""
WITH lab AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders
),
tot AS (
  SELECT COUNT(*) AS n, SUM(pos) AS p FROM lab
),
cand AS (
  SELECT 2000000 * range AS thr FROM range(1, 16)
),
split AS (
  SELECT c.thr,
         SUM(CASE WHEN cents < c.thr THEN 1 ELSE 0 END) AS n_l,
         SUM(CASE WHEN cents < c.thr THEN pos ELSE 0 END) AS p_l
  FROM cand c CROSS JOIN lab
  GROUP BY c.thr
),
scored AS (
  SELECT s.thr, s.n_l, s.p_l,
         t.n - s.n_l AS n_r, t.p - s.p_l AS p_r, t.n AS n, t.p AS p
  FROM split s CROSS JOIN tot t
  WHERE s.n_l > 0 AND t.n - s.n_l > 0
),
ranked AS (
  SELECT thr, n_l, p_l, n_r, p_r,
         CAST(p_l * p_l + (n_l - p_l) * (n_l - p_l) AS DOUBLE) / n_l
         + CAST(p_r * p_r + (n_r - p_r) * (n_r - p_r) AS DOUBLE) / n_r AS s
  FROM scored
)
SELECT CAST(thr AS BIGINT) AS best_threshold_cents,
       CAST(n_l AS BIGINT) AS n_left, CAST(p_l AS BIGINT) AS pos_left,
       CAST(n_r AS BIGINT) AS n_right, CAST(p_r AS BIGINT) AS pos_right,
       round(s, 6) AS purity_score6
FROM ranked
ORDER BY s DESC, thr ASC
LIMIT 1
""",
    tags=("ml", "decision_tree", "gini", "exact"),
)
def q433_decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECISION STUMP by exact Gini split search — the inner loop of
    every distributed tree learner (GBDT/random forest), graded: the
    label is order finality, the feature is price in exact cents, and
    15 fixed candidate thresholds are scored in ONE pass (a threshold
    × row cross join that aggregates immediately — at 100 TB this is
    the histogram-building pattern: per-candidate counts are map-side
    partial sums, the shuffle carries 15 rows per mapper, never
    data). Weighted Gini minimization reduces to maximizing
    A_l/n_l + A_r/n_r with A = pos²+neg² — integer-exact numerators,
    one explicitly-ordered float division pair at the end (IEEE-
    identical across engines), argmax tie-broken on the threshold.
    Degenerate splits (empty side) abstain rather than divide by
    zero."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    tot = lab.agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    cand = spark.range(1, 16).select((F.col("id") * 2000000).alias("thr"))
    split = (
        F.broadcast(cand)
        .crossJoin(lab)
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("thr"), 1).otherwise(0))
            .alias("n_l"),
            F.sum(F.when(F.col("cents") < F.col("thr"), F.col("pos"))
                  .otherwise(0)).alias("p_l"),
        )
    )
    scored = (
        split.crossJoin(F.broadcast(tot))
        .withColumn("n_r", F.col("n") - F.col("n_l"))
        .withColumn("p_r", F.col("p") - F.col("p_l"))
        .filter((F.col("n_l") > 0) & (F.col("n_r") > 0))
    )
    a_l = (F.col("p_l") * F.col("p_l")
           + (F.col("n_l") - F.col("p_l")) * (F.col("n_l") - F.col("p_l")))
    a_r = (F.col("p_r") * F.col("p_r")
           + (F.col("n_r") - F.col("p_r")) * (F.col("n_r") - F.col("p_r")))
    s = (a_l.cast("double") / F.col("n_l")
         + a_r.cast("double") / F.col("n_r"))
    return (
        scored.withColumn("s", s)
        .orderBy(F.col("s").desc(), F.col("thr").asc())
        .limit(1)
        .select(
            F.col("thr").cast("long").alias("best_threshold_cents"),
            F.col("n_l").cast("long").alias("n_left"),
            F.col("p_l").cast("long").alias("pos_left"),
            F.col("n_r").cast("long").alias("n_right"),
            F.col("p_r").cast("long").alias("pos_right"),
            F.round(F.col("s"), 6).alias("purity_score6"),
        )
    )


@register(
    "q434_holt_winters_scaled_int",
    # Scaled-integer double-exponential smoothing, alpha = beta = 1/4:
    # with D_t = 16^t, L_t = l_t*D_t and B_t = b_t*D_t satisfy the
    # INTEGER recurrences (derived by substitution, no division left):
    #   L_t = 4*16^(t-1)*y_t + 12*L_(t-1) + 12*B_(t-1)
    #   B_t =   16^(t-1)*y_t -  L_(t-1) + 15*B_(t-1)
    # Init: L_1 = 16*y_1, B_1 = 16*(y_2 - y_1). Forecast h ahead:
    # (L_K + h*B_K) / 16^K, the only float op in the query.
    oracle="""
WITH RECURSIVE monthly AS (
  SELECT row_number() OVER (ORDER BY m) AS t,
         CAST(v AS HUGEINT) AS y
  FROM (
    SELECT date_trunc('month', o_orderdate) AS m,
           SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY date_trunc('month', o_orderdate)
  )
),
hw AS (
  SELECT 1 AS t,
         16 * (SELECT y FROM monthly WHERE t = 1) AS l,
         16 * ((SELECT y FROM monthly WHERE t = 2)
               - (SELECT y FROM monthly WHERE t = 1)) AS b
  UNION ALL
  SELECT hw.t + 1,
         4 * power(16, hw.t)::HUGEINT * m.y + 12 * hw.l + 12 * hw.b,
         power(16, hw.t)::HUGEINT * m.y - hw.l + 15 * hw.b
  FROM hw JOIN monthly m ON m.t = hw.t + 1
),
fin AS (
  SELECT l, b FROM hw ORDER BY t DESC LIMIT 1
),
k AS (SELECT MAX(t) AS kk FROM monthly)
SELECT h.h AS horizon,
       round((CAST(f.l AS DOUBLE) + h.h * CAST(f.b AS DOUBLE))
             / power(16.0, (SELECT kk FROM k)) / 100.0, 2) AS forecast
FROM fin f CROSS JOIN (SELECT range AS h FROM range(1, 4)) h
""",
    tags=("timeseries", "forecast", "exact", "dyadic"),
)
def q434_holt_winters_scaled_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S DOUBLE-EXPONENTIAL SMOOTHING in scaled-integer
    arithmetic — extending q235's single-EWMA dyadic trick to the
    coupled level+trend recurrence: with alpha = beta = 1/4 and
    denominator 16^t, the level/trend states satisfy pure INTEGER
    recurrences (derivation in the oracle header — the key step is
    substituting L_t into B_t so no intermediate division survives),
    accumulated in decimal(38,0) (DuckDB HUGEINT) with exact
    equality at every step. 12 monthly 1995 revenue points feed the
    fold; forecasts at h = 1..3 divide once at the end. The
    sequential fold runs in one applyInPandas over the 12
    PRE-AGGREGATED monthly rows — the aggregation is distributed and
    the recurrence touches 12 rows, which is the correct division of
    labor at 100 TB (a recurrence over raw rows would be the
    anti-pattern; over the month spine it is O(months))."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("y")
        )
        .withColumn("g", F.lit(1))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("m").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        k = len(ys)
        l_s, b_s = 16 * ys[0], 16 * (ys[1] - ys[0])  # t = 1 state
        for t in range(2, k + 1):  # fold updates for t = 2..K
            y = ys[t - 1]
            l_new = 4 * 16 ** (t - 1) * y + 12 * l_s + 12 * b_s
            b_new = 16 ** (t - 1) * y - l_s + 15 * b_s
            l_s, b_s = l_new, b_new
        den = float(16 ** k)
        rows = [
            (h, round((float(l_s) + h * float(b_s)) / den / 100.0, 2))
            for h in (1, 2, 3)
        ]
        return pd.DataFrame(rows, columns=["horizon", "forecast"])

    return monthly.groupBy("g").applyInPandas(
        fold, "horizon long, forecast double"
    )
