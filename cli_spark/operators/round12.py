"""Round-12 queue: collocation mining, experiment-analysis audits,
survival curves. Same cross-engine determinism discipline as
round11.py (shared IEEE chains, integer micro/ppm units floored
before any aggregation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# PMI over skipgram pair space: ln(c_ab * T / (c_a_left * c_b_right)),
# all four inputs exact integers; floored once for display/ordering.
_PMI = (
    "CAST(floor(1000000.0 * ln((CAST(c_ab AS DOUBLE) * CAST(t AS DOUBLE)) / "
    "(CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)))) AS BIGINT)"
)


@register(
    "q454_skipgram_pmi",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t, CAST(pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
             AS t,
           generate_subscripts(
             list_filter(string_split(lower(text), ' '), x -> x != ''), 1)
             AS pos
    FROM documents
  )
),
pairs AS (
  SELECT a.t AS w1, b.t AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
  GROUP BY a.t, b.t
),
lm AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM pairs GROUP BY w1),
rm AS (SELECT w2, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM pairs GROUP BY w2),
tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS t FROM pairs),
scored AS (
  SELECT p.w1, p.w2, p.c_ab, {_PMI} AS pmi_micro
  FROM pairs p JOIN lm ON lm.w1 = p.w1 JOIN rm ON rm.w2 = p.w2
  CROSS JOIN tot
  WHERE p.c_ab >= 5
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY pmi_micro DESC, w1 ASC, w2 ASC)
    AS rank
  FROM scored
)
SELECT CAST(rank AS BIGINT) AS rank, w1, w2, c_ab, pmi_micro
FROM ranked WHERE rank <= 30
""",
    tags=("text", "collocation", "pmi", "mining"),
)
def q454_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIPGRAM COLLOCATIONS by pointwise mutual information — the
    positional (word2vec-window) cousin of q180's doc-level basket
    lift: ordered token pairs within a forward window of 2 positions,
    PMI over the PAIR-SPACE marginals (left-slot and right-slot
    occurrence counts), support floor c_ab >= 5, top-30. This is the
    classic collocation extractor (Church & Hanks 1990) — the
    phrase-mining pass (multi-word expressions, named entities) that
    precedes tokenizer/vocab decisions on a training corpus.

    Determinism: PMI's four inputs are exact integers; the single ln
    chain is shared verbatim with the oracle and floored to micro
    units, so the top-30 ordering (tie-broken on the pair) is
    bit-identical across engines. Scale shape: posexplode → ONE
    self-join on (doc_id, position band) whose fan-out is exactly 2
    rows per token (never doc-length²), two broadcastable marginal
    aggregates, one WindowGroupLimit top-k — pair volume is 2·tokens,
    linear in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("pos", "t"),
    ).select("doc_id", "t", (F.col("pos") + 1).cast("long").alias("pos"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).between(1, 2),
        )
        .groupBy(F.col("a.t").alias("w1"), F.col("b.t").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    lm = pairs.groupBy("w1").agg(F.sum("c_ab").cast("long").alias("c_a"))
    rm = pairs.groupBy("w2").agg(F.sum("c_ab").cast("long").alias("c_b"))
    tot = pairs.agg(F.sum("c_ab").cast("long").alias("t"))
    scored = (
        pairs.filter(F.col("c_ab") >= 5)
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("pmi_micro", F.expr(_PMI))
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("pmi_micro").desc(), F.col("w1").asc(),
                           F.col("w2").asc())
        ),
    )
    return ranked.filter(F.col("rank") <= 30).select(
        F.col("rank").cast("long").alias("rank"),
        "w1", "w2", "c_ab", "pmi_micro",
    )


@register(
    "q455_simpsons_paradox_audit",
    oracle="""
WITH base AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events
),
strata AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT)
           AS s_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT)
           AS s_b
  FROM base GROUP BY event_type
),
overall AS (
  SELECT CAST(sign(SUM(s_a) * SUM(n_b) - SUM(s_b) * SUM(n_a)) AS BIGINT)
    AS overall_dir
  FROM strata
)
SELECT s.event_type, s.n_a, s.n_b,
       CAST(sign(s.s_a * s.n_b - s.s_b * s.n_a) AS BIGINT) AS stratum_dir,
       o.overall_dir,
       (CAST(sign(s.s_a * s.n_b - s.s_b * s.n_a) AS BIGINT)
        * o.overall_dir < 0) AS reversed
FROM strata s CROSS JOIN overall o
""",
    tags=("analytics", "abtest", "simpson", "audit"),
)
def q455_simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX audit for the parity-split experiment: does
    the direction of the A-vs-B mean-value effect WITHIN each
    event-type stratum match the pooled direction? Aggregation
    reversal (Simpson 1951; Bickel's Berkeley admissions being the
    canonical case) is the first thing to rule out before reading a
    pooled experiment metric — a stratum mix shift masquerades as a
    treatment effect. The comparison mean_A vs mean_B is evaluated
    in EXACT integer cross-multiplication (s_a·n_b vs s_b·n_a on
    floor-cent values — no float division anywhere), so the direction
    sign is bit-exact; per stratum the output carries its direction,
    the pooled direction, and the reversal flag.

    Scale shape: one (event_type, arm) census over the fact table —
    map-side combinable — then a 5-row broadcast comparison. The
    audit costs one scan at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("cents"),
    )
    strata = base.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("cents")).otherwise(0))
        .cast("long").alias("s_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("cents")).otherwise(0))
        .cast("long").alias("s_b"),
    )
    overall = strata.agg(
        F.expr("CAST(sign(SUM(s_a) * SUM(n_b) - SUM(s_b) * SUM(n_a)) "
               "AS BIGINT)").alias("overall_dir"))
    return (
        strata.crossJoin(F.broadcast(overall))
        .select(
            "event_type", "n_a", "n_b",
            F.expr("CAST(sign(s_a * n_b - s_b * n_a) AS BIGINT)")
            .alias("stratum_dir"),
            "overall_dir",
            (F.expr("CAST(sign(s_a * n_b - s_b * n_a) AS BIGINT)")
             * F.col("overall_dir") < 0).alias("reversed"),
        )
    )


# Kaplan–Meier step factor ln(1 - d/n) floored to integer micro
# BEFORE the cumulative sum; the survival value re-exponentiates the
# integer cumulative through one shared chain.
_KM_LN = (
    "CAST(floor(1000000.0 * ln((CAST(n_risk AS DOUBLE) - "
    "CAST(d AS DOUBLE)) / CAST(n_risk AS DOUBLE))) AS BIGINT)"
)
_KM_SURV = (
    "CAST(floor(1000000.0 * exp(CAST(cum_ln AS DOUBLE) / 1000000.0)) "
    "AS BIGINT)"
)


@register(
    "q456_km_survival",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS conv_us
  FROM events GROUP BY user_id
),
subjects AS (
  SELECT user_id,
         conv_us IS NOT NULL AND conv_us > first_us AS converted,
         CASE WHEN conv_us IS NOT NULL AND conv_us > first_us
              THEN (conv_us - first_us) // 86400000000
              ELSE (last_us - first_us) // 86400000000 END AS day
  FROM per_user
  WHERE last_us > first_us
),
n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects FROM subjects),
steps AS (
  SELECT day,
         CAST(COUNT(*) FILTER (WHERE converted) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM subjects GROUP BY day
),
risk AS (
  SELECT day, d,
         (SELECT n_subjects FROM n0)
           - COALESCE(SUM(leaving) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM steps
),
ev AS (SELECT day, d, n_risk FROM risk WHERE d > 0),
cum AS (
  SELECT day, d, n_risk,
         SUM({_KM_LN}) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln
  FROM ev WHERE d < n_risk
)
SELECT CAST(day AS BIGINT) AS day, CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_converted,
       {_KM_SURV} AS survival_micro
FROM cum
""",
    tags=("analytics", "survival", "kaplan_meier", "retention"),
)
def q456_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER time-to-conversion curve (Kaplan & Meier 1958):
    per user, time from first event to first 'purchase' in whole
    days; users who never purchase are RIGHT-CENSORED at their last
    observed event — the estimator every retention/conversion
    analysis runs, done correctly (dropping censored users biases
    conversion fast; treating them as converted biases it slow).
    S(t) = prod over event days <= t of (1 - d/n_risk), with n_risk
    the standard at-risk count (subjects whose event-or-censor day
    has not yet passed; ties on a day count as simultaneous).

    Determinism: each step factor ln(1 - d/n) is floored to an
    INTEGER micro unit, the cumulative is an integer window sum in
    deterministic day order, and one shared exp chain re-expands it —
    so the curve is bit-identical across engines (a raw float product
    would drift by multiplication order). Days where n_risk = d
    (everyone remaining converts) would be ln(0) and are excluded by
    the same predicate in both engines. Scale shape: one user-keyed
    reduction of the fact table, then day-level censuses — the curve
    relation is bounded by distinct days, not events."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    per_user = e.groupBy("user_id").agg(
        F.min(t_us).alias("first_us"),
        F.max(t_us).alias("last_us"),
        F.min(F.when(F.col("event_type") == "purchase", t_us))
        .alias("conv_us"),
    )
    converted = F.col("conv_us").isNotNull() & (
        F.col("conv_us") > F.col("first_us"))
    subjects = (
        per_user.filter(F.col("last_us") > F.col("first_us"))
        .select(
            converted.alias("converted"),
            F.when(converted,
                   F.expr("(conv_us - first_us) DIV 86400000000"))
            .otherwise(F.expr("(last_us - first_us) DIV 86400000000"))
            .alias("day"),
        )
    )
    n0 = subjects.count()
    steps = subjects.groupBy("day").agg(
        F.count_if("converted").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = steps.select(
        "day", "d",
        (F.lit(n0) - F.coalesce(F.sum("leaving").over(w), F.lit(0)))
        .alias("n_risk"),
    )
    ev = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    cum = ev.withColumn("cum_ln", F.sum(F.expr(_KM_LN)).over(wc))
    return cum.select(
        F.col("day").cast("long").alias("day"),
        "n_risk",
        F.col("d").alias("n_converted"),
        F.expr(_KM_SURV).alias("survival_micro"),
    )


# CUPED chains, shared verbatim: all inputs are exact integer moments
# (population form — divide by n), one float chain each.
_CUPED_THETA = (
    "CAST(floor(1000000.0 * "
    "((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
    " (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) "
    "AS BIGINT)"
)
_CUPED_VR = (
    "CAST(floor(1000000.0 * "
    "((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * "
    " (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / "
    "((CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
    " (CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) "
    "AS BIGINT)"
)
_CUPED_DIFF_RAW = (
    "CAST(floor(1000000.0 * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - "
    "CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))) AS BIGINT)"
)
_CUPED_DIFF_ADJ = (
    "CAST(floor(1000000.0 * ((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - "
    "CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) - "
    "((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
    " (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * "
    "(CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - "
    "CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)))) AS BIGINT)"
)
# Degenerate-variance guards, shared verbatim (ADVICE r11): evaluated
# through the SAME CAST(... AS DOUBLE) chain as the value expressions —
# the previous int64 form (sxx * n - sx * sx = 0) could overflow at
# large corpora, where DuckDB raises but non-ANSI Spark silently
# wraps, a cross-engine divergence the shared-chain discipline exists
# to prevent. In double the two engines compute the identical value.
_CUPED_NOVAR_X = (
    "CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) "
    "= 0.0"
)
_CUPED_NOVAR_Y = (
    "CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) "
    "= 0.0"
)


@register(
    "q457_cuped_adjustment",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo,
         (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
  FROM events
),
per_user AS (
  SELECT e.event_type, e.user_id,
         CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
         CAST(SUM(CASE WHEN epoch_us(e.ts) < b.mid
                       THEN CAST(floor(e.value * 100.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN epoch_us(e.ts) >= b.mid
                       THEN CAST(floor(e.value * 100.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events e CROSS JOIN bounds b
  GROUP BY e.event_type, e.user_id
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN is_a = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN is_a = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN is_a = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN is_a = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM per_user GROUP BY event_type
)
SELECT event_type, n AS n_users,
       CASE WHEN {_CUPED_NOVAR_X} THEN NULL
            ELSE {_CUPED_THETA} END AS theta_micro,
       CASE WHEN {_CUPED_NOVAR_X} OR {_CUPED_NOVAR_Y} THEN NULL
            ELSE {_CUPED_VR} END AS var_reduction_ppm,
       CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
            ELSE {_CUPED_DIFF_RAW} END AS diff_raw_micro,
       CASE WHEN n_a = 0 OR n_b = 0 OR {_CUPED_NOVAR_X} THEN NULL
            ELSE {_CUPED_DIFF_ADJ} END AS diff_adj_micro
FROM mom
""",
    tags=("analytics", "abtest", "cuped", "variance_reduction"),
)
def q457_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    2013) — the pre-experiment-covariate adjustment every large
    experimentation platform applies before reading a metric: per
    user, X = metric mass in the first half of the observation span
    (the "pre-period"), Y = mass in the second half; the adjusted
    metric Y − θ(X − mean X) with θ = cov(X,Y)/var(X) keeps the same
    expectation but sheds corr²(X,Y) of the variance — reported here
    per event type as theta, the realized variance-reduction share
    (= corr² in ppm), and the raw vs CUPED-adjusted A−B mean
    difference for the parity-split arms.

    Determinism: every moment (n, Σx, Σy, Σx², Σy², Σxy, per-arm
    sums) is an exact integer on floor-cent values; the four float
    chains (theta, corr², raw diff, adjusted diff) are shared
    verbatim with the oracle and floored once. Degenerate cases
    (zero pre-period variance, an empty arm) yield NULL identically
    in both engines. Scale shape: one user-keyed reduction of the
    fact table (map-side combinable), then a 5-row moment aggregate —
    the same one-scan cost profile as q455."""
    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    lo, hi = e.agg(F.min(t_us), F.max(t_us)).collect()[0]
    mid = (lo + hi) // 2
    cents = F.expr("CAST(floor(value * 100.0) AS BIGINT)")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .alias("is_a"),
        F.sum(F.when(t_us < F.lit(mid), cents).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(t_us >= F.lit(mid), cents).otherwise(0))
        .cast("long").alias("y"),
    )
    mom = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum("is_a").cast("long").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("is_a") == 1, F.col("x")).otherwise(0))
        .cast("long").alias("sx_a"),
        F.sum(F.when(F.col("is_a") == 0, F.col("x")).otherwise(0))
        .cast("long").alias("sx_b"),
        F.sum(F.when(F.col("is_a") == 1, F.col("y")).otherwise(0))
        .cast("long").alias("sy_a"),
        F.sum(F.when(F.col("is_a") == 0, F.col("y")).otherwise(0))
        .cast("long").alias("sy_b"),
    )
    novar_x = F.expr(_CUPED_NOVAR_X)
    novar_y = F.expr(_CUPED_NOVAR_Y)
    no_arm = F.expr("n_a = 0 OR n_b = 0")
    return mom.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.when(novar_x, F.lit(None).cast("long"))
        .otherwise(F.expr(_CUPED_THETA)).alias("theta_micro"),
        F.when(novar_x | novar_y, F.lit(None).cast("long"))
        .otherwise(F.expr(_CUPED_VR)).alias("var_reduction_ppm"),
        F.when(no_arm, F.lit(None).cast("long"))
        .otherwise(F.expr(_CUPED_DIFF_RAW)).alias("diff_raw_micro"),
        F.when(no_arm | novar_x, F.lit(None).cast("long"))
        .otherwise(F.expr(_CUPED_DIFF_ADJ)).alias("diff_adj_micro"),
    )


@register(
    "q458_quantile_treatment_effect",
    oracle="""
WITH base AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(floor(value * 100.0) AS BIGINT) AS cents,
         event_id
  FROM events
),
ranked AS (
  SELECT event_type, arm, cents,
         row_number() OVER (PARTITION BY event_type, arm
                            ORDER BY cents ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, arm) AS cnt
  FROM base
),
deciles AS (SELECT unnest(generate_series(1, 9)) AS k),
pick AS (
  SELECT r.event_type, r.arm, d.k, r.cents
  FROM ranked r JOIN deciles d
    ON r.rn = (d.k * r.cnt + 9) // 10
)
SELECT a.event_type, CAST(a.k AS BIGINT) AS decile,
       a.cents AS val_a_cents, b.cents AS val_b_cents,
       a.cents - b.cents AS qte_cents
FROM pick a JOIN pick b
  ON a.event_type = b.event_type AND a.k = b.k
     AND a.arm = 'A' AND b.arm = 'B'
""",
    tags=("analytics", "abtest", "quantile", "qte"),
)
def q458_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS for the parity-split experiment:
    the A−B difference of EXACT deciles (percentile_disc at
    k/10, rank ceil(k·n/10), k = 1..9) of the value distribution per
    event type — the distribution-level readout that mean-based tests
    (q273/q445/q457) structurally miss: a treatment that fattens the
    right tail while thinning the middle can move every decile yet
    leave the mean flat. Rank-located exact percentiles on integer
    cents (the q443/q26 discipline: no interpolation, no floats), so
    the whole surface is integer arithmetic end to end.

    Scale shape: one rank window per (event_type, arm) partition and
    a 9-row decile join against the rank equation — percentile_disc
    via WindowGroupLimit-friendly row_number, never a full collect;
    at 100 TB the same plan computes the deciles in one shuffle."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "arm").orderBy(
        F.col("cents").asc(), F.col("event_id").asc())
    ranked = base.select(
        "event_type", "arm", "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type", "arm")).alias("cnt"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("k"))
    pick = ranked.join(
        F.broadcast(deciles),
        F.col("rn") == F.expr("(k * cnt + 9) DIV 10"),
    ).select("event_type", "arm", "k", "cents")
    a = pick.filter(F.col("arm") == "A").select(
        "event_type", "k", F.col("cents").alias("val_a_cents"))
    b = pick.filter(F.col("arm") == "B").select(
        "event_type", "k", F.col("cents").alias("val_b_cents"))
    return a.join(b, ["event_type", "k"]).select(
        "event_type",
        F.col("k").cast("long").alias("decile"),
        "val_a_cents", "val_b_cents",
        (F.col("val_a_cents") - F.col("val_b_cents")).alias("qte_cents"),
    )


# RAKE word score deg(w)/freq(w), floored per word BEFORE the phrase
# sum (order-independent integer accumulation).
_RAKE_WSCORE = (
    "CAST(floor(1000000.0 * CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)) "
    "AS BIGINT)"
)
_RAKE_STOPLIST = "'a', 'the', 'of', 'to', 'and', 'in', 'is', 'on', 'for', 'data'"


@register(
    "q459_rake_keywords",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t, CAST(pos AS BIGINT) AS pos,
         t IN ({_RAKE_STOPLIST}) AS stop
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
             AS t,
           generate_subscripts(
             list_filter(string_split(lower(text), ' '), x -> x != ''), 1)
             AS pos
    FROM documents
  )
),
runs AS (
  SELECT doc_id, t, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS grp
  FROM toks WHERE NOT stop
),
phr AS (
  SELECT doc_id, grp,
         string_agg(t, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM runs GROUP BY doc_id, grp
  HAVING COUNT(*) BETWEEN 2 AND 4
),
wstats AS (
  SELECT r.t,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen - 1) AS BIGINT) AS deg
  FROM runs r JOIN phr p ON p.doc_id = r.doc_id AND p.grp = r.grp
  GROUP BY r.t
),
pscore AS (
  SELECT p.phrase,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(SUM(ws.score) AS BIGINT) AS score_micro
  FROM phr p
  JOIN (
    SELECT doc_id, grp, SUM({_RAKE_WSCORE}) AS score
    FROM (
      SELECT r.doc_id, r.grp, w.deg, w.freq
      FROM runs r JOIN wstats w ON w.t = r.t
      JOIN phr p2 ON p2.doc_id = r.doc_id AND p2.grp = r.grp
    ) GROUP BY doc_id, grp
  ) ws ON ws.doc_id = p.doc_id AND ws.grp = p.grp
  GROUP BY p.phrase
),
dedup AS (
  SELECT phrase, n_occurrences,
         CAST(score_micro // n_occurrences AS BIGINT) AS score_micro
  FROM pscore
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score_micro DESC, phrase ASC)
    AS rank
  FROM dedup
)
SELECT CAST(rank AS BIGINT) AS rank, phrase, n_occurrences, score_micro
FROM ranked WHERE rank <= 25
""",
    tags=("text", "keywords", "rake", "mining"),
)
def q459_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010):
    candidate phrases are maximal stopword-free token runs (length
    2–4), each scored by the sum of its words' deg/freq ratios —
    deg(w) counts co-occurring words across every phrase containing
    w, freq(w) counts w's phrase occurrences — so multi-word terms
    whose members travel together outrank frequent-but-promiscuous
    words. The corpus-level top-25 (per-phrase score averaged over
    its occurrences — identical occurrences share one corpus entry)
    is the keyword table a curation pipeline derives vocabularies and
    topic labels from.

    Determinism: deg and freq are exact integers from the phrase
    census; each word's deg/freq ratio is floored to integer micro
    units BEFORE the per-phrase sum, and the per-phrase average is
    integer division — the ranking is bit-identical across engines
    (tie-broken on the phrase string). Scale shape: the stopword list
    is a baked literal (no dictionary join); phrases come from ONE
    gaps-and-islands window per doc; word stats are a broadcastable
    aggregate; everything downstream rides phrase volume, linear in
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    stoplist = [w.strip().strip("'") for w in _RAKE_STOPLIST.split(",")]
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("pos0", "t"),
    ).select(
        "doc_id", "t", (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("t").isin(*stoplist).alias("stop"),
    )
    runs = toks.filter(~F.col("stop")).select(
        "doc_id", "t", "pos",
        (F.col("pos") - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos"))).alias("grp"),
    )
    phr = (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.array_join(F.array_sort(F.collect_list(
                F.struct("pos", "t"))).getField("t"), " ").alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen").between(2, 4))
    )
    wstats = (
        runs.join(phr.select("doc_id", "grp", "plen"), ["doc_id", "grp"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("plen") - 1).cast("long").alias("deg"),
        )
    )
    occ_scores = (
        runs.join(phr.select("doc_id", "grp"), ["doc_id", "grp"])
        .join(F.broadcast(wstats), "t")
        .groupBy("doc_id", "grp")
        .agg(F.sum(F.expr(_RAKE_WSCORE)).alias("score"))
    )
    pscore = (
        phr.join(occ_scores, ["doc_id", "grp"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum("score").cast("long").alias("score_sum"),
        )
        .select(
            "phrase", "n_occurrences",
            F.expr("CAST(score_sum DIV n_occurrences AS BIGINT)")
            .alias("score_micro"),
        )
    )
    ranked = pscore.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score_micro").desc(),
                           F.col("phrase").asc())),
    )
    return ranked.filter(F.col("rank") <= 25).select(
        F.col("rank").cast("long").alias("rank"),
        "phrase", "n_occurrences", "score_micro",
    )
