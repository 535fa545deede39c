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
