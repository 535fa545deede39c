"""Text-quality and scrubbing operators — the filter stage of a
training-data pipeline: PII-style redaction, repetition scoring, and
a composite keep/drop quality verdict.

Design for 100 TB:
* all three are narrow per-row projections (regex / array built-ins,
  JVM-side, inside WholeStageCodegen) followed by at most one small
  aggregation — they pipeline directly over the scan with no shuffle
  of document payloads;
* regexes are RE2-compatible (no backrefs/lookahead) so the same
  pattern text runs identically on Spark (Java regex) and the DuckDB
  oracle (RE2) — and would also push into any RE2-based scan filter;
* verdicts are bitmasks, not strings, so downstream filters are
  integer comparisons and the reasons survive into metrics cheaply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_ID_PAT = "[0-9]{4,}"


@register(
    "q85_pii_scrub",
    oracle=f"""
WITH scrubbed AS (
  SELECT c_mktsegment,
         len(regexp_extract_all(c_name, '{_ID_PAT}')) AS n_hits,
         regexp_replace(c_name, '{_ID_PAT}', '[ID]', 'g') AS clean_name
  FROM customer
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(n_hits) AS BIGINT) AS n_redactions,
       COUNT(DISTINCT clean_name) AS distinct_clean_names
FROM scrubbed GROUP BY c_mktsegment
""",
    tags=("quality", "pii", "regex"),
)
def q85_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction: mask identifier digit-runs (>=4 digits) in
    customer names, report per-segment hit counts and the distinct
    count of post-redaction names (how much the scrub collapses).
    The same regexp_replace/regexp_count pair is the shape of email/
    phone/SSN scrubbing on real corpora — one codegen'd projection,
    no shuffle until the tiny per-segment census."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_mktsegment",
            F.regexp_count("c_name", F.lit(_ID_PAT)).alias("n_hits"),
            F.regexp_replace("c_name", _ID_PAT, "[ID]").alias("clean_name"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_hits").cast("long").alias("n_redactions"),
            F.countDistinct("clean_name").alias("distinct_clean_names"),
        )
    )


@register(
    "q86_repetition_ratio",
    oracle="""
WITH grams AS (
  SELECT doc_id, lang,
         CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1),
              i -> list_extract(w,i) || ' ' || list_extract(w,i+1))
              ELSE []::VARCHAR[] END AS bg
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
)
SELECT doc_id, lang,
       len(bg) AS n_bigrams,
       round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6) AS repetition
FROM grams WHERE len(bg) > 0
""",
    tags=("quality", "repetition", "ngram"),
)
def q86_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition score: fraction of word bigrams that
    are repeats (1 - distinct/total) — the standard boilerplate /
    degenerate-generation signal used to drop low-quality docs.
    Pure per-row array math (split → transform → array_distinct):
    linear, shuffle-free, codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bg = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = d.select(
        "doc_id",
        "lang",
        F.size(bg).alias("n_bigrams"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(bg)).cast("double") / F.size(bg), 6
        ).alias("repetition"),
    )
    return out.filter(F.col("n_bigrams") > 0)


def _quality_flags(text: Column) -> Column:
    """Bitmask of quality failures: bit0 too-short/long, bit1 mean word
    length out of [2, 10], bit2 stopword ratio out of [0.01, 0.6]."""
    w = F.split(text, " ")
    n = F.size(w)
    mean_len = (F.length(text) - (n - F.lit(1))).cast("double") / n
    stop = F.size(F.filter(w, lambda t: t.isin("a", "the"))).cast("double") / n
    return (
        F.when((n < 8) | (n > 200), 1).otherwise(0)
        + F.when((mean_len < 2.0) | (mean_len > 10.0), 2).otherwise(0)
        + F.when((stop < 0.01) | (stop > 0.6), 4).otherwise(0)
    )


@register(
    "q87_quality_verdict",
    oracle="""
WITH scored AS (
  SELECT lang,
         (CASE WHEN len(w) < 8 OR len(w) > 200 THEN 1 ELSE 0 END)
         + (CASE WHEN CAST(chars - (len(w) - 1) AS DOUBLE) / len(w) < 2.0
                   OR CAST(chars - (len(w) - 1) AS DOUBLE) / len(w) > 10.0 THEN 2 ELSE 0 END)
         + (CASE WHEN CAST(len(list_filter(w, t -> t IN ('a', 'the'))) AS DOUBLE) / len(w) < 0.01
                   OR CAST(len(list_filter(w, t -> t IN ('a', 'the'))) AS DOUBLE) / len(w) > 0.6 THEN 4 ELSE 0 END)
         AS flags
  FROM (SELECT lang, string_split(text, ' ') AS w, len(text) AS chars FROM documents)
)
SELECT lang, flags, COUNT(*) AS n_docs
FROM scored GROUP BY lang, flags
""",
    tags=("quality", "filter", "verdict"),
)
def q87_quality_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality gate: per-document failure bitmask (length
    band, mean word length, stopword-ratio band) aggregated to a
    lang × bitmask census. flags = 0 is the keep set; the bitmask
    keeps every drop reason countable without re-scoring. One
    projection + one small group-by."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", _quality_flags(F.col("text")).alias("flags"))
        .groupBy("lang", "flags")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q88_winsorized_mean",
    oracle="""
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(least(greatest(o_totalprice, p05), p95) * 10000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS winsorized_avg_price
FROM orders CROSS JOIN cuts
GROUP BY o_orderstatus
""",
    tags=("quality", "robust-stats", "winsorize"),
)
def q88_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (clamp at p5/p95, then average) — the robust
    statistic for outlier-polluted measures. Two passes: an exact
    interpolated-percentile reduction to a 1-row cutoff relation
    (broadcast), then one clamped aggregation; the fact table is
    scanned twice but shuffled only as group-level partials. Both
    engines interpolate percentile_cont identically; the clamped sum
    is quantized so the average matches bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice)").alias("p05"),
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    q = F.floor(clamped * 10000.0 + 0.5)
    return (
        o.crossJoin(F.broadcast(cuts))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(q).cast("double") / 10000.0 / F.count(F.lit(1))).alias(
                "winsorized_avg_price"
            ),
        )
    )


from pyspark.sql.window import Window as _W  # noqa: E402  (q185)


@register(
    "q185_word_run_census",
    oracle="""
WITH pos AS (
  SELECT doc_id, t.word, t.pos
  FROM documents,
       LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS word,
                       generate_subscripts(string_split(lower(text), ' '), 1)
                         AS pos) t
  WHERE t.word <> ''
),
flagged AS (
  SELECT doc_id, word, pos,
         CASE WHEN lag(word) OVER (PARTITION BY doc_id ORDER BY pos ASC)
                   IS DISTINCT FROM word THEN 1 ELSE 0 END AS new_run
  FROM pos
),
runs AS (
  SELECT doc_id, word,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos ASC
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
sized AS (
  SELECT doc_id, run_id, COUNT(*) AS run_len
  FROM runs GROUP BY doc_id, word, run_id
)
SELECT doc_id,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(SUM(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stutters,
       CAST(SUM(CASE WHEN run_len >= 2 THEN run_len ELSE 0 END) AS BIGINT)
         AS stutter_words,
       MAX(run_len) >= 3 AS flag_heavy_stutter
FROM sized GROUP BY doc_id
""",
    tags=("quality", "text", "islands"),
)
def q185_word_run_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-word run ("stutter") census per document — the
    boilerplate/generation-loop quality signal: longest run of the
    same consecutive word, number of runs ≥ 2, and words absorbed by
    stutters. Positions come from posexplode (order is the ARRAY
    index, not a timestamp), runs from the lag≠current → cumsum
    islands idiom, all partitioned by doc_id — one shuffle, and at
    100 TB the explode happens AFTER the scan projects only (doc_id,
    text), so the fan-out never hits the exchange (partial counts
    collapse it per doc)."""
    d = load_table(spark, sf_dir, "documents")
    pos = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    w_ord = _W.partitionBy("doc_id").orderBy(F.col("pos").asc())
    flagged = pos.select(
        "doc_id",
        "word",
        "pos",
        F.when(
            ~F.lag("word").over(w_ord).eqNullSafe(F.col("word")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    runs = flagged.select(
        "doc_id",
        "word",
        F.sum("new_run")
        .over(w_ord.rowsBetween(_W.unboundedPreceding, _W.currentRow))
        .alias("run_id"),
    )
    sized = runs.groupBy("doc_id", "word", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return sized.groupBy("doc_id").agg(
        F.max("run_len").cast("long").alias("max_run"),
        F.sum(F.when(F.col("run_len") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_stutters"),
        F.sum(F.when(F.col("run_len") >= 2, F.col("run_len")).otherwise(0))
        .cast("long")
        .alias("stutter_words"),
        (F.max("run_len") >= 3).alias("flag_heavy_stutter"),
    )


@register(
    "q227_malformed_json_census",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
       CAST(SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(SUM(CASE WHEN props IS NOT NULL AND json_valid(props)
                     AND json_extract(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(CASE WHEN props IS NOT NULL AND json_valid(props)
                     THEN CAST(COALESCE(json_extract(props, '$.k'), '0') AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS k_sum
FROM events GROUP BY event_type
""",
    tags=("quality", "json", "census"),
)
def q227_malformed_json_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter census of the semi-structured column: per event
    type, how many `props` payloads are NULL, syntactically invalid
    JSON, or valid-but-missing the expected key — the triage query
    every ingestion pipeline runs on its JSON side-channel before
    trusting extracted fields (q54/q125 exercise the happy path;
    this is the failure accounting). Spark's `from_json` yields a
    NULL struct exactly when DuckDB's `json_valid` is false, which
    is the semantic the census pins.

    Scale shape: pure per-row projection (JSON parse inside codegen,
    no Python) + one map-side combined groupBy on event_type."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_type",
        F.col("props").isNull().alias("is_null"),
        (F.col("props").isNotNull() & parsed.isNull()).alias("is_invalid"),
        (parsed.isNotNull() & parsed["k"].isNotNull()).alias("has_k"),
        F.when(parsed.isNotNull(), F.coalesce(parsed["k"], F.lit(0)))
        .otherwise(0)
        .alias("k_val"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("is_null"), 1).otherwise(0)).cast("long").alias("n_null_props"),
        F.sum(F.when(F.col("is_invalid"), 1).otherwise(0)).cast("long").alias("n_invalid"),
        F.sum(F.when(F.col("has_k"), 1).otherwise(0)).cast("long").alias("n_with_k"),
        F.sum("k_val").cast("long").alias("k_sum"),
    )


from pyspark.sql.window import Window  # noqa: E402


@register(
    "q260_decile_lift_table",
    oracle="""
WITH labeled AS (
  SELECT doc_id,
         CAST(floor(CAST(len(list_filter(string_split(lower(text), ' '),
                x -> list_contains(['a','the','of','to','and','in','is','on'], x)))
                * 1000000 AS DOUBLE)
              / len(list_filter(string_split(lower(text), ' '), x -> x != '')))
           AS BIGINT) AS score_ppm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
census AS (
  SELECT score_ppm, COUNT(*) AS c, CAST(SUM(pos) AS BIGINT) AS p
  FROM labeled GROUP BY score_ppm
),
cum AS (
  SELECT score_ppm, c, p,
         SUM(c) OVER (ORDER BY score_ppm ASC) - c AS cum_before,
         SUM(c) OVER () AS total,
         SUM(p) OVER () AS total_pos
  FROM census
)
SELECT CAST(cum_before * 10 // total AS BIGINT) AS decile,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(p) * 1000000 // SUM(c) AS BIGINT) AS pos_rate_ppm,
       CASE WHEN MAX(total_pos) = 0 THEN NULL
            ELSE CAST(SUM(p) * MAX(total) * 1000000
                      // (SUM(c) * MAX(total_pos)) AS BIGINT) END AS lift_ppm
FROM cum
GROUP BY 1
""",
    tags=("quality", "ml-eval", "lift"),
)
def q260_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the standard model-evaluation gains chart,
    here scoring docs by English-stopword density as a predictor of
    the lang='en' label: per score decile the positive rate and its
    lift over the base rate, all integer ppm (NULL lift if the corpus
    has no positives — pinned identically in both engines). Deciles
    are cut on the SCORE CENSUS by cumulative count (ties share a
    decile — deterministic, unlike ntile's arbitrary tie splits, and
    the window runs over |distinct scores| rows, not documents). The
    facts see one projection and one census shuffle."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    stop = F.filter(
        F.split(F.lower("text"), " "),
        lambda x: x.isin("a", "the", "of", "to", "and", "in", "is", "on"),
    )
    labeled = d.select(
        F.floor(
            (F.size(stop) * F.lit(1000000)).cast("double") / F.size(words)
        ).cast("long").alias("score_ppm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    census = labeled.groupBy("score_ppm").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    w_cum = Window.orderBy(F.col("score_ppm").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = census.select(
        "score_ppm",
        "c",
        "p",
        (F.sum("c").over(w_cum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(w_all).alias("total"),
        F.sum("p").over(w_all).alias("total_pos"),
    )
    return (
        cum.groupBy(F.expr("cum_before * 10 div total").alias("decile"))
        .agg(
            F.sum("c").alias("n_docs"),
            F.sum("p").alias("n_pos"),
            F.max("total").alias("_t"),
            F.max("total_pos").alias("_tp"),
        )
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.expr("n_pos * 1000000 div n_docs").alias("pos_rate_ppm"),
            F.expr("CASE WHEN _tp = 0 THEN NULL "
                   "ELSE n_pos * _t * 1000000 div (n_docs * _tp) END").alias("lift_ppm"),
        )
    )


@register(
    "q286_k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT lang, source, n_chars // 100 AS len_band FROM documents
),
groups AS (
  SELECT lang, source, len_band, COUNT(*) AS k
  FROM qi GROUP BY lang, source, len_band
)
SELECT lang,
       COUNT(*) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_docs,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS small_groups,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS docs_at_risk,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) * 1000000
         // CAST(SUM(k) AS BIGINT) AS risk_ppm
FROM groups
GROUP BY lang
""",
    tags=("quality", "privacy", "k-anonymity"),
)
def q286_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang,
    source, 100-char length band) — the release-safety question for a
    published corpus: how many documents sit in equivalence classes
    smaller than k = 5, i.e. re-identifiable by their metadata alone
    (Sweeney 2002). Two-level aggregation: the QI-group census
    partial-aggregates map-side (bounded by the QI grid, not the
    corpus), then a per-language rollup reports group counts, the
    minimum class size, and the at-risk document share in exact ppm."""
    d = load_table(spark, sf_dir, "documents")
    groups = (
        d.select("lang", "source", F.expr("n_chars div 100").alias("len_band"))
        .groupBy("lang", "source", "len_band")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return (
        groups.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_docs"),
            F.min("k").cast("long").alias("min_k"),
            F.sum(F.when(F.col("k") < 5, 1).otherwise(0)).alias("small_groups"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias("docs_at_risk"),
        )
        .select(
            "lang",
            "n_groups",
            "n_docs",
            "min_k",
            "small_groups",
            "docs_at_risk",
            F.expr("docs_at_risk * 1000000 div n_docs").alias("risk_ppm"),
        )
    )


@register(
    "q313_l_diversity_audit",
    oracle="""
WITH groups AS (
  SELECT source, n_chars // 100 AS len_band,
         COUNT(*) AS k,
         COUNT(DISTINCT lang) AS l
  FROM documents GROUP BY source, n_chars // 100
)
SELECT source,
       COUNT(*) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_docs,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS weak_groups,
       CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT) AS docs_at_risk,
       CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT) * 1000000
         // CAST(SUM(k) AS BIGINT) AS risk_ppm
FROM groups
GROUP BY source
""",
    tags=("quality", "privacy", "l-diversity"),
)
def q313_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE'06 — the
    refinement of q286's k-anonymity): a quasi-identifier group
    (source, 100-char length band) is safe only if its SENSITIVE
    attribute (here: lang) takes at least l = 3 distinct values —
    k-anonymous groups whose members all share one sensitive value
    still leak it. Per source: group census, the minimum diversity,
    and the share of documents in under-diverse groups in exact ppm.
    Same two-level scale shape as q286: the QI census partial-
    aggregates map-side and is bounded by the QI grid, never the
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    groups = (
        d.select("source", F.expr("n_chars div 100").alias("len_band"), "lang")
        .groupBy("source", "len_band")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("lang").alias("l"),
        )
    )
    return (
        groups.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_docs"),
            F.min("l").cast("long").alias("min_l"),
            F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias("weak_groups"),
            F.sum(F.when(F.col("l") < 3, F.col("k")).otherwise(0)).alias("docs_at_risk"),
        )
        .select(
            "source",
            "n_groups",
            "n_docs",
            "min_l",
            "weak_groups",
            "docs_at_risk",
            F.expr("docs_at_risk * 1000000 div n_docs").alias("risk_ppm"),
        )
    )


@register(
    "q300_release_scorecard",
    oracle="""
WITH feat AS (
  SELECT doc_id, lang, source, n_chars,
         md5(text) AS h_full,
         md5(substr(text, 1, 100)) AS h_prefix,
         len(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS n_words,
         len(list_distinct(list_filter(string_split(lower(text), ' '),
                                       x -> x != ''))) AS n_distinct
  FROM documents
),
per_lang AS (
  SELECT lang,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT h_full) AS n_unique_texts,
         COUNT(*) - COUNT(DISTINCT h_prefix) AS n_prefix_dups,
         CAST(SUM(CASE WHEN n_words BETWEEN 20 AND 80
                        AND n_distinct * 2 >= n_words
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_pass
  FROM feat GROUP BY lang
),
qi AS (
  SELECT lang, source, n_chars // 100 AS band, COUNT(*) AS k
  FROM feat GROUP BY lang, source, n_chars // 100
),
risk AS (
  SELECT lang,
         CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) * 1000000
           // CAST(SUM(k) AS BIGINT) AS risk_ppm
  FROM qi GROUP BY lang
)
SELECT p.lang, p.n_docs, p.n_unique_texts, p.n_prefix_dups, p.n_gate_pass,
       p.n_gate_pass * 1000000 // p.n_docs AS gate_pass_ppm,
       r.risk_ppm,
       CASE WHEN p.n_gate_pass * 1000000 // p.n_docs > 500000
                 AND r.risk_ppm < 100000
            THEN 1 ELSE 0 END AS releasable
FROM per_lang p JOIN risk r ON p.lang = r.lang
""",
    tags=("quality", "release", "scorecard", "composite"),
)
def q300_release_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus RELEASE SCORECARD — the one-page gate a dataset publish
    runs, fusing four stacks into a single two-shuffle plan: per
    language, exact-duplicate pressure (distinct full-text hashes),
    boilerplate pressure (100-char-prefix collisions, q285's key),
    quality-gate pass share (length + diversity rules from the
    Gopher family), and the k-anonymity at-risk share over the
    (lang, source, length-band) quasi-identifier grid (q286), with an
    integer releasable verdict (pass share > 50%, re-identification
    risk < 10%).

    One scan computes every per-doc feature as projection columns;
    the per-lang census and the QI census are two map-side-combined
    aggregations joined on the 5-row language key."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    feat = d.select(
        "lang",
        "source",
        "n_chars",
        F.md5(F.encode("text", "utf-8")).alias("h_full"),
        F.md5(F.expr("substring(text, 1, 100)")).alias("h_prefix"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    per_lang = feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h_full").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("h_prefix")).alias("n_prefix_dups"),
        F.sum(
            F.when(
                F.col("n_words").between(20, 80)
                & (F.col("n_distinct") * 2 >= F.col("n_words")),
                1,
            ).otherwise(0)
        ).alias("n_gate_pass"),
    )
    qi = feat.groupBy("lang", "source", F.expr("n_chars div 100").alias("band")).agg(
        F.count(F.lit(1)).alias("k")
    )
    risk = qi.groupBy("lang").agg(
        F.expr(
            "SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000 div SUM(k)"
        ).alias("risk_ppm")
    )
    return (
        per_lang.join(risk, "lang")
        .select(
            "lang",
            "n_docs",
            "n_unique_texts",
            "n_prefix_dups",
            "n_gate_pass",
            F.expr("n_gate_pass * 1000000 div n_docs").alias("gate_pass_ppm"),
            "risk_ppm",
            F.when(
                (F.expr("n_gate_pass * 1000000 div n_docs") > 500000)
                & (F.col("risk_ppm") < 100000),
                1,
            )
            .otherwise(0)
            .alias("releasable"),
        )
    )


@register(
    "q302_char_class_census",
    oracle="""
WITH per_doc AS (
  SELECT lang, source,
         length(text) AS n,
         length(text) - length(regexp_replace(lower(text), '[a-z]', '', 'g'))
           AS n_alpha,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS n_digit,
         length(text) - length(replace(text, ' ', '')) AS n_space
  FROM documents
)
SELECT lang, source,
       CAST(SUM(n) AS BIGINT) AS chars,
       CAST(SUM(n_alpha) AS BIGINT) * 1000000 // CAST(SUM(n) AS BIGINT)
         AS alpha_ppm,
       CAST(SUM(n_digit) AS BIGINT) * 1000000 // CAST(SUM(n) AS BIGINT)
         AS digit_ppm,
       CAST(SUM(n_space) AS BIGINT) * 1000000 // CAST(SUM(n) AS BIGINT)
         AS space_ppm,
       CAST(SUM(n - n_alpha - n_digit - n_space) AS BIGINT) * 1000000
         // CAST(SUM(n) AS BIGINT) AS other_ppm,
       CAST(SUM(CASE WHEN (n_alpha + n_space) * 10 < n * 7 THEN 1 ELSE 0 END)
            AS BIGINT) AS suspect_docs
FROM per_doc GROUP BY lang, source
""",
    tags=("quality", "charclass", "gates"),
)
def q302_char_class_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per (lang, source) — the
    RefinedWeb/C4 symbol-ratio gate that catches OCR garbage, base64
    blobs and markup residue: alphabetic / digit / whitespace / other
    shares in exact ppm, counted by regex-strip length differences
    (identical regexp_replace semantics both engines), plus a census
    of suspect documents where letters+spaces fall below 70% of
    characters. Pure scan-stage projection; one map-side-combined
    rollup to the (lang, source) grid."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        "source",
        F.length("text").alias("n"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.lower("text"), "[a-z]", ""))
        ).alias("n_alpha"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digit"),
        (
            F.length("text") - F.length(F.replace("text", F.lit(" "), F.lit("")))
        ).alias("n_space"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.sum("n").alias("chars"),
        F.expr("SUM(n_alpha) * 1000000 div SUM(n)").alias("alpha_ppm"),
        F.expr("SUM(n_digit) * 1000000 div SUM(n)").alias("digit_ppm"),
        F.expr("SUM(n_space) * 1000000 div SUM(n)").alias("space_ppm"),
        F.expr(
            "SUM(n - n_alpha - n_digit - n_space) * 1000000 div SUM(n)"
        ).alias("other_ppm"),
        F.sum(
            F.when((F.col("n_alpha") + F.col("n_space")) * 10 < F.col("n") * 7, 1)
            .otherwise(0)
        ).alias("suspect_docs"),
    )


@register(
    "q342_pseudonymization_audit",
    # pseudo(uid) = (7919·uid + 104729) mod 1,000,003 (prime > any
    # uid, multiplier coprime to it → injective). The audit proves
    # the properties rather than assuming them: zero collisions, and
    # the self-join mass (Σ per-key count²) identical under raw and
    # pseudonymous keys — computed from censuses, never via an
    # actual self-join.
    oracle="""
WITH p AS (
  SELECT user_id, (7919 * user_id + 104729) % 1000003 AS pseudo
  FROM events
),
raw_c AS (SELECT user_id, COUNT(*) AS c FROM p GROUP BY user_id),
ps_c AS (SELECT pseudo, COUNT(*) AS c FROM p GROUP BY pseudo)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_events,
       (SELECT COUNT(*) FROM raw_c) AS n_users_raw,
       (SELECT COUNT(*) FROM ps_c) AS n_users_pseudo,
       (SELECT COUNT(*) FROM raw_c) - (SELECT COUNT(*) FROM ps_c)
         AS collisions,
       (SELECT CAST(SUM(c * c) AS BIGINT) FROM raw_c) AS join_mass_raw,
       (SELECT CAST(SUM(c * c) AS BIGINT) FROM ps_c) AS join_mass_pseudo
""",
    tags=("quality", "privacy", "pseudonymization"),
)
def q342_pseudonymization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity-preserving pseudonymization — the
    privacy-engineering contract behind every shared analytics
    extract: user ids map through an affine permutation modulo a
    prime ((a·uid + b) mod p with gcd(a, p) = 1 — injective over the
    id space, irreversible without the key pair), and the audit
    PROVES the two properties downstream consumers depend on instead
    of trusting the algebra: zero collisions (distinct-count
    preserved), and identical self-join mass Σc² (every key-based
    join/aggregate behaves byte-for-byte the same on pseudonyms).

    Scale shape: the mapping is a scan-stage projection; both
    censuses map-side combine; join mass comes from the censuses
    (never an actual self-join — Σc² over counts is the standard
    join-size estimator, q256's machinery reused as an equality
    proof)."""
    e = load_table(spark, sf_dir, "events")
    p = e.select(
        "user_id",
        ((F.col("user_id") * 7919 + 104729) % 1000003).alias("pseudo"),
    )
    raw_c = p.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    ps_c = p.groupBy("pseudo").agg(F.count(F.lit(1)).alias("c"))
    n_events = p.agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    a1 = raw_c.agg(
        F.count(F.lit(1)).alias("n_users_raw"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("join_mass_raw"),
    )
    a2 = ps_c.agg(
        F.count(F.lit(1)).alias("n_users_pseudo"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("join_mass_pseudo"),
    )
    return (
        n_events.crossJoin(F.broadcast(a1)).crossJoin(F.broadcast(a2))
        .select(
            "n_events",
            "n_users_raw",
            "n_users_pseudo",
            (F.col("n_users_raw") - F.col("n_users_pseudo")).alias("collisions"),
            "join_mass_raw",
            "join_mass_pseudo",
        )
    )
