"""Lexical corpus statistics — function-word coverage and type-token
ratio. Complements text.py's lang-ID / quality scoring with the two
remaining standard corpus-linguistics filters a pretraining pipeline
applies per document:

* function-word (stopword) coverage — real prose carries a stable
  share of closed-class words; boilerplate, tables and keyword spam
  don't (the C4/Gopher heuristic family);
* type-token ratio — lexical diversity; low TTR flags template/
  repetition documents from a different angle than q86's repeated-
  span detector.

Both are one explode→aggregate pass per document (token counting is
map-local; the only shuffle is the per-doc / per-lang rollup), with a
baked broadcast-literal stopword list — no dictionary join, no UDF,
all integer ppm outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# Closed-class marker words, deliberately tiny and baked as a literal
# (a real deployment would broadcast-join a per-language lexicon; the
# operator shape is identical). Chosen to hit the synthetic corpus'
# vocabulary as well as natural text.
_STOPWORDS = ("a", "the", "of", "to", "and", "in", "is", "on", "for", "data")

_SQL_STOPLIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "q240_stopword_profile",
    oracle=f"""
WITH toks AS (
  SELECT lang, source,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
clean AS (SELECT lang, source, term FROM toks WHERE term <> ''),
per_doc AS (
  SELECT lang, source,
         COUNT(*) AS tokens,
         CAST(SUM(CASE WHEN term IN ({_SQL_STOPLIST}) THEN 1 ELSE 0 END) AS BIGINT)
           AS stop_tokens
  FROM clean GROUP BY lang, source
)
SELECT lang, source, tokens, stop_tokens,
       stop_tokens * 1000000 // tokens AS coverage_ppm
FROM per_doc
""",
    tags=("text", "quality", "stopwords"),
)
def q240_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word coverage per (lang, source): the share of tokens
    drawn from a closed-class marker list, in ppm. The list is a baked
    literal evaluated inside the scan-stage projection (no join); the
    only shuffle is the (lang, source) rollup, and map-side combine
    collapses each partition to the group grid first."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    per = toks.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("tokens"),
        F.sum(
            F.when(F.col("term").isin(*_STOPWORDS), F.lit(1)).otherwise(F.lit(0))
        ).alias("stop_tokens"),
    )
    return per.select(
        "lang",
        "source",
        "tokens",
        "stop_tokens",
        F.expr("stop_tokens * 1000000 div tokens").alias("coverage_ppm"),
    )


@register(
    "q241_type_token_ratio",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
clean AS (SELECT doc_id, lang, term FROM toks WHERE term <> ''),
per_doc AS (
  SELECT doc_id, lang,
         COUNT(*) AS tokens,
         COUNT(DISTINCT term) AS types
  FROM clean GROUP BY doc_id, lang
),
scored AS (
  SELECT doc_id, lang, tokens, types,
         types * 1000000 // tokens AS ttr_ppm
  FROM per_doc
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(MIN(ttr_ppm) AS BIGINT) AS min_ttr_ppm,
       CAST(MAX(ttr_ppm) AS BIGINT) AS max_ttr_ppm,
       CAST(SUM(types) AS BIGINT) * 1000000 // CAST(SUM(tokens) AS BIGINT)
         AS pooled_ttr_ppm,
       CAST(SUM(CASE WHEN ttr_ppm < 300000 THEN 1 ELSE 0 END) AS BIGINT)
         AS low_diversity_docs
FROM scored
GROUP BY lang
""",
    tags=("text", "quality", "diversity"),
)
def q241_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (lexical diversity) per document, rolled up
    per language: distinct-token share in ppm, the pooled corpus TTR,
    and a census of low-diversity documents (TTR < 0.30 — template /
    repetition suspects). The per-doc distinct runs as a two-level
    aggregation: (doc, term) dedup first — map-side combine collapses
    repeats locally — then a count per doc; the language rollup uses
    exact integer sums so the pooled ratio is order-free."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    # two-level distinct: (doc, term) census, then per-doc counts
    dt = toks.groupBy("doc_id", "lang", "term").agg(F.count(F.lit(1)).alias("c"))
    per_doc = dt.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("tokens"),
        F.count(F.lit(1)).alias("types"),
    )
    scored = per_doc.select(
        "doc_id",
        "lang",
        "tokens",
        "types",
        F.expr("types * 1000000 div tokens").alias("ttr_ppm"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ttr_ppm").alias("min_ttr_ppm"),
            F.max("ttr_ppm").alias("max_ttr_ppm"),
            F.sum("types").alias("_types"),
            F.sum("tokens").alias("_tokens"),
            F.sum(
                F.when(F.col("ttr_ppm") < 300000, F.lit(1)).otherwise(F.lit(0))
            ).alias("low_diversity_docs"),
        )
        .select(
            "lang",
            "n_docs",
            "min_ttr_ppm",
            "max_ttr_ppm",
            F.expr("_types * 1000000 div _tokens").alias("pooled_ttr_ppm"),
            "low_diversity_docs",
        )
    )


# q251: fixed-width token windows ("segments") — synthetic docs carry
# no sentence punctuation, so segmentation is positional. Marker sets
# mirror text._LANG_MARKERS (q95) so the per-segment classifier is the
# same heuristic applied at sub-document granularity.
_SEG_TOKENS = 20
_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "und", "das"),
}


def _sql_marker_count(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in _MARKERS[lang])
    return f"CAST(SUM(CASE WHEN term IN ({lst}) THEN 1 ELSE 0 END) AS BIGINT)"


@register(
    "q251_codeswitch_segments",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         (generate_subscripts(string_split(lower(text), ' '), 1) - 1)
           // {_SEG_TOKENS} AS seg,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
seg_scores AS (
  SELECT doc_id, lang, seg,
         {_sql_marker_count("en")} AS s_en,
         {_sql_marker_count("fr")} AS s_fr,
         {_sql_marker_count("es")} AS s_es,
         {_sql_marker_count("de")} AS s_de
  FROM toks GROUP BY doc_id, lang, seg
),
pred AS (
  SELECT doc_id, lang, seg,
         CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
              WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
              WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
              WHEN s_es >= s_de THEN 'es'
              ELSE 'de' END AS p
  FROM seg_scores
),
switches AS (
  SELECT doc_id, lang, p, seg,
         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY seg ASC)
                   IS DISTINCT FROM p
              AND lag(p) OVER (PARTITION BY doc_id ORDER BY seg ASC)
                   IS NOT NULL
              THEN 1 ELSE 0 END AS sw
  FROM pred
),
dom AS (
  SELECT doc_id, p AS dominant_lang, COUNT(*) AS cnt,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY COUNT(*) DESC, p ASC) AS rn
  FROM pred GROUP BY doc_id, p
)
SELECT s.doc_id, s.lang AS actual_lang,
       COUNT(*) AS n_segments,
       CAST(SUM(s.sw) AS BIGINT) AS n_switches,
       MAX(d.dominant_lang) AS dominant_lang,
       CAST(MAX(d.cnt) * 1000000 // COUNT(*) AS BIGINT) AS dominant_seg_ppm
FROM switches s
JOIN (SELECT doc_id, dominant_lang, cnt FROM dom WHERE rn = 1) d
  ON d.doc_id = s.doc_id
GROUP BY s.doc_id, s.lang
""",
    tags=("text", "langid", "codeswitch"),
)
def q251_codeswitch_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching detection: the q95 marker-word language-ID
    applied per 20-token segment, rolled up per document — segment
    count, language switches between adjacent segments, and the
    dominant segment language with its share. Multilingual corpora
    need this BELOW document granularity: a doc-level lang label
    hides embedded runs of another language (the mC4/ROOTS cleaning
    step). One explode pass → (doc, seg) aggregate (map-side combine
    collapses tokens locally), then doc-partitioned windows over the
    tiny segment relation."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "term"),
    ).select(
        "doc_id", "lang", F.expr(f"pos div {_SEG_TOKENS}").alias("seg"), "term"
    )
    score = lambda lang: F.sum(
        F.when(F.col("term").isin(*_MARKERS[lang]), 1).otherwise(0)
    ).alias(f"s_{lang}")
    seg_scores = toks.groupBy("doc_id", "lang", "seg").agg(
        score("en"), score("fr"), score("es"), score("de")
    )
    pred = seg_scores.select(
        "doc_id",
        "lang",
        "seg",
        F.when(F.greatest("s_en", "s_fr", "s_es", "s_de") == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_fr", "s_es", "s_de"), "en")
        .when(F.col("s_fr") >= F.greatest("s_es", "s_de"), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("p"),
    )
    w_seg = Window.partitionBy("doc_id").orderBy(F.col("seg").asc())
    lagged = F.lag("p").over(w_seg)
    switches = pred.select(
        "doc_id",
        "lang",
        "p",
        "seg",
        F.when(lagged.isNotNull() & ~lagged.eqNullSafe(F.col("p")), 1)
        .otherwise(0)
        .alias("sw"),
    )
    dom = (
        pred.groupBy("doc_id", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("p").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("p").alias("dominant_lang"), "cnt")
    )
    return (
        switches.join(dom, "doc_id")
        .groupBy("doc_id", F.col("lang").alias("actual_lang"))
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("sw").alias("n_switches"),
            F.max("dominant_lang").alias("dominant_lang"),
            F.max("cnt").alias("_cnt"),
        )
        .select(
            "doc_id",
            "actual_lang",
            "n_segments",
            "n_switches",
            "dominant_lang",
            F.expr("_cnt * 1000000 div n_segments").alias("dominant_seg_ppm"),
        )
    )


@register(
    "q274_unigram_surprisal",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
clean AS (SELECT doc_id, lang, term FROM toks WHERE term <> ''),
vocab AS (
  SELECT term, COUNT(*) AS cnt FROM clean GROUP BY term
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
scored AS (
  SELECT term, cnt,
         CAST(length(bin(n_total)) - length(bin(cnt)) AS BIGINT) AS surprisal
  FROM vocab CROSS JOIN tot
),
per_doc AS (
  SELECT c.doc_id, c.lang,
         COUNT(*) AS tokens,
         CAST(SUM(s.surprisal) AS BIGINT) AS sum_surprisal
  FROM clean c JOIN scored s ON c.term = s.term
  GROUP BY c.doc_id, c.lang
),
doc_scores AS (
  SELECT doc_id, lang, tokens, sum_surprisal,
         sum_surprisal * 1000 // tokens AS surprisal_milli
  FROM per_doc
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(MIN(surprisal_milli) AS BIGINT) AS min_milli,
       CAST(MAX(surprisal_milli) AS BIGINT) AS max_milli,
       CAST(SUM(sum_surprisal) AS BIGINT) * 1000
         // CAST(SUM(tokens) AS BIGINT) AS pooled_milli,
       CAST(SUM(CASE WHEN surprisal_milli > 9000 THEN 1 ELSE 0 END) AS BIGINT)
         AS high_surprisal_docs
FROM doc_scores
GROUP BY lang
""",
    tags=("text", "quality", "language-model"),
)
def q274_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained unigram-LM surprisal filter (the CCNet/RefinedWeb
    "perplexity bucket" heuristic, libm-free): token surprisal is the
    INTEGER bit-length gap ``floor_log2(N) - floor_log2(count)``
    computed as ``length(bin(N)) - length(bin(cnt))`` — both engines
    render ``bin()`` identically for positive BIGINTs, so the score
    involves no floating point at all. Per-doc mean surprisal in
    milli-bits, rolled up per language with a census of
    high-surprisal documents (gibberish / OOV-dense suspects).

    Plan shape: one explode pass feeds BOTH the vocabulary census and
    the per-doc join probe; the vocab census is shuffled on term (at
    100 TB the vocabulary itself is cluster-scale — never collected
    or broadcast by hand; AQE may still choose broadcast when it
    measures small), then per-doc and per-lang rollups are ordinary
    partial-aggregated shuffles."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("long").alias("n_total"))
    scored = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        (F.length(F.bin(F.col("n_total"))) - F.length(F.bin(F.col("cnt"))))
        .cast("long")
        .alias("surprisal"),
    )
    per_doc = (
        toks.join(scored, "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("tokens"),
            F.sum("surprisal").alias("sum_surprisal"),
        )
        .select(
            "doc_id",
            "lang",
            "tokens",
            "sum_surprisal",
            F.expr("sum_surprisal * 1000 div tokens").alias("surprisal_milli"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("surprisal_milli").alias("min_milli"),
            F.max("surprisal_milli").alias("max_milli"),
            F.sum("sum_surprisal").alias("_sum_s"),
            F.sum("tokens").alias("_sum_t"),
            F.sum(
                F.when(F.col("surprisal_milli") > 9000, F.lit(1)).otherwise(F.lit(0))
            ).alias("high_surprisal_docs"),
        )
        .select(
            "lang",
            "n_docs",
            "min_milli",
            "max_milli",
            F.expr("_sum_s * 1000 div _sum_t").alias("pooled_milli"),
            "high_surprisal_docs",
        )
    )
