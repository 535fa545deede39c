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
