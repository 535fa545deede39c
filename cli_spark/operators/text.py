"""Text-analysis operators over `documents` — the LLM-pipeline text
surface: tokenization + term counts, TF-IDF, quality scoring, token
counting (whitespace + regex), document fingerprinting, and a
heuristic language-ID operator.

Everything is built-in expression work (split/explode/regexp/agg) —
tokenization of 100 TB of text stays inside whole-stage codegen; no
Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.functions.determinism import sql_davg
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_STOPWORDS = ["the", "a", "of", "and", "to", "in"]
_SQL_STOPWORDS = "['" + "', '".join(_STOPWORDS) + "']"


@register(
    "q90_term_counts",
    oracle="""
SELECT term, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS doc_freq
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
WHERE term != ''
GROUP BY term
ORDER BY occurrences DESC, term
LIMIT 20
""",
    tags=("text", "tokenize"),
)
def q90_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 terms: tokenize → explode → count. The
    shuffle key is the term (map-side partial counts first), so the
    wide explode never leaves the mapper un-aggregated."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("occurrences").desc(), F.col("term"))
        .limit(20)
    )


@register(
    "q91_tfidf_top_terms",
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens WHERE term != '' GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens WHERE term != '' GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3 AND doc_id < 50
""",
    tags=("text", "tfidf"),
)
def q91_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (smoothed idf). The doc-freq
    side is tiny after aggregation → broadcast back onto the term
    stream; ln() rounded to 6dp for cross-libm stability.

    The final `doc_id < 50` output cut is pushed into the TF branch
    BEFORE the per-doc aggregation: ranking is per-document, so
    restricting the TF/window side early is semantics-preserving,
    while document frequencies still aggregate over the FULL corpus.
    At scale this is the 'score a target slice against global idf'
    shape — the heavy explode runs once for df, and the tf/join/
    window pipeline touches only the requested docs."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        tokens.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a 1-row broadcast relation — no driver-side action
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)  # doc_id < 50 already pushed into tf
        .select("doc_id", "term", "tfidf", "rnk")
    )


@register(
    "q92_lang_quality_stats",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, source, n_chars,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '), x -> list_contains({_SQL_STOPWORDS}, x))) AS n_stop
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stopword_ratio,
       CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens) AS chars_per_token
FROM tok
GROUP BY lang
""",
    tags=("text", "quality"),
)
def q92_lang_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality profile: doc/source counts, char & token
    totals, stopword ratio, chars-per-token (integer sums → exact
    double ratios)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    low_words = F.split(F.lower("text"), " ")
    tok = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(words).alias("n_tokens"),
        F.size(F.filter(low_words, lambda x: F.array_contains(stop_arr, x))).alias("n_stop"),
    )
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_stop").cast("double") / F.sum("n_tokens")).alias("stopword_ratio"),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias("chars_per_token"),
    )


@register(
    "q93_token_count_stats",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len(list_filter(string_split(text, ' '), x -> x != '')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / len(list_filter(string_split(text, ' '), x -> x != '')) AS avg_token_len
FROM documents
WHERE doc_id % 5 = 0
""",
    tags=("text", "tokens"),
)
def q93_token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, alpha-run regex,
    and a BPE-ish regex (alnum runs + single non-alnum marks) — the
    cheap pre-tokenizer census used to size LLM training corpora."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    ws_tokens = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        ws_tokens.alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("alpha_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / ws_tokens).alias(
            "avg_token_len"
        ),
    )


@register(
    "q94_doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint,
       substr(md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))), 1, 8) AS short_fp
FROM documents
""",
    tags=("text", "fingerprint"),
)
def q94_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizing document fingerprint: lowercase → collapse
    whitespace → trim → md5 (the exact-dedup key robust to spacing
    differences)."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    fp = F.md5(F.encode(canon, "utf-8"))
    return d.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("short_fp"))


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
    "de": ["der", "und", "das"],
    "zh": ["zh1", "zh2", "zh3"],
}


@register(
    "q95_lang_id_heuristic",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_intersect(string_split(lower(text), ' '), ['the','and','of'])) AS s_en,
         len(list_intersect(string_split(lower(text), ' '), ['le','la','et'])) AS s_fr,
         len(list_intersect(string_split(lower(text), ' '), ['el','los','y'])) AS s_es,
         len(list_intersect(string_split(lower(text), ' '), ['der','und','das'])) AS s_de
  FROM documents
)
SELECT doc_id, lang AS actual_lang,
       CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
            WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
            WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS predicted_lang,
       s_en, s_fr, s_es, s_de
FROM scored
""",
    tags=("text", "langid"),
)
def q95_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: score each language's
    marker set against the token set, argmax with fixed precedence
    (en > fr > es > de) so ties are deterministic. On this synthetic
    corpus most docs score 'unknown' — the operator shape (n
    marker-set intersections + argmax) is what's exercised."""
    d = load_table(spark, sf_dir, "documents")
    low_words = F.array_distinct(F.split(F.lower("text"), " "))
    scores = {
        k: F.size(F.array_intersect(low_words, F.array(*[F.lit(m) for m in ms])))
        for k, ms in _LANG_MARKERS.items()
        if k != "zh"
    }
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        scores["en"].alias("s_en"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
    )
    return scored.select(
        "doc_id",
        "actual_lang",
        F.when(F.greatest("s_en", "s_fr", "s_es", "s_de") == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_fr", "s_es", "s_de"), "en")
        .when(F.col("s_fr") >= F.greatest("s_es", "s_de"), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("predicted_lang"),
        "s_en",
        "s_fr",
        "s_es",
        "s_de",
    )


@register(
    "q206_bpe_pair_census",
    oracle="""
WITH w AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
  FROM documents
),
pairs AS (
  SELECT substr(word, s.i, 2) AS pair
  FROM w, unnest(generate_series(1, length(word) - 1)) AS s(i)
  WHERE length(word) >= 2
),
counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM pairs GROUP BY pair
),
tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS total FROM counted)
SELECT c.pair, c.n_occurrences,
       CAST(c.n_occurrences * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (ORDER BY c.n_occurrences DESC, c.pair) AS BIGINT)
         AS merge_rank
FROM counted c CROSS JOIN tot t
ORDER BY merge_rank
LIMIT 30
""",
    tags=("text", "tokenizer", "bpe"),
)
def q206_bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First merge round of byte-pair-encoding tokenizer training
    (Gage 1994; Sennrich et al. 2016): count every adjacent character
    pair inside every word occurrence across the corpus and rank the
    top-30 merge candidates — the argmax of this census IS the first
    BPE merge, and iterating it (re-pairing after each merge) is
    tokenizer training.

    Scale shape: the pair explode is linear in corpus characters and
    collapses immediately through a map-side combined groupBy to at
    most |alphabet|² rows; the normalizing total is a broadcast 1-row
    cross join; the top-30 is a TakeOrdered over the tiny pair table.
    No Python touches the row path — substring pairing stays inside
    whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("word")
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    tot = counted.agg(F.sum("n_occurrences").cast("long").alias("total"))
    ranked = counted.crossJoin(F.broadcast(tot)).select(
        "pair",
        "n_occurrences",
        F.expr("n_occurrences * 1000000 div total").cast("long").alias("share_ppm"),
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), "pair")
    return (
        ranked.withColumn("merge_rank", F.row_number().over(w).cast("long"))
        .orderBy("merge_rank")
        .limit(30)
    )


@register(
    "q207_langid_confusion",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_intersect(string_split(lower(text), ' '), ['the','and','of'])) AS s_en,
         len(list_intersect(string_split(lower(text), ' '), ['le','la','et'])) AS s_fr,
         len(list_intersect(string_split(lower(text), ' '), ['el','los','y'])) AS s_es,
         len(list_intersect(string_split(lower(text), ' '), ['der','und','das'])) AS s_de
  FROM documents
),
pred AS (
  SELECT lang AS actual_lang,
         CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
              WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
              WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
              WHEN s_es >= s_de THEN 'es'
              ELSE 'de' END AS predicted_lang
  FROM scored
),
cells AS (
  SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY actual_lang, predicted_lang
),
rows_tot AS (
  SELECT actual_lang, CAST(SUM(n_docs) AS BIGINT) AS row_total FROM cells
  GROUP BY actual_lang
)
SELECT c.actual_lang, c.predicted_lang, c.n_docs,
       CAST(c.n_docs * 1000000 // r.row_total AS BIGINT) AS row_share_ppm,
       c.actual_lang = c.predicted_lang AS agree
FROM cells c JOIN rows_tot r ON c.actual_lang = r.actual_lang
""",
    tags=("text", "langid", "audit"),
)
def q207_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: the confusion matrix between the corpus's
    claimed `lang` column and q95's marker-word language-ID — the
    standard check before trusting either signal for filtering or
    temperature sampling (q203). Each cell carries its share of the
    actual-language row in ppm; `agree` marks the diagonal.

    Scale shape: the per-doc prediction is a pure projection (no
    shuffle); the matrix is a map-side combined groupBy to at most
    |langs|² cells; row totals re-aggregate the cells (never a second
    corpus scan) and join back on the tiny cell relation."""
    d = load_table(spark, sf_dir, "documents")
    low_words = F.array_distinct(F.split(F.lower("text"), " "))
    scores = {
        k: F.size(F.array_intersect(low_words, F.array(*[F.lit(m) for m in ms])))
        for k, ms in _LANG_MARKERS.items()
        if k != "zh"
    }
    pred = d.select(
        F.col("lang").alias("actual_lang"),
        scores["en"].alias("s_en"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
    ).select(
        "actual_lang",
        F.when(F.greatest("s_en", "s_fr", "s_es", "s_de") == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_fr", "s_es", "s_de"), "en")
        .when(F.col("s_fr") >= F.greatest("s_es", "s_de"), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("predicted_lang"),
    )
    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    rows_tot = cells.groupBy("actual_lang").agg(
        F.sum("n_docs").cast("long").alias("row_total")
    )
    return cells.join(rows_tot, "actual_lang").select(
        "actual_lang",
        "predicted_lang",
        "n_docs",
        F.expr("n_docs * 1000000 div row_total").cast("long").alias("row_share_ppm"),
        (F.col("actual_lang") == F.col("predicted_lang")).alias("agree"),
    )


@register(
    "q225_inverted_index",
    oracle="""
WITH inc AS (
  SELECT DISTINCT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
  FROM documents
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM inc GROUP BY term
),
top_terms AS (
  SELECT term, doc_freq FROM df ORDER BY doc_freq DESC, term ASC LIMIT 20
),
postings AS (
  SELECT i.term,
         array_to_string(list_slice(list_sort(list(i.doc_id)), 1, 50), ',') AS posting_head,
         CAST(SUM(i.doc_id) AS BIGINT) AS posting_checksum
  FROM inc i JOIN top_terms t ON i.term = t.term
  GROUP BY i.term
)
SELECT t.term, t.doc_freq, p.posting_head, p.posting_checksum
FROM top_terms t JOIN postings p ON t.term = p.term
""",
    tags=("text", "index", "ir"),
)
def q225_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build for the top-20 document-frequency terms:
    per term, the head of its sorted posting list (first 50 doc ids,
    CSV-rendered for engine-portable comparison) and a full-list
    checksum (sum of doc ids — order-free, so it verifies the WHOLE
    posting set while only the head ships). This is the core IR
    structure a search layer materializes from the corpus.

    Scale shape: distinct (doc, term) incidence with map-side
    combine; the df census picks top terms via TakeOrdered; postings
    aggregate only rows matching the broadcast top-term set. At
    100 TB posting lists shard by term hash — the same groupBy key."""
    d = load_table(spark, sf_dir, "documents")
    inc = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("term"),
        )
        .distinct()
    )
    df_ = inc.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    top_terms = df_.orderBy(F.col("doc_freq").desc(), F.col("term").asc()).limit(20)
    postings = (
        inc.join(F.broadcast(top_terms.select("term")), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 50), ","
            ).alias("posting_head"),
            F.sum("doc_id").cast("long").alias("posting_checksum"),
        )
    )
    return top_terms.join(postings, "term").select(
        "term", "doc_freq", "posting_head", "posting_checksum"
    )


@register(
    "q258_vocab_coverage",
    oracle="""
WITH w AS (
  SELECT lang,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
  FROM documents
),
pairs AS (
  SELECT lang, substr(word, s.i, 2) AS pair
  FROM w, unnest(generate_series(1, length(word) - 1)) AS s(i)
  WHERE length(word) >= 2
),
by_lang AS (
  SELECT lang, pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY lang, pair
),
vocab AS (
  SELECT pair FROM (
    SELECT pair, SUM(n) AS tot FROM by_lang GROUP BY pair
    ORDER BY tot DESC, pair ASC LIMIT 30
  )
)
SELECT b.lang,
       CAST(SUM(b.n) AS BIGINT) AS total_pairs,
       CAST(SUM(CASE WHEN v.pair IS NOT NULL THEN b.n ELSE 0 END) AS BIGINT)
         AS covered_pairs,
       CAST(SUM(CASE WHEN v.pair IS NOT NULL THEN b.n ELSE 0 END) * 1000000
            // SUM(b.n) AS BIGINT) AS coverage_ppm
FROM by_lang b LEFT JOIN vocab v ON v.pair = b.pair
GROUP BY b.lang
""",
    tags=("text", "tokenizer", "coverage"),
)
def q258_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: what share of each
    language's adjacent-pair occurrences the global top-30 BPE merge
    vocabulary (q206's census head) covers — the per-language fairness
    check run after every tokenizer training round (a vocab trained on
    the majority language under-covers the rest; this query measures
    exactly that, in ppm). The pair stream collapses per (lang, pair)
    map-side; the global vocab is a TakeOrdered over the pair table
    and broadcasts back onto the per-lang census — the facts are
    touched once."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("word"),
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
    )
    by_lang = pairs.groupBy("lang", "pair").agg(F.count(F.lit(1)).cast("long").alias("n"))
    vocab = (
        by_lang.groupBy("pair")
        .agg(F.sum("n").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("pair").asc())
        .limit(30)
        .select("pair", F.lit(1).alias("in_vocab"))
    )
    return (
        by_lang.join(F.broadcast(vocab), "pair", "left")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("total_pairs"),
            F.sum(F.when(F.col("in_vocab").isNotNull(), F.col("n")).otherwise(0))
            .alias("covered_pairs"),
        )
        .select(
            "lang",
            "total_pairs",
            "covered_pairs",
            F.expr("covered_pairs * 1000000 div total_pairs").alias("coverage_ppm"),
        )
    )


@register(
    "q270_lexical_cosine_pairs",
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens WHERE term != ''
       GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens WHERE term != ''
       GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) * 1000.0, 0)
              AS BIGINT) AS wq
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
  WHERE df.df <= 25
),
norms AS (SELECT doc_id, CAST(SUM(wq * wq) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.wq * b.wq) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b,
       CAST(floor(CAST(d.dot AS DOUBLE) * 1000000.0
            / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))) AS BIGINT)
         AS cos_ppm
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
WHERE CAST(floor(CAST(d.dot AS DOUBLE) * 1000000.0
           / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))) AS BIGINT)
      >= 300000
""",
    tags=("text", "tfidf", "similarity"),
)
def q270_lexical_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical (TF-IDF) cosine similarity pairs — the
    inverted-index similarity join (Bayardo et al. 2007 "Scaling Up
    All Pairs Similarity Search" family): vectors over RARE terms
    only (df ≤ 25 — the prefix-filtering idea: frequent terms carry
    no discriminating signal and explode the posting join), pair dot
    products via the term-postings equi-join, cosine ≥ 0.30 emitted.
    Weights are q91's smoothed TF-IDF quantized at 1e-3 (round —
    same cross-libm stability contract as q91), so dots and norms
    are exact integers; the final cosine uses the identical-IEEE
    floor(·1e6/sqrt) expression. Posting-join fan-out is bounded by
    df² per term — the df cap makes the pair space linear-ish in
    corpus size, never all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= 25)
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
                * F.lit(1000.0),
                0,
            ).cast("long").alias("wq"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    a = w.select(F.col("doc_id").alias("doc_a"), "term", F.col("wq").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term", F.col("wq").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.floor(
        F.col("dot").cast("double") * F.lit(1000000.0)
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return (
        dots.join(norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na")), "doc_a")
        .join(norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb")), "doc_b")
        .select("doc_a", "doc_b", cos.cast("long").alias("cos_ppm"))
        .filter(F.col("cos_ppm") >= 300000)
    )


@register(
    "q278_bpe_round2",
    oracle="""
WITH w AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
  FROM documents
),
c1 AS (
  SELECT substr(word, s.i, 2) AS pair
  FROM w, unnest(generate_series(1, length(word) - 1)) AS s(i)
  WHERE length(word) >= 2
),
c1c AS (
  SELECT pair, COUNT(*) AS n FROM c1
  WHERE regexp_matches(pair, '^[a-z0-9]{2}$')
  GROUP BY pair
),
top1 AS (SELECT pair AS mpair FROM c1c ORDER BY n DESC, pair ASC LIMIT 1),
wm AS (
  SELECT word, mpair, string_split(word, mpair) AS segs
  FROM w CROSS JOIN top1
),
symed AS (
  SELECT
    list_concat(
      list_transform(generate_series(1, length(segs[1])), i -> (segs[1])[i]),
      flatten(list_transform(segs[2:], s ->
        list_concat([mpair],
                    list_transform(generate_series(1, length(s)), i -> s[i]))))
    ) AS sym
  FROM wm
),
p2 AS (
  SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
                               i -> sym[i] || '+' || sym[i + 1])) AS pair
  FROM symed
),
counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM p2 GROUP BY pair
),
tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS total FROM counted)
SELECT t1.mpair AS merged_pair, c.pair, c.n_occurrences,
       CAST(c.n_occurrences * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(row_number() OVER (ORDER BY c.n_occurrences DESC, c.pair)
            AS BIGINT) AS merge_rank
FROM counted c CROSS JOIN tot t CROSS JOIN top1 t1
ORDER BY merge_rank
LIMIT 30
""",
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def q278_bpe_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND merge round of BPE tokenizer training — the iteration
    q206 promises: elect merge #1 (argmax of the round-1 adjacent-pair
    census, restricted to ``[a-z0-9]{2}`` so the winner is always
    regex-inert as a split pattern), APPLY it — every word becomes its
    post-merge symbol sequence, built engine-side with split/slice/
    flatten higher-order functions (split is leftmost-non-overlapping
    greedy in BOTH engines, verified incl. the 'aaa'/'aa' overlap
    case) — then re-census adjacent SYMBOL pairs and rank the top-30
    merge-#2 candidates.

    Scale shape: the merge winner is a 1-row TakeOrdered relation
    broadcast onto the corpus (never collected to the driver); symbol
    rebuilding is per-row HOF projection inside codegen; both censuses
    partial-aggregate map-side. Iterating k merge rounds is k chained
    copies of this plan."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("word")
    )
    pairs1 = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    census1 = (
        pairs1.filter(F.col("pair").rlike("^[a-z0-9]{2}$"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top1 = (
        census1.orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(1)
        .select(F.col("pair").alias("mpair"))
    )
    wm = words.crossJoin(F.broadcast(top1)).withColumn(
        "segs", F.expr("split(word, mpair)")
    )
    # chars(s) engine-safely: slice(split(s, ''), 1, length(s)) makes
    # chars('') = [] (split('','') is [''] in both engines).
    symed = wm.select(
        F.expr(
            "concat("
            " slice(split(element_at(segs, 1), ''), 1, length(element_at(segs, 1))),"
            " flatten(transform(slice(segs, 2, size(segs) - 1),"
            "   s -> concat(array(mpair), slice(split(s, ''), 1, length(s)))))"
            ")"
        ).alias("sym")
    )
    p2 = symed.select(
        F.explode(
            F.expr(
                "CASE WHEN size(sym) >= 2 THEN"
                " transform(sequence(1, size(sym) - 1),"
                "   i -> concat(element_at(sym, i), '+', element_at(sym, i + 1)))"
                " ELSE array() END"
            )
        ).alias("pair")
    )
    counted = p2.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    tot = counted.agg(F.sum("n_occurrences").cast("long").alias("total"))
    w = Window.orderBy(F.col("n_occurrences").desc(), "pair")
    return (
        counted.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(top1))
        .select(
            F.col("mpair").alias("merged_pair"),
            "pair",
            "n_occurrences",
            F.expr("n_occurrences * 1000000 div total").cast("long").alias("share_ppm"),
        )
        .withColumn("merge_rank", F.row_number().over(w).cast("long"))
        .orderBy("merge_rank")
        .limit(30)
    )


@register(
    "q296_bm25_scores",
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
clean AS (SELECT doc_id, term FROM tokens WHERE term != ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM clean GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM clean GROUP BY doc_id),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM clean GROUP BY term),
corpus AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl
),
scored AS (
  SELECT tf.doc_id, tf.term,
         (c.n_docs - df.df) * 1000000 // c.n_docs AS idf_ppm,
         tf.tf * 2200 AS num_milli,
         tf.tf * 1000 + 1200 * (250 + 750 * dl.dl * c.n_docs
                                // c.total_tokens) // 1000 AS den_milli
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN corpus c
),
ranked AS (
  SELECT doc_id, term,
         idf_ppm * num_milli // den_milli AS bm25_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY idf_ppm * num_milli // den_milli DESC,
                                     term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, bm25_micro, rnk
FROM ranked WHERE rnk <= 5 AND doc_id % 10 = 0
""",
    tags=("text", "bm25", "retrieval"),
)
def q296_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 term ranking (Robertson–Spärck Jones family) in EXACT
    integer arithmetic — the retrieval scorer behind every lexical
    search engine, here with k1 = 1.2, b = 0.75 scaled to milli-units
    and a rational idf proxy (N − df)/N in ppm (the probabilistic
    idf numerator — transcendental-free, so the score is bit-stable
    across engines; q91 carries the classic ln() form). Per-doc top-5
    terms for the doc_id % 10 sample slice, with the q91 optimization:
    the output slice pushes into the tf branch while document
    frequencies and the average document length aggregate over the
    FULL corpus — the "score a slice against global statistics"
    shape. Length normalization is the real BM25 saturation curve:
    den = tf + k1·(1 − b + b·dl/avgdl), all floor-divided in a fixed
    order mirrored on both sides."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf_all = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    sliced = tf_all.filter(F.col("doc_id") % 10 == 0)
    scored = (
        sliced.join(dl, "doc_id")
        .join(df, "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            F.expr("(n_docs - df) * 1000000 div n_docs").alias("idf_ppm"),
            F.expr("tf * 2200").alias("num_milli"),
            F.expr(
                "tf * 1000 + 1200 * (250 + 750 * dl * n_docs div total_tokens)"
                " div 1000"
            ).alias("den_milli"),
        )
    )
    from pyspark.sql.window import Window

    score = F.expr("idf_ppm * num_milli div den_milli")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term").asc())
    return (
        scored.withColumn("bm25_micro", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "bm25_micro", "rnk")
    )
