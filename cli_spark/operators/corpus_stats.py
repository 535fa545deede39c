"""Corpus-statistics and quality-gate operators (round 2): the
census stage of a training-data build — Gopher-style per-document
quality rules, cross-document repeated-span detection (the C4
"remove duplicated spans" step, adapted to span granularity because
the corpus has no line breaks), Zipf rank/coverage statistics, and a
document-length histogram with a cumulative distribution.

Reference parity: gmalt/cli has no text stage (it is an elevation
ETL; SURVEY.md §2 Tier A); these are Tier-B mandated LLM-pipeline
operators (SURVEY.md §2 "LLM-data-pipeline operators", BASELINE.json:6).

Design for 100 TB:
* q162 is a pure per-row projection — no shuffle at all until the
  driver collects; at scale it is a single map stage fused into the
  parquet scan (verdicts ride along with the row).
* q163 pre-aggregates shingles to DISTINCT (doc, span) pairs before
  the global span census, so the join back is keyed on the span hash
  — the same two-phase shape as q151's decontamination join.
* q164/q165 aggregate to tiny result sets (vocabulary / bucket
  cardinality) with map-side partial aggregation; the window over the
  ranked vocabulary runs on the already-collapsed term table.
* All ratios cross the engine boundary as exact integers
  (floor(a*1e6/b) ppm — determinism-layer contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.operators.text import _SQL_STOPWORDS, _STOPWORDS
from cli_spark.operators.dedup import _SQL_SHINGLES as _SQL_SHINGLES_CS
from cli_spark.operators.training import _SQL_WORDS, _words_col
from cli_spark.plans.registry import register
from cli_spark.tables import load_table


# q162's oracle, exposed as a constant so q487's cascade-ordering
# oracle can embed the identical gate definitions (round 14).
_GOPHER_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, {_SQL_WORDS} AS words FROM documents
),
tf AS (
  SELECT doc_id, MAX(cnt) AS top_freq
  FROM (
    SELECT doc_id, u.w AS term, COUNT(*) AS cnt
    FROM w, unnest(words) AS u(w)
    GROUP BY doc_id, u.w
  ) GROUP BY doc_id
),
feat AS (
  SELECT w.doc_id, w.lang,
         len(words) AS n_words,
         CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS n_letters,
         len(list_distinct(words)) AS n_distinct,
         len(list_filter(list_distinct(words),
                         x -> list_contains({_SQL_STOPWORDS}, x))) AS n_stop_distinct,
         tf.top_freq
  FROM w JOIN tf ON w.doc_id = tf.doc_id
)
SELECT doc_id, lang, n_words, n_distinct, top_freq,
       CAST(floor(CAST(n_letters * 1000000 AS DOUBLE) / n_words) AS BIGINT) AS mean_word_len_ppm,
       n_words BETWEEN 20 AND 80 AS ok_length,
       n_letters * 10 >= n_words * 30 AND n_letters * 10 <= n_words * 100 AS ok_word_len,
       n_stop_distinct >= 2 AS ok_stopwords,
       top_freq * 5 <= n_words AS ok_dominance,
       n_distinct * 2 >= n_words AS ok_diversity,
       (n_words BETWEEN 20 AND 80)
         AND (n_letters * 10 >= n_words * 30 AND n_letters * 10 <= n_words * 100)
         AND n_stop_distinct >= 2
         AND top_freq * 5 <= n_words
         AND n_distinct * 2 >= n_words AS keep
FROM feat
"""


@register(
    "q162_gopher_rules",
    oracle=_GOPHER_ORACLE,
    tags=("training", "quality", "gopher"),
)
def q162_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality gates (Rae et al. 2021,
    adapted to this corpus's lowercase-word alphabet): word-count band
    [20, 80], mean word length in [3, 10] letters, at least two
    distinct stopwords present, no single term above 20% of the
    document, and a distinct-word ratio of at least 0.5. Every rule is
    exact integer arithmetic (cross-multiplied bounds, ppm means — no
    float thresholds), so the keep verdict is bit-identical in both
    engines.

    Scale: one pass, zero shuffles — all five gates are per-row
    projections over the tokenized text (the per-doc term frequency is
    a local array aggregate, not a groupBy)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", _words_col().alias("words"))
    # top term frequency without leaving the row: sort the words array,
    # then the longest run of equal adjacent words = max frequency.
    run = F.aggregate(
        F.sort_array("words"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    feat = words.select(
        "doc_id",
        "lang",
        F.size("words").alias("n_words"),
        F.aggregate(
            F.transform("words", lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_letters"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.size(
            F.filter(
                F.array_distinct("words"), lambda x: F.array_contains(stop_arr, x)
            )
        ).alias("n_stop_distinct"),
        run.alias("top_freq"),
    )
    ok_length = F.col("n_words").between(20, 80)
    ok_word_len = (F.col("n_letters") * 10 >= F.col("n_words") * 30) & (
        F.col("n_letters") * 10 <= F.col("n_words") * 100
    )
    ok_stop = F.col("n_stop_distinct") >= 2
    ok_dom = F.col("top_freq") * 5 <= F.col("n_words")
    ok_div = F.col("n_distinct") * 2 >= F.col("n_words")
    return feat.select(
        "doc_id",
        "lang",
        "n_words",
        "n_distinct",
        "top_freq",
        F.floor(F.col("n_letters").cast("double") * 1000000 / F.col("n_words"))
        .cast("long")
        .alias("mean_word_len_ppm"),
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_dom.alias("ok_dominance"),
        ok_div.alias("ok_diversity"),
        (ok_length & ok_word_len & ok_stop & ok_dom & ok_div).alias("keep"),
    )


_SPAN_N = 10  # repeated-span granularity (words)


@register(
    "q163_repeated_spans",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_SQL_WORDS} AS words FROM documents
),
spans AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(words, s.i, s.i + {_SPAN_N} - 1), ' ') AS span
  FROM w, unnest(generate_series(1, len(words) - {_SPAN_N} + 1)) AS s(i)
  WHERE len(words) >= {_SPAN_N}
),
census AS (
  SELECT span, COUNT(*) AS n_docs_with FROM spans GROUP BY span
),
per_doc AS (
  SELECT s.doc_id,
         COUNT(*) AS n_spans,
         CAST(SUM(CASE WHEN c.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM spans s JOIN census c ON s.span = c.span
  GROUP BY s.doc_id
)
SELECT doc_id, n_spans, n_shared,
       CAST(floor(CAST(n_shared * 1000000 AS DOUBLE) / n_spans) AS BIGINT) AS shared_ppm,
       n_shared > 0 AS has_cross_doc_spans
FROM per_doc
""",
    tags=("training", "dedup", "spans"),
)
def q163_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span census — the C4 "discard spans
    duplicated across documents" step at 10-word granularity (this
    corpus has no line breaks, so spans stand in for lines): for each
    document, how many of its distinct 10-word spans also occur in at
    least one other document.

    Scale: spans collapse to DISTINCT (doc, span) before the global
    census, the census groupBy is map-side combined on the span key,
    and the join back is span-hash keyed — identical two-phase shape
    to q151's decontamination join. At 100 TB the span string would be
    replaced by xxhash64(span) before the shuffle (8-byte keys)."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    words = d.select("doc_id", _words_col().alias("words")).filter(
        F.size("words") >= _SPAN_N
    )
    spans = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - _SPAN_N + 1),
                lambda i: F.array_join(F.slice("words", i, _SPAN_N), " "),
            )
        ).alias("span"),
    ).distinct()
    census = spans.groupBy("span").agg(F.count(F.lit(1)).alias("n_docs_with"))
    per_doc = (
        spans.join(census, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_shared",
        F.floor(F.col("n_shared").cast("double") * 1000000 / F.col("n_spans"))
        .cast("long")
        .alias("shared_ppm"),
        (F.col("n_shared") > 0).alias("has_cross_doc_spans"),
    )


@register(
    "q164_zipf_stats",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
tf AS (
  SELECT u.w AS term, COUNT(*) AS freq
  FROM w, unnest(words) AS u(w)
  GROUP BY u.w
),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM tf),
ranked AS (
  SELECT term, freq, row_number() OVER (ORDER BY freq DESC, term) AS rnk
  FROM tf
)
SELECT r.rnk, r.term, CAST(r.freq AS BIGINT) AS freq,
       CAST(r.freq * r.rnk AS BIGINT) AS freq_times_rank,
       CAST(floor(CAST(SUM(r.freq) OVER (ORDER BY r.rnk) * 1000000 AS DOUBLE)
                  / t.total) AS BIGINT) AS cum_coverage_ppm
FROM ranked r CROSS JOIN tot t
WHERE r.rnk <= 50
""",
    tags=("training", "zipf", "stats"),
)
def q164_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law census of the corpus vocabulary: top-50 terms by
    frequency with rank, the freq×rank product (constant under an
    ideal Zipf distribution — the classic eyeball check), and the
    cumulative token coverage in ppm (how much of the corpus the top-k
    vocabulary explains — the statistic that sizes tokenizer vocabs).

    Scale: term counts are map-side combined before one shuffle on the
    term; the top-50 cut is an orderBy().limit() — Spark compiles it
    to TakeOrderedAndProject (per-partition heaps + driver merge of
    50-row heads), so NO vocab-sized relation ever passes through a
    single-partition window; ranking then runs over the bounded
    50-row result, and the corpus total rides in as a broadcast
    1-row relation."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_words_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = tf.agg(F.sum("freq").cast("long").alias("total"))
    top50 = tf.orderBy(F.col("freq").desc(), "term").limit(50)
    ranked = top50.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("freq").desc(), "term"))
    )
    cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rnk",
            "term",
            F.col("freq").cast("long").alias("freq"),
            (F.col("freq") * F.col("rnk")).cast("long").alias("freq_times_rank"),
            F.floor(
                F.sum("freq").over(cum).cast("double") * 1000000 / F.col("total")
            )
            .cast("long")
            .alias("cum_coverage_ppm"),
        )
    )


@register(
    "q165_length_histogram",
    oracle=f"""
WITH w AS (
  SELECT doc_id, len({_SQL_WORDS}) AS n_words FROM documents
),
b AS (
  SELECT CAST(floor(n_words / 10) * 10 AS BIGINT) AS bucket_lo,
         COUNT(*) AS n_docs,
         CAST(SUM(n_words) AS BIGINT) AS total_words
  FROM w GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs FROM b)
SELECT b.bucket_lo, b.n_docs, b.total_words,
       CAST(floor(CAST(SUM(b.n_docs) OVER (ORDER BY b.bucket_lo) * 1000000 AS DOUBLE)
                  / t.all_docs) AS BIGINT) AS cdf_ppm
FROM b CROSS JOIN tot t
""",
    tags=("training", "histogram", "stats"),
)
def q165_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (10-word buckets) with an exact
    cumulative distribution in ppm — the shape check run before
    choosing sequence-packing lengths for training.

    Scale: per-row bucket assignment, one map-side-combined groupBy on
    ~10 buckets, then a window over the bucket table (tiny)."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select((F.size(_words_col())).alias("n_words"))
    b = w.groupBy(
        (F.floor(F.col("n_words") / 10) * 10).cast("long").alias("bucket_lo")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
    )
    total = b.agg(F.sum("n_docs").cast("long").alias("all_docs"))
    cum = Window.orderBy("bucket_lo").rowsBetween(Window.unboundedPreceding, 0)
    return b.crossJoin(F.broadcast(total)).select(
        "bucket_lo",
        "n_docs",
        "total_words",
        F.floor(F.sum("n_docs").over(cum).cast("double") * 1000000 / F.col("all_docs"))
        .cast("long")
        .alias("cdf_ppm"),
    )


@register(
    "q201_exact_substring_scrub",
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_SQL_WORDS} AS words FROM documents
),
pos AS (
  SELECT doc_id, s.i AS i,
         array_to_string(list_slice(words, s.i, s.i + {_SPAN_N} - 1), ' ') AS span
  FROM w, unnest(generate_series(1, len(words) - {_SPAN_N} + 1)) AS s(i)
  WHERE len(words) >= {_SPAN_N}
),
census AS (
  SELECT span, COUNT(*) AS n_docs_with
  FROM (SELECT DISTINCT doc_id, span FROM pos)
  GROUP BY span
),
dup_pos AS (
  SELECT p.doc_id, p.i, p.i + {_SPAN_N} - 1 AS ie
  FROM pos p JOIN census c ON p.span = c.span
  WHERE c.n_docs_with > 1
),
islands AS (
  SELECT doc_id, i, ie,
         CASE WHEN MAX(ie) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   >= i - 1
              THEN 0 ELSE 1 END AS new_island
  FROM dup_pos
),
numbered AS (
  SELECT doc_id, i, ie,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM islands
),
merged AS (
  SELECT doc_id, island_id, MIN(i) AS lo, MAX(ie) AS hi
  FROM numbered GROUP BY doc_id, island_id
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(SUM(hi - lo + 1) AS BIGINT) AS n_dup_words
  FROM merged GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.words) AS INTEGER) AS n_words,
       COALESCE(p.n_islands, 0) AS n_islands,
       COALESCE(p.n_dup_words, 0) AS n_dup_words,
       CAST(floor(CAST((len(w.words) - COALESCE(p.n_dup_words, 0)) * 1000000 AS DOUBLE)
                  / len(w.words)) AS BIGINT) AS kept_ppm
FROM w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
WHERE len(w.words) >= {_SPAN_N}
""",
    tags=("training", "dedup", "spans", "scrub"),
)
def q201_exact_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication audit (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr): every {_SPAN_N}-word span that also occurs in
    another document marks its word positions as duplicated; adjacent
    and overlapping marked spans merge into maximal islands
    (gaps-and-islands over start positions), and the per-document
    report says how many words survive the scrub (kept_ppm).

    Unlike q163 (does a shared span EXIST per doc), this computes the
    actual byte-level removal set — the number the C4/ExactSubstr
    pipeline needs before cutting.

    Scale shape: the position explode is linear in corpus tokens; the
    census collapses to DISTINCT (doc, span) before its map-side
    combined groupBy; the join back keys on the span string (at 100 TB:
    xxhash64(span)); the island merge windows only over DUPLICATED
    positions of a single document (tiny per-doc sets, partitioned by
    doc_id — no global window)."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    words = d.select("doc_id", _words_col().alias("words")).filter(
        F.size("words") >= _SPAN_N
    )
    pos = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - _SPAN_N + 1),
                lambda i: F.array_join(F.slice("words", i, _SPAN_N), " "),
            )
        ).alias("i0", "span"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "span")
    census = (
        pos.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs_with"))
    )
    dup_pos = (
        pos.join(census.filter(F.col("n_docs_with") > 1), "span")
        .select("doc_id", "i", (F.col("i") + _SPAN_N - 1).alias("ie"))
    )
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    numbered = dup_pos.withColumn(
        "new_island",
        F.when(F.max("ie").over(prev) >= F.col("i") - 1, 0).otherwise(1),
    ).withColumn("island_id", F.sum("new_island").over(run))
    merged = numbered.groupBy("doc_id", "island_id").agg(
        F.min("i").alias("lo"), F.max("ie").alias("hi")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("hi") - F.col("lo") + 1).cast("long").alias("n_dup_words"),
    )
    base = words.select("doc_id", F.size("words").alias("n_words"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce("n_islands", F.lit(0)).cast("long").alias("n_islands"),
        F.coalesce("n_dup_words", F.lit(0)).cast("long").alias("n_dup_words"),
        F.floor(
            (F.col("n_words") - F.coalesce("n_dup_words", F.lit(0))).cast("double")
            * 1000000
            / F.col("n_words")
        ).cast("long").alias("kept_ppm"),
    )


@register(
    "q222_shingle_novelty",
    oracle=f"""
WITH sh AS ({{_SQL_SH}}),
pos AS (
  SELECT DISTINCT doc_id, u.s AS shingle
  FROM sh, unnest(shingles) AS u(s)
),
firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM pos GROUP BY shingle
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM pos p JOIN firsts f ON p.shingle = f.shingle
GROUP BY p.doc_id
""".format(_SQL_SH=_SQL_SHINGLES_CS),
    tags=("training", "novelty", "redundancy"),
)
def q222_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty under ingestion order: the
    fraction of a doc's distinct word-3-grams that no EARLIER doc
    (smaller doc_id) contains — the redundancy-growth curve that
    says when a crawl stops adding information (novelty trends to
    zero as the corpus saturates; dedup'd corpora hold it up).

    Scale shape: distinct (doc, shingle) incidence first (map-side
    combined), the first-occurrence relation is one min-aggregation
    on the shingle key, and the verdict join keys on the shingle —
    the q151/q163 two-phase pattern with an argmin instead of a
    census."""
    from cli_spark.operators.dedup import shingles_df
    # fanout + outer explode: the raw docs fan out BEFORE the shingle
    # projection and the Generate carries no size filter, so the
    # expensive split/transform expression is evaluated once, in
    # parallel (see shingles_df / q309 notes)
    sh = shingles_df(spark, sf_dir, fanout=True)
    pos = (
        sh.select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    firsts = pos.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    joined = pos.join(firsts, "shingle")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_novel"),
        F.expr(
            "sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000"
            " div count(1)"
        ).cast("long").alias("novelty_ppm"),
    )


@register(
    "q223_heaps_vocab_growth",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
inc AS (
  SELECT DISTINCT doc_id, u.t AS term FROM w, unnest(words) AS u(t)
),
firsts AS (
  SELECT term, MIN(doc_id) AS first_doc FROM inc GROUP BY term
),
buckets AS (
  SELECT (first_doc // 50) * 50 AS bucket_lo,
         CAST(COUNT(*) AS BIGINT) AS new_terms
  FROM firsts GROUP BY 1
)
SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo,
       new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY bucket_lo ASC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_vocab
FROM buckets
""",
    tags=("training", "heaps", "vocab"),
)
def q223_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: new distinct terms
    contributed by each 50-document ingestion bucket and the
    cumulative vocabulary size — the companion diagnostic to q164's
    Zipf census (Zipf describes the frequency SHAPE, Heaps how the
    vocabulary GROWS; sublinear growth is the signature of natural
    text, linear growth flags id-like junk tokens).

    Scale shape: distinct (doc, term) incidence → argmin on the term
    key → a bucket histogram of first occurrences; the cumulative
    window runs over the tiny bucket relation."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    inc = (
        d.select("doc_id", F.explode(_words_col()).alias("term")).distinct()
    )
    firsts = inc.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    buckets = firsts.groupBy(
        (F.floor(F.col("first_doc") / 50) * 50).cast("long").alias("bucket_lo")
    ).agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    cum_w = Window.orderBy(F.col("bucket_lo").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return buckets.select(
        "bucket_lo",
        "new_terms",
        F.sum("new_terms").over(cum_w).cast("long").alias("cum_vocab"),
    )


@register(
    "q257_source_overlap_matrix",
    oracle="""
WITH sh AS (
  SELECT source,
         CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
              generate_series(1, len(w)-2),
              i -> list_extract(w,i) || ' ' || list_extract(w,i+1) || ' ' ||
                   list_extract(w,i+2)))
              ELSE []::VARCHAR[] END AS shingles
  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
),
ss AS (SELECT DISTINCT source, unnest(shingles) AS s FROM sh),
sizes AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b,
       sa.n AS n_a, sb.n AS n_b, i.n_common,
       CAST(i.n_common * 1000000 // (sa.n + sb.n - i.n_common) AS BIGINT)
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
""",
    tags=("corpus", "similarity", "dedup"),
)
def q257_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: 3-gram-shingle Jaccard between
    every pair of sources — the crawl-dedup triage report ("which
    feeds mirror each other?") that decides source-level dedup order
    before any per-document work. Each source reduces to its DISTINCT
    shingle set first (two-level agg, map-side combined); the pair
    census is an equi-join ON SHINGLE, so fan-out per shingle is
    bounded by the number of sources carrying it (≤ |sources|²
    per shingle, never a doc-pair explosion), and the |sources|²-row
    matrix joins back against broadcast set sizes."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    sh = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    ss = (
        d.select("source", F.explode(sh).alias("s"))
        .distinct()
    )
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "s")
    b = ss.select(F.col("source").alias("source_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr("n_common * 1000000 div (n_a + n_b - n_common)").alias("jaccard_ppm"),
        )
    )


_STITCH_CORE = """
WITH w AS (
  SELECT doc_id, source, {words} AS ws FROM documents
),
grams AS (
  SELECT doc_id, source, k,
         {joiner}({slice_pre}, ' ') AS pre,
         {joiner}({slice_suf}, ' ') AS suf
  FROM w{lat}
  WHERE {size}(ws) >= k
),
pairs AS (
  SELECT a.k, a.doc_id AS head_doc, b.doc_id AS tail_doc
  FROM grams a JOIN grams b
    ON a.k = b.k AND a.suf = b.pre AND a.doc_id != b.doc_id
)
SELECT k,
       CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
       CAST(COUNT(DISTINCT head_doc) AS BIGINT) AS n_head_docs,
       CAST(COUNT(DISTINCT tail_doc) AS BIGINT) AS n_tail_docs
FROM pairs
GROUP BY k
"""


@register(
    "q389_shard_stitch_candidates",
    oracle=_STITCH_CORE.format(
        words="list_filter(string_split(lower(text), ' '), x -> x != '')",
        joiner="array_to_string",
        slice_pre="ws[1:k]",
        slice_suf="ws[-k:]",
        lat=", LATERAL (SELECT UNNEST([2, 3]) AS k)",
        size="len",
    ),
    tags=("corpus", "stitching", "boundary"),
)
def q389_shard_stitch_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-boundary document stitching — the corpus-assembly defect
    every crawl/shard pipeline must audit: when an upstream split
    cuts one document across two shards, the tail of fragment A
    repeats as the head of fragment B, so candidate stitch pairs are
    exactly (suffix k-gram of A) = (prefix k-gram of B). Graded at
    k = 2 and k = 3 in one pass: the k-gradient (263 pairs -> 8 on
    this corpus) is the measurement itself — noise collapses with k,
    true split points survive, which is how the stitch threshold gets
    picked. One equi-join on the boundary-gram string per k; at
    100 TB the gram is md5'd to an 8-byte key and the join shuffles
    only (doc_id, key) — never document text."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_STITCH_CORE.format(
        words="filter(split(lower(text), ' '), x -> x != '')",
        joiner="array_join",
        slice_pre="slice(ws, 1, k)",
        slice_suf="slice(ws, -k, k)",
        lat=" LATERAL VIEW explode(array(2, 3)) AS k",
        size="size",
    ))
