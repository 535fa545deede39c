"""Deterministic sampling operators — the reproducible replacements
for ``df.sample`` / ``rand()`` in a training-data pipeline.

``rand()`` (and therefore ``df.sample``) is non-deterministic across
reruns, partitionings, and engines — useless where a sample must be
reproducible, auditable, and stable under corpus growth. Every
operator here derives its randomness from md5 of a stable key, so:

* the same row is always in/out of the sample, on any cluster layout;
* sampling is a narrow projection + filter — zero shuffle, fully
  pushed into the scan stage at any scale;
* per-group reservoirs are a hash-ranked window — one shuffle on the
  group key, identical to any per-group top-K.

Portable hash → [0, 256): two lowercase-hex md5 chars decoded with
1-based instr arithmetic, identical in Spark SQL and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# md5-derived uniform byte in [0, 256): hex digit 1 * 16 + hex digit 2.
_BYTE = (
    "(instr('0123456789abcdef', substr(md5({key}), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5({key}), 2, 1)) - 1"
)


def _byte_col(key_sql: str):
    return F.expr(_BYTE.format(key=key_sql))


@register(
    "q105_hash_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_BYTE.format(key="CAST(doc_id AS VARCHAR)")} < 64
""",
    tags=("sampling", "deterministic"),
)
def q105_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% Bernoulli sample: keep a doc iff its md5 byte
    < 64/256. A pure filter — no shuffle, no state, and the sample is
    stable when the corpus grows (old docs never flip)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_byte_col("CAST(doc_id AS STRING)") < 64).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "q106_stratified_sample",
    oracle=f"""
WITH tagged AS (
  SELECT lang, n_chars,
         {_BYTE.format(key="CAST(doc_id AS VARCHAR)")} AS b,
         CASE WHEN lang = 'en' THEN 192 WHEN lang = 'de' THEN 96 ELSE 32 END AS thresh
  FROM documents
)
SELECT lang,
       COUNT(*) AS total_docs,
       CAST(SUM(CASE WHEN b < thresh THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
       CAST(SUM(CASE WHEN b < thresh THEN CAST(n_chars AS BIGINT) ELSE 0 END) AS BIGINT)
         AS sampled_chars
FROM tagged GROUP BY lang
""",
    tags=("sampling", "deterministic", "stratified"),
)
def q106_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    (en 75%, de 37.5%, rest 12.5%) — the up/down-sampling step of a
    data-mixing recipe. Still a pure projection+filter; the only
    shuffle is the final per-language census."""
    d = load_table(spark, sf_dir, "documents")
    b = _byte_col("CAST(doc_id AS STRING)")
    thresh = (
        F.when(F.col("lang") == "en", 192).when(F.col("lang") == "de", 96).otherwise(32)
    )
    return (
        d.select("lang", "n_chars", b.alias("b"), thresh.alias("thresh"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum(F.when(F.col("b") < F.col("thresh"), 1).otherwise(0))
            .cast("long")
            .alias("sampled_docs"),
            F.sum(
                F.when(F.col("b") < F.col("thresh"), F.col("n_chars").cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias("sampled_chars"),
        )
    )


@register(
    "q107_reservoir_per_group",
    oracle="""
SELECT lang, doc_id, sample_rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= 5
""",
    tags=("sampling", "deterministic", "reservoir"),
)
def q107_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k=5 'reservoir' per language: rank docs by their
    md5 hash inside each group and keep the first 5 — a uniform
    fixed-size sample per stratum that is reproducible run-to-run
    (classic reservoir sampling is stream-order-dependent; hash-rank
    gives the same statistical guarantee without an ordering
    dependency). One shuffle on lang; Spark runs it as a windowed
    top-K with partial rank pushdown."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 5)
    )


@register(
    "q282_block_sampling_bias",
    oracle=f"""
WITH tagged AS (
  SELECT doc_id, lang, n_chars,
         {_BYTE.format(key="'blk' || CAST(doc_id // 64 AS VARCHAR)")} AS blk_b,
         {_BYTE.format(key="'row' || CAST(doc_id AS VARCHAR)")} AS row_b
  FROM documents
),
stats AS (
  SELECT 'corpus' AS method, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) * 1000 // COUNT(*) AS mean_chars_milli,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // COUNT(*) AS en_share_ppm
  FROM tagged
  UNION ALL
  SELECT 'block64', COUNT(*),
         CAST(SUM(n_chars) AS BIGINT) * 1000 // COUNT(*),
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // COUNT(*)
  FROM tagged WHERE blk_b < 64
  UNION ALL
  SELECT 'row', COUNT(*),
         CAST(SUM(n_chars) AS BIGINT) * 1000 // COUNT(*),
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // COUNT(*)
  FROM tagged WHERE row_b < 64
)
SELECT method, n_docs, mean_chars_milli, en_share_ppm FROM stats
""",
    tags=("sampling", "methodology", "audit"),
)
def q282_block_sampling_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-sampling bias audit (the TABLESAMPLE-methodology
    question): a 25% BLOCK sample (whole 64-doc blocks elected by one
    md5 byte of the block id — what SYSTEM sampling does to avoid
    random I/O) versus a 25% ROW sample (md5 byte per doc) versus the
    full corpus, compared on doc count, mean length (milli-chars) and
    English share (ppm). When storage order correlates with content
    (ingestion batches by source), block sampling inherits that
    correlation as bias; this query quantifies it with exact integer
    statistics. One scan: both sample verdicts are projection-stage
    predicates, each census is a conditional aggregate — no second
    pass, no shuffle beyond the 3-row rollup."""
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        "lang",
        "n_chars",
        _byte_col("'blk' || CAST(doc_id div 64 AS STRING)").alias("blk_b"),
        _byte_col("'row' || CAST(doc_id AS STRING)").alias("row_b"),
    )

    def census(method: str, cond):
        src = tagged.filter(cond) if cond is not None else tagged
        return src.groupBy().agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(n_chars) * 1000 div count(1)").alias("mean_chars_milli"),
            F.expr(
                "sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000 div count(1)"
            ).alias("en_share_ppm"),
        ).select(F.lit(method).alias("method"), "n_docs", "mean_chars_milli",
                 "en_share_ppm")

    return (
        census("corpus", None)
        .unionByName(census("block64", F.col("blk_b") < 64))
        .unionByName(census("row", F.col("row_b") < 64))
    )


@register(
    "q348_reservoir_merge_audit",
    # Per-shard keeps are each shard's 50 smallest md5(doc_id) keys;
    # the merge takes the 50 smallest of the 200 kept; equality with
    # the direct global top-50 is proved per rank, not assumed.
    oracle="""
WITH keyed AS (
  SELECT doc_id, doc_id % 4 AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
),
shard_keep AS (
  SELECT doc_id, hk,
         row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id) AS rn
  FROM keyed
),
merged AS (
  SELECT doc_id, hk,
         row_number() OVER (ORDER BY hk, doc_id) AS rank
  FROM shard_keep WHERE rn <= 50
),
direct AS (
  SELECT doc_id, hk,
         row_number() OVER (ORDER BY hk, doc_id) AS rank
  FROM keyed
)
SELECT m.rank, m.doc_id AS merged_doc, d.doc_id AS direct_doc,
       CASE WHEN m.doc_id = d.doc_id THEN 1 ELSE 0 END AS agree
FROM merged m JOIN direct d ON m.rank = d.rank
WHERE m.rank <= 50
""",
    tags=("sampling", "reservoir", "mergeable"),
)
def q348_reservoir_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable uniform sampling — why the md5-rank formulation (the
    q105/q107 family's sampling primitive) distributes: a uniform
    k-sample is the k smallest hash keys, and bottom-k is MERGEABLE —
    each shard keeps its local bottom-50 (bounded state, no
    coordination), the merge takes the bottom-50 of the union, and
    the audit proves rank-by-rank equality with the direct global
    bottom-50 (the property classic reservoir sampling LACKS without
    weighted coordination, and the reason distributed samplers hash
    instead). At 100 TB: per-partition bounded keeps, one tiny
    merge — no global shuffle of the population.

    Scale shape: shard keeps are per-shard windows over the hash key;
    the merge ranks 200 rows; the direct side is the audit's ground
    truth (TakeOrdered-sized)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        (F.col("doc_id") % 4).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    from pyspark.sql.window import Window as _W

    ws = _W.partitionBy("shard").orderBy("hk", "doc_id")
    shard_keep = (
        keyed.withColumn("rn", F.row_number().over(ws)).filter(F.col("rn") <= 50)
    )
    wm = _W.orderBy("hk", "doc_id")
    # merged side ranks <= 200 kept rows (window is fine there); the
    # direct side must NOT be a global window over the corpus — it
    # compiles to TakeOrderedAndProject via orderBy + limit, with the
    # rank window applied only to the surviving 50 rows
    merged = (
        shard_keep.select("doc_id", "hk")
        .withColumn("rank", F.row_number().over(wm))
        .filter(F.col("rank") <= 50)
    )
    direct = (
        keyed.select("doc_id", "hk")
        .orderBy("hk", "doc_id")
        .limit(50)
        .withColumn("rank", F.row_number().over(wm))
    )
    return (
        merged.select(F.col("rank"), F.col("doc_id").alias("merged_doc"))
        .join(
            direct.select(F.col("rank"), F.col("doc_id").alias("direct_doc")),
            "rank",
        )
        .select(
            "rank",
            "merged_doc",
            "direct_doc",
            F.when(F.col("merged_doc") == F.col("direct_doc"), 1)
            .otherwise(0).alias("agree"),
        )
    )
