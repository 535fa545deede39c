"""Training-data curation operators (round 2): the pipeline stages a
large-scale LLM data build runs between raw scrape and tokenizer —
decontamination against the eval split, corpus-level heavy hitters,
normalization, bigram language-model statistics, embedding-space
outlier pruning, contrastive hard-negative mining, curriculum
binning, and a deterministic k-means over embeddings.

Design for 100 TB (same rules as pipeline.py):
* every "random" choice is an md5-derived hash of a stable key —
  reproducible across runs, engines and partitionings;
* shingle/token joins key on the (pre-aggregated, distinct) token —
  map-side partial aggregation happens before any shuffle, and the
  small side of every join (test-split shingles, corpus totals,
  centroids) is explicitly broadcast;
* all floating-point results cross the engine boundary as exact
  integers (counts, micro-ratios via floor(a*1e6/b), quantized
  embedding coordinates) — the determinism layer's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cli_spark.operators.pipeline import _BUCKET, _bucket_col
from cli_spark.plans.registry import register
from cli_spark.tables import events_stream, load_table

# 5-word shingles, 1-based start positions (both engines); docs with
# fewer than 5 words produce none (Spark sequence(1,0) counts DOWN —
# the n>=5 guard is mandatory, see SURVEY §5.2).
_SHINGLE_N = 5


def _words_col():
    return F.filter(F.split(F.lower("text"), " "), lambda w: w != "")


_SQL_WORDS = "list_filter(string_split(lower(text), ' '), w -> w != '')"


@register(
    "q151_decontamination",
    oracle=f"""
WITH split_docs AS (
  SELECT doc_id, {_SQL_WORDS} AS words,
         CASE WHEN {_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} < 12 THEN 'train'
              WHEN {_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} < 14 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
train_shingles AS (
  SELECT DISTINCT array_to_string(list_slice(words, s.i, s.i + {_SHINGLE_N - 1}), ' ') AS shingle
  FROM split_docs, unnest(generate_series(1, len(words) - {_SHINGLE_N - 1})) AS s(i)
  WHERE split = 'train' AND len(words) >= {_SHINGLE_N}
),
test_shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(words, s.i, s.i + {_SHINGLE_N - 1}), ' ') AS shingle
  FROM split_docs, unnest(generate_series(1, len(words) - {_SHINGLE_N - 1})) AS s(i)
  WHERE split = 'test' AND len(words) >= {_SHINGLE_N}
)
SELECT t.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(floor(CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1000000 AS DOUBLE)
                  / COUNT(*)) AS BIGINT) AS hit_ppm,
       SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) * 10 >= COUNT(*) AS contaminated
FROM test_shingles t LEFT JOIN train_shingles tr ON t.shingle = tr.shingle
GROUP BY t.doc_id
""",
    tags=("training", "decontamination", "shingle"),
)
def q151_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag test-split documents whose
    5-gram shingles leak from the train split (the standard n-gram
    overlap check run before any benchmark eval). Splits reuse q96's
    md5(doc_id) buckets, so train/test membership is reproducible.

    Scale shape: both sides reduce to DISTINCT shingles BEFORE the
    join (map-side partial distinct), the join keys on the shingle
    string, and the verdict is integer arithmetic (hit*10 >= total
    ⇔ ratio >= 0.1; ppm = floor(hit*1e6/total)). At 100 TB the
    train-shingle side would key on xxhash64(shingle) and the
    contaminated-eval join is a fraction of corpus size — test split
    is ~12% of docs and shrinks to distinct shingles first."""
    # Fan out the shingle explode: the toy corpus is a single parquet
    # split — without this every shingle builds on one core (same
    # rationale as q73; cheap re-balance on a real multi-split corpus).
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    tagged = (
        d.withColumn("md5_key", F.encode(F.col("doc_id").cast("string"), "utf-8"))
        .withColumn(
            "split",
            F.when(_bucket_col("md5_key") < 12, "train")
            .when(_bucket_col("md5_key") < 14, "val")
            .otherwise("test"),
        )
        .withColumn("words", _words_col())
        .filter(F.size("words") >= _SHINGLE_N)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - (_SHINGLE_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("words"), i, _SHINGLE_N)),
                )
            ).alias("shingle"),
        )
    )
    # One explode, one shared distinct: both join sides derive from a
    # single persisted (split, doc_id, shingle) relation instead of
    # re-running the explode pipeline per branch (the val split is
    # dropped before the distinct — it feeds neither side). Like
    # q73's signature persist, the cache also serves repeated calls;
    # at cluster scale it becomes a checkpoint/table and LRU eviction
    # bounds executor memory. Measured ~25% off the sf0.1 wall time.
    allsh = (
        tagged.filter(F.col("split") != "val")
        .select("split", "doc_id", "shingle")
        .distinct()
        .persist()
    )
    train = (
        allsh.filter(F.col("split") == "train").select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    test = allsh.filter(F.col("split") == "test").select("doc_id", "shingle")
    joined = test.join(train, "shingle", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        F.floor(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") * 1000000
            / F.count(F.lit(1))
        ).cast("long").alias("hit_ppm"),
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) * 10 >= F.count(F.lit(1))).alias(
            "contaminated"
        ),
    )


@register(
    "q153_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_SQL_WORDS}) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM counts)
SELECT c.term, c.cnt,
       CAST(floor(CAST(c.cnt * 1000000 AS DOUBLE) / t.n) AS BIGINT) AS freq_ppm
FROM counts c CROSS JOIN total t
WHERE c.cnt * 500 >= t.n
ORDER BY c.cnt DESC, c.term
""",
    tags=("training", "heavy-hitters", "frequency"),
)
def q153_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: every token whose frequency exceeds 1/500
    of all token occurrences (the exact version of the Misra-Gries /
    count-min query — boilerplate and template detection in corpus
    audits).

    Two-phase exact: per-term counts (map-side combine, one shuffle on
    term), then the corpus total re-derived from the counts relation
    (no second scan) crossed in as a broadcast single row. The
    threshold compare is pure integers (cnt*500 >= N), so it is
    oracle-exact at any scale."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_words_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 500 >= F.col("n"))
        .select(
            "term",
            "cnt",
            F.floor(F.col("cnt").cast("double") * 1000000 / F.col("n"))
            .cast("long")
            .alias("freq_ppm"),
        )
        .orderBy(F.col("cnt").desc(), "term")
    )


@register(
    "q154_text_normalize",
    oracle="""
WITH cleaned AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
  WHERE doc_id < 200
)
SELECT doc_id, md5(norm) AS norm_md5,
       CAST(length(norm) AS BIGINT) AS norm_chars,
       CAST(len(list_filter(string_split(norm, ' '), w -> w != '')) AS BIGINT) AS norm_tokens
FROM cleaned
""",
    tags=("training", "normalize", "regex"),
)
def q154_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → non-alphanumeric →
    space → whitespace collapse → trim), fingerprinted with md5 so the
    full normalized text never crosses the engine boundary. This is
    the canonicalization step exact-dedup keys on in a real corpus
    build (casing/punctuation variants collapse to one md5).

    Narrow per-row projection — no shuffle at any scale; regexes are
    anchored to byte-class patterns valid in both Java regex and RE2
    (DuckDB needs the explicit 'g' flag; Spark replaces all matches
    by default)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(F.encode(norm, "utf-8")).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_chars"),
        F.size(F.filter(F.split(norm, " "), lambda w: w != "")).cast("long").alias(
            "norm_tokens"
        ),
    )


@register(
    "q155_bigram_lm",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
bigrams AS (
  SELECT list_extract(words, s.i) AS w1, list_extract(words, s.i + 1) AS w2
  FROM w, unnest(generate_series(1, len(words) - 1)) AS s(i)
  WHERE len(words) >= 2
),
c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
ranked AS (
  SELECT c12.w1, c12.w2, c12.n12, c1.n1,
         CAST(floor(CAST(c12.n12 * 1000000 AS DOUBLE) / c1.n1) AS BIGINT) AS p_ppm,
         row_number() OVER (PARTITION BY c12.w1 ORDER BY c12.n12 DESC, c12.w2) AS rnk
  FROM c12 JOIN c1 ON c12.w1 = c1.w1
)
SELECT w1, w2, n12, n1, p_ppm, rnk
FROM ranked WHERE rnk <= 3 AND n1 >= 100
""",
    tags=("training", "lm", "bigram"),
)
def q155_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model table: P(w2|w1) as integer ppm for the
    top-3 continuations of every context word seen >= 100 times — the
    count stage of n-gram LM training (and the data for perplexity-ish
    quality scoring without a neural model).

    The context totals come from re-aggregating the bigram counts
    (never a second corpus scan), conditional probabilities are
    floor(n12*1e6/n1) over exact integers, and ties rank
    deterministically (count desc, then w2)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", _words_col().alias("words")).filter(F.size("words") >= 2)
    bigrams = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("words"), i).alias("w1"),
                    F.element_at(F.col("words"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    ranked = (
        c12.join(c1, "w1")
        .withColumn(
            "p_ppm",
            F.floor(F.col("n12").cast("double") * 1000000 / F.col("n1")).cast("long"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(F.col("n12").desc(), F.col("w2"))
            ),
        )
    )
    return ranked.filter((F.col("rnk") <= 3) & (F.col("n1") >= 100)).select(
        "w1", "w2", "n12", "n1", "p_ppm", "rnk"
    )


# Quantized embedding coordinate: floor(x*1e6 + 0.5) — round-half-up in
# pure IEEE ops, identical in both engines (see similarity.py's dot).
# |x| <= ~0.53 here, so |q| <= 5.3e5; squared-distance sums over 64 dims
# stay far inside int64.
_SQL_QDIMS = (
    "SELECT vec_id, label, s.i AS pos, "
    "CAST(floor(CAST(list_extract(embedding, s.i) AS DOUBLE) * 1000000.0 + 0.5) "
    "AS BIGINT) AS qv "
    "FROM embeddings, unnest(generate_series(1, 64)) AS s(i)"
)


def _qdims(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
            )
        ).alias("pos", "qv"),
    )


@register(
    "q157_embedding_outliers",
    oracle=f"""
WITH q AS ({_SQL_QDIMS}),
cent AS (
  SELECT label, pos,
         CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
  FROM q GROUP BY label, pos
),
dist AS (
  SELECT q.vec_id, q.label,
         CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS dist2
  FROM q JOIN cent c ON q.label = c.label AND q.pos = c.pos
  GROUP BY q.vec_id, q.label
),
ranked AS (
  SELECT label, vec_id, dist2,
         row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM dist
)
SELECT label, vec_id, dist2, rn FROM ranked WHERE rn * 20 <= n
""",
    tags=("training", "embedding", "outlier"),
)
def q157_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning: per-label centroid, then the
    top 5% of vectors by squared distance from their own centroid —
    the mislabeled/garbage-document screen run before embeddings feed
    contrastive training.

    All-integer determinism: coordinates quantize to int64 at 1e6,
    centroids are floor(mean+0.5) of exact integer sums, distances are
    exact int64 — so the 5% cut (rn*20 <= n, pure integers) is
    bit-reproducible. Scale shape: centroids are a labels×64-row
    relation (broadcast); the distance pass is one narrow join +
    re-aggregation of the exploded dims, shuffling only (vec, label)
    partial sums."""
    q = _qdims(spark, sf_dir)
    cent = q.groupBy("label", "pos").agg(
        F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("cv")
    )
    dist = (
        q.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv")))
            .cast("long")
            .alias("dist2")
        )
    )
    w = Window.partitionBy("label")
    ranked = dist.select(
        "label",
        "vec_id",
        "dist2",
        F.row_number().over(w.orderBy(F.col("dist2").desc(), F.col("vec_id"))).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.filter(F.col("rn") * 20 <= F.col("n")).select(
        "label", "vec_id", "dist2", "rn"
    )


from cli_spark.operators.similarity import sql_dot as _sql_dot  # noqa: E402


@register(
    "q156_hard_negatives",
    oracle=f"""
WITH nrm AS (
  SELECT vec_id, label, embedding,
         sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
queries AS (SELECT * FROM nrm WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS cand_id,
         c.label = q.label AS is_same,
         floor({_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) * 1000000.0) AS cos_micro
  FROM queries q JOIN nrm c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id, is_same
                               ORDER BY cos_micro DESC, cand_id) AS rn
  FROM pairs
)
SELECT q_id, q_label, CASE WHEN is_same THEN 'positive' ELSE 'negative' END AS role,
       cand_id, CAST(cos_micro AS BIGINT) AS cos_micro
FROM ranked WHERE rn = 1
""",
    tags=("training", "contrastive", "mining"),
)
def q156_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining: for each query vector (deterministic
    vec_id % 50 sample) emit its hardest positive (nearest same-label
    neighbor) and hardest negative (nearest other-label neighbor) by
    cosine — the batch-construction step of contrastive embedding
    training.

    The query side is a tiny deterministic sample broadcast against
    the corpus (one linear scan, no shuffle of the big side before the
    per-query top-1 reduction); cosine uses the quantized-int dot
    (similarity.py) and crosses engines as floor(cos*1e6)."""
    from cli_spark.operators.similarity import dot

    e = load_table(spark, sf_dir, "embeddings")
    nrm = e.select(
        "vec_id", "label", "embedding",
        F.sqrt(dot("embedding", "embedding")).alias("nrm"),
    )
    q = nrm.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"), F.col("nrm").alias("qn"),
    )
    pairs = (
        nrm.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "q_label",
            F.col("vec_id").alias("cand_id"),
            (F.col("label") == F.col("q_label")).alias("is_same"),
            F.floor(dot("embedding", "qe") / (F.col("qn") * F.col("nrm")) * 1000000.0)
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("q_id", "is_same").orderBy(
        F.col("cos_micro").desc(), F.col("cand_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "q_id", "q_label",
            F.when(F.col("is_same"), "positive").otherwise("negative").alias("role"),
            "cand_id",
            F.col("cos_micro").cast("long").alias("cos_micro"),
        )
    )


def _kmeans_ctes(iters: int, k: int) -> tuple[list[str], str]:
    """Unrolled Lloyd iterations as a CTE chain mirroring the Spark
    loop below step for step (same quantized-integer arithmetic).
    Returns (cte_list, final_membership_name) where the final CTE
    ``m{iters+1}`` holds (vec_id, cid, d2, rn) with rn=1 rows being
    the final assignment — shared by q158 and the SemDeDup pass
    (semdedup.py) so both oracles run the identical clustering."""
    ctes = [f"q AS ({_SQL_QDIMS})",
            f"c0 AS (SELECT vec_id AS cid, pos, qv AS cv FROM q WHERE vec_id < {k})"]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i} AS (SELECT q.vec_id, c.cid, "
            f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
            f"FROM q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
        ctes.append(
            f"m{i} AS (SELECT vec_id, cid, d2, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a{i})")
        ctes.append(
            f"c{i} AS (SELECT m.cid, q.pos, "
            f"CAST(floor(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv "
            f"FROM q JOIN (SELECT vec_id, cid FROM m{i} WHERE rn = 1) m "
            f"ON q.vec_id = m.vec_id GROUP BY m.cid, q.pos)")
        prev = f"c{i}"
    fin = iters + 1
    ctes.append(
        f"a{fin} AS (SELECT q.vec_id, c.cid, "
        f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
        f"FROM q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
    ctes.append(
        f"m{fin} AS (SELECT vec_id, cid, d2, row_number() OVER "
        f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a{fin})")
    return ctes, f"m{fin}"


def _kmeans_sql(iters: int, k: int) -> str:
    ctes, members = _kmeans_ctes(iters, k)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT cid AS cluster_id, COUNT(*) AS n_members, CAST(SUM(d2) AS BIGINT) AS wcss
FROM {members} WHERE rn = 1 GROUP BY cid
""")


_KMEANS_K = 4
_KMEANS_ITERS = 2


_KMEANS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _kmeans_membership_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd assignment (vec_id, cid, d2) after _KMEANS_ITERS
    deterministic iterations as a LAZY plan — the Spark mirror of
    _kmeans_ctes' membership CTE (tests/test_plans.py gates on this
    form, where the per-iteration broadcast joins are visible)."""

    def assign(q: DataFrame, cent: DataFrame) -> DataFrame:
        d = (
            q.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv")))
                .cast("long")
                .alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    q = _qdims(spark, sf_dir).select("vec_id", "pos", "qv")
    cent = q.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), "pos", F.col("qv").alias("cv")
    )
    for _ in range(_KMEANS_ITERS):
        members = assign(q, cent).select("vec_id", "cid")
        cent = (
            q.join(members, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)) + 0.5)
                .cast("long")
                .alias("cv")
            )
        )
    return assign(q, cent).select("vec_id", "cid", "d2")


def _kmeans_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized, session-cached Lloyd assignment: the lineage is
    the whole unrolled loop and q247 consumes it on both sides of its
    pair stage plus twice more for censuses — without localCheckpoint
    every consumer re-executes the clustering (measured 5× recompute
    at sf1), and the (applicationId, sf_dir) cache shares the
    materialization across queries exactly like graph._EDGE_CACHE."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _KMEANS_CACHE.get(key)
    if cached is None:
        cached = _kmeans_membership_plan(spark, sf_dir).localCheckpoint()
        _KMEANS_CACHE[key] = cached
    return cached


@register(
    "q158_kmeans_lloyd",
    oracle=_kmeans_sql(_KMEANS_ITERS, _KMEANS_K),
    tags=("training", "kmeans", "iterative"),
)
def q158_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=4, 2 unrolled Lloyd iterations, seeds
    = the k lowest vec_ids): cluster sizes and within-cluster sum of
    squares — the clustering pass a data pipeline uses for topic
    balancing / IVF coarse quantizers (q84 consumes exactly such
    centroids).

    Every step is exact-integer: quantized coordinates, integer
    squared distances, argmin with (distance, cluster) tie-break, and
    floor(mean+0.5) centroid updates — so 2 iterations land on
    IDENTICAL centroids in both engines (no float drift across
    rounds). Scale shape per iteration: one broadcast join of the
    k×64-row centroid relation against the exploded dims, partial-agg
    reduction to (vec, cluster) distances, and a k×64 re-aggregation;
    vectors never shuffle."""
    final = _kmeans_membership(spark, sf_dir)
    return final.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").cast("long").alias("wcss"),
    )


from cli_spark.operators.text import _SQL_STOPWORDS, _STOPWORDS  # noqa: E402


@register(
    "q159_curriculum_bins",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, n_chars,
         len(list_filter(string_split(lower(text), ' '), x -> x != '')) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains({_SQL_STOPWORDS}, x))) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, lang, n_chars,
         CAST(floor(CAST(n_stop * 1000000 AS DOUBLE) / n_tokens) AS BIGINT) AS score_ppm
  FROM tok WHERE n_tokens > 0
),
tiled AS (
  SELECT lang, score_ppm, n_chars,
         ntile(5) OVER (PARTITION BY lang ORDER BY score_ppm, doc_id) AS tile
  FROM scored
)
SELECT lang, tile, COUNT(*) AS n_docs,
       MIN(score_ppm) AS min_ppm, MAX(score_ppm) AS max_ppm,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM tiled GROUP BY lang, tile
""",
    tags=("training", "curriculum", "ntile"),
)
def q159_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: NTILE(5) quality tiers per language by
    stopword-density score (integer ppm), with per-tier document
    counts and character budgets — the bucketing step of
    curriculum-ordered or quality-weighted training schedules.

    NTILE over (score, doc_id) is fully ordered → deterministic tier
    assignment in both engines; scores are floor(n_stop*1e6/n_tokens)
    over exact token counts."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    tok = d.select(
        "doc_id", "lang", "n_chars",
        F.size(words).alias("n_tokens"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    scored = tok.select(
        "doc_id", "lang", "n_chars",
        F.floor(F.col("n_stop").cast("double") * 1000000 / F.col("n_tokens"))
        .cast("long")
        .alias("score_ppm"),
    )
    tiled = scored.withColumn(
        "tile",
        F.ntile(5).over(Window.partitionBy("lang").orderBy("score_ppm", "doc_id")),
    )
    return tiled.groupBy("lang", "tile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("score_ppm").alias("min_ppm"),
        F.max("score_ppm").alias("max_ppm"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


from cli_spark.functions.determinism import dsum, sql_dsum  # noqa: E402


@register(
    "q160_streaming_update_merge",
    oracle=f"""
SELECT user_id, COUNT(*) AS n_events, {sql_dsum('value')} AS value_sum
FROM events GROUP BY user_id
""",
    tags=("streaming", "true_stream", "update_mode", "foreachBatch"),
)
def q160_streaming_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming in UPDATE output mode with a foreachBatch merge
    sink: per-user running totals where each micro-batch emits only
    the keys it changed, and the sink upserts them into a keyed
    parquet state table — the incremental-materialized-view pattern.

    The upsert is fully distributed (the MERGE INTO shape): the new
    state is ``changed_keys ∪ (old_state ANTI JOIN changed_keys)``,
    written as a fresh parquet version per batch and swapped in — the
    driver never materializes a single row, so state cardinality is
    bounded by cluster storage, not driver memory. (A driver-side
    dict here would OOM at 100 TB key counts; see VERDICT r3 §wrong.)
    """
    import shutil
    import tempfile

    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("value_sum"),
    )
    state_root = tempfile.mkdtemp(prefix="q160_state_")
    latest: dict[str, str] = {}  # holds only ONE path string, not rows

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        changed = batch_df.select(
            F.col("user_id").cast("long"),
            F.col("n_events").cast("long"),
            F.col("value_sum").cast("double"),
        )
        prev_path = latest.get("path")
        if prev_path is not None:
            prev = batch_df.sparkSession.read.parquet(prev_path)
            merged = prev.join(changed, "user_id", "left_anti").unionByName(changed)
        else:
            merged = changed
        out = f"{state_root}/v{batch_id}"
        merged.write.mode("overwrite").parquet(out)
        latest["path"] = out

    query = (
        agg.writeStream.outputMode("update")
        .foreachBatch(merge)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if "path" not in latest:  # no batches → empty state
        return spark.createDataFrame(
            [], "user_id long, n_events long, value_sum double"
        )
    result = spark.read.parquet(latest["path"]).select(
        "user_id", "n_events", "value_sum"
    )
    # Materialize off the temp dir before cleanup (bounded: one row
    # per user is the query's OUTPUT, not its state-merge path).
    out = result.localCheckpoint(eager=True)
    shutil.rmtree(state_root, ignore_errors=True)
    return out


@register(
    "q152_source_cap",
    oracle="""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rn <= 50 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM ranked GROUP BY source
""",
    tags=("training", "source-cap", "window"),
)
def q152_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source retention cap (the Common-Crawl-style "at most K
    documents per domain" rule): rank each source's documents by
    md5(doc_id) — a deterministic stand-in for random retention that
    never changes across reruns or engines — keep the first 50, and
    report kept/dropped counts and the retained character budget.

    One window over (source) + one aggregation; the payload column is
    never read (rank on ids only), so at corpus scale this shuffles
    keys and stats, not text."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), "doc_id"
            )
        )
        .alias("rn"),
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rn") <= 50, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("rn") > 50, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.sum(F.when(F.col("rn") <= 50, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


@register(
    "q161_oov_rate",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
bigrams AS (
  SELECT doc_id, list_extract(words, s.i) AS w1, list_extract(words, s.i + 1) AS w2
  FROM w, unnest(generate_series(1, len(words) - 1)) AS s(i)
  WHERE len(words) >= 2
),
c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bigrams GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN c.n12 < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM bigrams b JOIN c12 c ON b.w1 = c.w1 AND b.w2 = c.w2
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, n_rare,
       CAST(floor(CAST(n_rare * 1000000 AS DOUBLE) / n_bigrams) AS BIGINT) AS rare_ppm,
       n_rare * 5 >= n_bigrams AS low_quality
FROM scored
""",
    tags=("training", "lm", "quality"),
)
def q161_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality filter without a neural model: score
    each document by the fraction of its bigrams that are corpus-rare
    (corpus count < 5), flagging documents where more than 20% of
    bigrams are rare — a pure-integer stand-in for LM-based filtering
    (rare-bigram density correlates with garbled/boilerplate text).

    The corpus bigram table is built once (map-side combined) and
    joined back to the bigram stream on the bigram key; all verdicts
    are exact integer arithmetic (rare*5 >= total, floor-ppm)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", _words_col().alias("words")).filter(F.size("words") >= 2)
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("words"), i).alias("w1"),
                    F.element_at(F.col("words"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("n12") < 5, 1).otherwise(0)).cast("long").alias("n_rare"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_rare",
        F.floor(F.col("n_rare").cast("double") * 1000000 / F.col("n_bigrams"))
        .cast("long")
        .alias("rare_ppm"),
        (F.col("n_rare") * 5 >= F.col("n_bigrams")).alias("low_quality"),
    )


@register(
    "q192_sequence_packing",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
  FROM documents
),
laid AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_off
  FROM toks
)
SELECT doc_id, lang, n_tokens, start_off,
       CAST(floor(start_off / 2048.0) AS BIGINT) AS first_chunk,
       CAST(floor((start_off + n_tokens - 1) / 2048.0) AS BIGINT) AS last_chunk,
       CAST(floor((start_off + n_tokens - 1) / 2048.0)
            - floor(start_off / 2048.0) + 1 AS BIGINT) AS n_chunks
FROM laid
WHERE n_tokens > 0
""",
    tags=("training", "packing"),
)
def q192_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): per language
    stream, documents are laid end-to-end in deterministic doc_id
    order and cut into fixed 2048-token training chunks; each doc
    reports its token offset and the chunk span it lands in — the
    assignment table a packing writer needs to emit examples.

    Scale shape: one window cumsum per lang partition (single shuffle
    on lang, no join); the offset arithmetic is pure codegen. A 100 TB
    corpus packs per (lang, shard) key to bound any one window
    partition — same math, finer key."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = toks.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    first = F.floor(F.col("start_off") / 2048.0)
    last = F.floor((F.col("start_off") + F.col("n_tokens") - 1) / 2048.0)
    return laid.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "lang",
        "n_tokens",
        "start_off",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last - first + 1).cast("long").alias("n_chunks"),
    )


@register(
    "q193_chunk_utilization",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
  FROM documents
),
laid AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_off
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT lang, c.c AS chunk_id,
         least(start_off + n_tokens, 2048 * (c.c + 1))
         - greatest(start_off, 2048 * c.c) AS tok_in
  FROM laid
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(CAST(floor(start_off / 2048.0) AS BIGINT),
                                  CAST(floor((start_off + n_tokens - 1) / 2048.0) AS BIGINT))) AS c
  ) c
),
fills AS (
  SELECT lang, chunk_id, CAST(SUM(tok_in) AS BIGINT) AS fill
  FROM spans GROUP BY lang, chunk_id
)
SELECT lang,
       COUNT(*) AS n_chunks,
       CAST(SUM(fill) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN fill = 2048 THEN 1 ELSE 0 END) AS BIGINT) AS full_chunks,
       CAST(MIN(fill) AS BIGINT) AS min_fill
FROM fills
GROUP BY lang
""",
    tags=("training", "packing"),
)
def q193_chunk_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit for q192's concat-and-chunk layout:
    each document's token interval is exploded over the chunks it
    spans, per-chunk fill is summed, and a per-language rollup
    reports chunk count, token conservation, and how many chunks are
    exactly full (all but the final tail, by construction).

    Scale shape: the explode fans each doc out by its chunk-span
    count (almost always 1–2 rows), then two narrow aggregations on
    (lang, chunk_id) and lang — no joins, token totals conserve
    exactly so the oracle is bit-exact."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = toks.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    first = F.floor(F.col("start_off") / 2048.0).cast("long")
    last = F.floor((F.col("start_off") + F.col("n_tokens") - 1) / 2048.0).cast("long")
    spans = laid.select(
        "lang",
        "start_off",
        "n_tokens",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    ).select(
        "lang",
        "chunk_id",
        (
            F.least(F.col("start_off") + F.col("n_tokens"), 2048 * (F.col("chunk_id") + 1))
            - F.greatest(F.col("start_off"), 2048 * F.col("chunk_id"))
        ).alias("tok_in"),
    )
    fills = spans.groupBy("lang", "chunk_id").agg(
        F.sum("tok_in").cast("long").alias("fill")
    )
    return fills.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("fill") == 2048, 1).otherwise(0)).cast("long").alias("full_chunks"),
        F.min("fill").cast("long").alias("min_fill"),
    )


@register(
    "q194_global_row_ids",
    oracle="""
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY lang NULLS LAST, doc_id) AS BIGINT) AS global_id
FROM documents
""",
    tags=("training", "ids"),
)
def q194_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous row ids ordered by (lang, doc_id) — the
    example-numbering pass before sharding a training corpus.

    The naive form is row_number() OVER (ORDER BY ...) — a GLOBAL
    window, which Spark executes on a SINGLE partition (the classic
    scale killer; that form is what the oracle runs, where DuckDB's
    single process doesn't care). The engine instead uses the
    two-phase offset pattern: per-group counts roll up to a tiny
    offsets relation (running sum over groups, window over ~#groups
    rows), broadcast back, and each group numbers independently with
    a PARTITIONED window — no stage ever sees more than one group's
    rows in one task. Same ids, cluster-scalable."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        Window.orderBy(F.asc_nulls_last("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # window over the GROUP relation (a handful of rows) is fine —
    # the antipattern is a global window over the FACT rows
    offsets = counts.select(
        F.col("lang").alias("off_lang"),
        (F.sum("n").over(w_off) - F.col("n")).alias("offset"),
    )
    # eqNullSafe: a NULL-lang group must survive the join (a plain
    # equi-join drops NULL keys while the groupBy keeps the group,
    # silently un-numbering those docs); nulls-last ordering matches
    # the oracle's explicit NULLS LAST.
    w_in = Window.partitionBy("lang").orderBy("doc_id")
    return (
        d.join(F.broadcast(offsets), d["lang"].eqNullSafe(F.col("off_lang")))
        .select(
            "doc_id",
            "lang",
            (F.row_number().over(w_in) + F.col("offset")).cast("long").alias("global_id"),
        )
    )


@register(
    "q197_budget_waterfill",
    oracle="""
WITH supply AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT)
           AS supply_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(supply_tokens) AS BIGINT) AS total FROM supply),
r1 AS (
  SELECT s.source, s.supply_tokens,
         least(s.supply_tokens, 40000,
               CASE WHEN t.total = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(100000 * s.supply_tokens AS BIGINT) // t.total END) AS a1,
         least(s.supply_tokens, CAST(40000 AS BIGINT)) AS ceil_i
  FROM supply s CROSS JOIN tot t
),
agg1 AS (
  SELECT CAST(100000 - SUM(a1) AS BIGINT) AS leftover,
         CAST(SUM(ceil_i - a1) AS BIGINT) AS headroom
  FROM r1
)
SELECT r.source, r.supply_tokens, r.a1 AS alloc_round1,
       least(r.ceil_i,
             r.a1 + CASE WHEN g.headroom > 0
                         THEN CAST(g.leftover * (r.ceil_i - r.a1) AS BIGINT) // g.headroom
                         ELSE 0 END) AS alloc_final,
       CASE WHEN r.supply_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(CAST(least(r.ceil_i,
             r.a1 + CASE WHEN g.headroom > 0
                         THEN CAST(g.leftover * (r.ceil_i - r.a1) AS BIGINT) // g.headroom
                         ELSE 0 END) * 1000000 AS DOUBLE) / r.supply_tokens) AS BIGINT)
       END AS fill_ppm
FROM r1 r CROSS JOIN agg1 g
""",
    tags=("training", "sampling", "budget"),
)
def q197_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources: a global
    sample budget (100k tokens) is split proportionally to each
    source's supply, capped per source (40k and its own supply), and
    the leftover from capped sources redistributes once over the
    remaining headroom — the bounded-iteration form of the classic
    water-filling mix planner (Pile/ROOTS-style source weighting).

    All-integer arithmetic (BIGINT products, floor division) so both
    engines agree bit-for-bit. Scale shape: supply is one map-side
    combined aggregation on source; the allocator runs on the
    #sources-row relation (driver-scale math stays in the plan as
    broadcast 1-row aggregates — no collect)."""
    d = load_table(spark, sf_dir, "documents")
    supply = d.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
        .cast("long")
        .alias("supply_tokens")
    )
    tot = supply.agg(F.sum("supply_tokens").cast("long").alias("total"))
    r1 = (
        supply.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "supply_tokens",
            F.least(
                F.col("supply_tokens"),
                F.lit(40000).cast("long"),
                # guard total = 0 (all-empty corpus): Spark's `div 0`
                # yields NULL (which least() would SKIP, not propagate)
                # while DuckDB's `// 0` errors — pin both engines to 0
                F.expr(
                    "CASE WHEN total = 0 THEN CAST(0 AS BIGINT)"
                    " ELSE CAST(100000 * supply_tokens AS BIGINT) div total END"
                ),
            ).alias("a1"),
            F.least(F.col("supply_tokens"), F.lit(40000).cast("long")).alias("ceil_i"),
        )
    )
    agg1 = r1.agg(
        (F.lit(100000) - F.sum("a1")).cast("long").alias("leftover"),
        F.sum(F.col("ceil_i") - F.col("a1")).cast("long").alias("headroom"),
    )
    joined = r1.crossJoin(F.broadcast(agg1))
    final = F.least(
        F.col("ceil_i"),
        F.col("a1")
        + F.when(
            F.col("headroom") > 0,
            F.expr("CAST(leftover * (ceil_i - a1) AS BIGINT) div headroom"),
        ).otherwise(F.lit(0)),
    )
    return joined.select(
        "source",
        "supply_tokens",
        F.col("a1").alias("alloc_round1"),
        final.alias("alloc_final"),
        F.when(F.col("supply_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(final.cast("double") * 1000000 / F.col("supply_tokens")).cast("long")
        )
        .alias("fill_ppm"),
    )


@register(
    "q202_dsir_importance",
    oracle=f"""
WITH split_docs AS (
  SELECT doc_id, {_SQL_WORDS} AS words,
         CASE WHEN {_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} < 12 THEN 'train'
              WHEN {_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} < 14 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
bigrams AS (
  SELECT doc_id, split,
         list_extract(words, s.i) || ' ' || list_extract(words, s.i + 1) AS bigram
  FROM split_docs, unnest(generate_series(1, len(words) - 1)) AS s(i)
  WHERE len(words) >= 2
),
target_cnt AS (
  SELECT bigram, COUNT(*) AS t_cnt FROM bigrams WHERE split = 'test' GROUP BY bigram
),
raw_cnt AS (
  SELECT bigram, COUNT(*) AS r_cnt FROM bigrams WHERE split = 'train' GROUP BY bigram
),
weights AS (
  SELECT COALESCE(t.bigram, r.bigram) AS bigram,
         CAST(floor(CAST((COALESCE(t.t_cnt, 0) + 1) * 1000000 AS DOUBLE)
                    / (COALESCE(r.r_cnt, 0) + 1)) AS BIGINT) AS w_ppm
  FROM target_cnt t FULL OUTER JOIN raw_cnt r ON t.bigram = r.bigram
),
scored AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(COALESCE(w.w_ppm, 1000000)) AS BIGINT) AS weight_sum_ppm
  FROM bigrams b LEFT JOIN weights w ON b.bigram = w.bigram
  WHERE b.split = 'train'
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, weight_sum_ppm,
       CAST(weight_sum_ppm // n_bigrams AS BIGINT) AS weight_avg_ppm,
       weight_sum_ppm >= n_bigrams * 1000000 AS selected
FROM scored
""",
    tags=("training", "dsir", "importance"),
)
def q202_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    DSIR), ratio-quantized: score every train-split document by how
    much its hashed-n-gram (here: word-bigram) distribution leans
    toward the target (test-split) distribution vs the raw (train)
    distribution. Per-bigram weight = floor(1e6*(t_cnt+1)/(r_cnt+1))
    (add-one smoothing, integer ppm instead of a float log-ratio so
    both engines agree bitwise); a doc's score is the sum over its
    bigram occurrences, and `selected` keeps docs whose average
    weight exceeds parity (1e6 ppm) — a pure threshold, no global
    rank, so selection is embarrassingly parallel at 100 TB.

    Scale shape: bigram censuses collapse to vocab size with map-side
    combine before the full-outer weight join; the score join keys on
    the bigram (at 100 TB: xxhash64 feature buckets exactly as the
    paper hashes features); unseen bigrams fall back to weight 1e6
    (t=0,r=0 parity) via the LEFT join coalesce."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    tagged = (
        d.withColumn("md5_key", F.encode(F.col("doc_id").cast("string"), "utf-8"))
        .withColumn(
            "split",
            F.when(_bucket_col("md5_key") < 12, "train")
            .when(_bucket_col("md5_key") < 14, "val")
            .otherwise("test"),
        )
        .withColumn("words", _words_col())
        .filter(F.size("words") >= 2)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("words"), i),
                        F.element_at(F.col("words"), i + 1),
                    ),
                )
            ).alias("bigram"),
        )
    )
    target = (
        tagged.filter(F.col("split") == "test")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    raw = (
        tagged.filter(F.col("split") == "train")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("r_cnt"))
    )
    weights = target.join(raw, "bigram", "full").select(
        "bigram",
        F.floor(
            (F.coalesce("t_cnt", F.lit(0)) + 1).cast("double") * 1000000
            / (F.coalesce("r_cnt", F.lit(0)) + 1)
        ).cast("long").alias("w_ppm"),
    )
    scored = (
        tagged.filter(F.col("split") == "train")
        .join(weights, "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce("w_ppm", F.lit(1000000))).cast("long").alias("weight_sum_ppm"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "weight_sum_ppm",
        F.expr("weight_sum_ppm div n_bigrams").cast("long").alias("weight_avg_ppm"),
        (F.col("weight_sum_ppm") >= F.col("n_bigrams") * 1000000).alias("selected"),
    )


@register(
    "q203_temperature_sampling",
    oracle=f"""
WITH w AS (
  SELECT lang, {_SQL_WORDS} AS words FROM documents
),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(words)) AS BIGINT) AS n_words
  FROM w GROUP BY lang
),
q AS (
  SELECT lang, n_docs, n_words,
         CAST(floor(sqrt(CAST(n_words AS DOUBLE)) * 1000000) AS BIGINT) AS s_q
  FROM per_lang
),
tot AS (
  SELECT CAST(SUM(n_words) AS BIGINT) AS total_words,
         CAST(SUM(s_q) AS BIGINT) AS total_q
  FROM q
)
SELECT q.lang, q.n_docs, q.n_words,
       CAST(q.n_words * 1000000 // t.total_words AS BIGINT) AS share_ppm,
       CAST(q.s_q * 1000000 // t.total_q AS BIGINT) AS temp_share_ppm,
       CAST((q.s_q * 1000000 // t.total_q) * 1000000
            // GREATEST(q.n_words * 1000000 // t.total_words, 1) AS BIGINT) AS boost_ppm
FROM q CROSS JOIN tot t
""",
    tags=("training", "sampling", "multilingual"),
)
def q203_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual temperature sampling (mT5, Xue et al. 2021;
    alpha = 0.5): per-language word counts become sampling shares
    proportional to count^alpha, boosting low-resource languages.
    sqrt is IEEE-correctly-rounded in both engines, so quantizing
    floor(sqrt(n)*1e6) BEFORE the normalizing sum keeps every later
    step in exact integer arithmetic (the sum of doubles would be
    partition-order dependent; the sum of quantized BIGINTs is not).

    Scale: one map-side-combined groupBy to ~languages rows; the
    normalizer is a broadcast 1-row cross join. Output: raw share,
    temperature share, and the boost ratio (all ppm)."""
    d = load_table(spark, sf_dir, "documents")
    per_lang = (
        d.select("lang", F.size(_words_col()).alias("nw"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nw").cast("long").alias("n_words"),
        )
    )
    q = per_lang.withColumn(
        "s_q",
        F.floor(F.sqrt(F.col("n_words").cast("double")) * 1000000).cast("long"),
    )
    tot = q.agg(
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("s_q").cast("long").alias("total_q"),
    )
    out = q.crossJoin(F.broadcast(tot))
    share = F.expr("n_words * 1000000 div total_words")
    temp_share = F.expr("s_q * 1000000 div total_q")
    return out.select(
        "lang",
        "n_docs",
        "n_words",
        share.cast("long").alias("share_ppm"),
        temp_share.cast("long").alias("temp_share_ppm"),
        F.expr(
            "(s_q * 1000000 div total_q) * 1000000"
            " div GREATEST(n_words * 1000000 div total_words, 1)"
        ).cast("long").alias("boost_ppm"),
    )


from cli_spark.operators.text import _SQL_STOPWORDS as _SQL_STOP, _STOPWORDS as _STOP


@register(
    "q213_curation_pipeline",
    oracle=f"""
WITH feat AS (
  SELECT doc_id, source, n_chars, {_SQL_WORDS} AS words, text,
         {_BUCKET.format(key="CAST(doc_id AS VARCHAR)")} AS bkt
  FROM documents
),
gated AS (
  SELECT doc_id, source, n_chars, len(words) AS n_words, text, bkt
  FROM feat
  WHERE len(words) BETWEEN 20 AND 80
    AND CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) * 10
        BETWEEN len(words) * 30 AND len(words) * 100
    AND len(list_filter(list_distinct(words),
                        x -> list_contains({_SQL_STOP}, x))) >= 2
    AND len(list_distinct(words)) * 2 >= len(words)
),
deduped AS (
  SELECT * FROM (
    SELECT g.*, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS dup_rn
    FROM gated g
  ) WHERE dup_rn = 1
),
capped AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY source
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cap_rn
    FROM deduped d
  ) WHERE cap_rn <= 40
),
split_docs AS (
  SELECT source, n_words, n_chars,
         CASE WHEN bkt < 12 THEN 'train'
              WHEN bkt < 14 THEN 'val'
              ELSE 'test' END AS split
  FROM capped
)
SELECT split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM split_docs GROUP BY split, source
""",
    tags=("training", "pipeline", "composite"),
)
def q213_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline in ONE logical plan — the DAG a
    real training-data build runs nightly, composed from this
    engine's own stage patterns: (1) Gopher-style quality gates
    (q162's length / mean-word-length / stopword / diversity rules —
    the dominance gate, which needs a per-doc term census, stays in
    q162), (2) exact keep-first dedup on md5(text) (q71), (3) the
    per-source retention cap at K=40 by deterministic md5 rank
    (q152), (4) md5-bucket split assignment (q96), and (5) the
    per-(split, source) doc/word/char budget rollup that feeds the
    mixer (q98).

    Catalyst fuses the whole chain: the quality gates run INSIDE the
    scan (predicate stage, no shuffle), the dedup and cap windows are
    two key-only shuffles over the surviving fraction, and the final
    rollup is map-side combined. One query, three exchanges — the
    scale property a stage-by-stage pipeline of separate jobs loses
    (it would re-scan the corpus five times)."""
    d = load_table(spark, sf_dir, "documents")
    words = _words_col()
    feat = d.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        words.alias("words"),
        _bucket_col("CAST(doc_id AS STRING)").alias("bkt"),
    )
    n_words = F.size("words")
    n_letters = F.aggregate(
        F.transform("words", lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    n_distinct = F.size(F.array_distinct("words"))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct("words"), F.array(*[F.lit(s) for s in _STOP])
        )
    )
    gated = feat.filter(
        n_words.between(20, 80)
        & (n_letters * 10 >= n_words.cast("bigint") * 30)
        & (n_letters * 10 <= n_words.cast("bigint") * 100)
        & (n_stop >= 2)
        & (n_distinct * 2 >= n_words)
    ).select("doc_id", "source", "n_chars", n_words.alias("n_words"), "text", "bkt")
    dup_w = Window.partitionBy(F.md5(F.encode("text", "utf-8"))).orderBy("doc_id")
    deduped = (
        gated.withColumn("dup_rn", F.row_number().over(dup_w))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn", "text")
    )
    cap_w = Window.partitionBy("source").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), "doc_id"
    )
    capped = (
        deduped.withColumn("cap_rn", F.row_number().over(cap_w))
        .filter(F.col("cap_rn") <= 40)
    )
    split_docs = capped.select(
        "source",
        "n_words",
        "n_chars",
        F.when(F.col("bkt") < 12, "train")
        .when(F.col("bkt") < 14, "val")
        .otherwise("test")
        .alias("split"),
    )
    return split_docs.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


@register(
    "q219_feature_hash_census",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
bigrams AS (
  SELECT list_extract(words, s.i) || ' ' || list_extract(words, s.i + 1) AS bigram
  FROM w, unnest(generate_series(1, len(words) - 1)) AS s(i)
  WHERE len(words) >= 2
),
hashed AS (
  SELECT bigram,
         (strpos('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1) AS bucket,
         COUNT(*) AS cnt
  FROM bigrams GROUP BY bigram
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(SUM(cnt) AS BIGINT) AS total_occurrences,
       COUNT(*) > 1 AS collided
FROM hashed GROUP BY bucket
""",
    tags=("training", "features", "hashing"),
)
def q219_feature_hash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing collision census (Weinberger et al. 2009, the
    hashing trick): map every corpus bigram into a 256-bucket feature
    space via its md5's first byte and report, per bucket, how many
    DISTINCT bigrams collided there and their total mass — the audit
    that decides the feature-space size before training a hashed
    linear model (DSIR's importance features, q202, hash the same
    way at scale).

    Scale shape: the bigram census collapses to vocab size with
    map-side combine BEFORE bucketing (hashing rides the collapsed
    relation — one md5 per distinct bigram, not per occurrence), and
    the bucket rollup is a 256-row aggregate."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    bigrams = (
        d.withColumn("words", _words_col())
        .filter(F.size("words") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("words"), i),
                        F.element_at(F.col("words"), i + 1),
                    ),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hexpos = (
        "(instr('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1)"
    )
    hashed = bigrams.select(F.expr(hexpos).alias("bucket"), "cnt")
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
        F.sum("cnt").cast("long").alias("total_occurrences"),
        (F.count(F.lit(1)) > 1).alias("collided"),
    ).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_distinct_bigrams",
        "total_occurrences",
        "collided",
    )


@register(
    "q234_lm_fluency_score",
    oracle=f"""
WITH w AS (SELECT doc_id, {_SQL_WORDS} AS words FROM documents),
bigrams AS (
  SELECT doc_id, list_extract(words, s.i) AS w1, list_extract(words, s.i + 1) AS w2
  FROM w, unnest(generate_series(1, len(words) - 1)) AS s(i)
  WHERE len(words) >= 2
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
lm AS (
  SELECT c12.w1, c12.w2,
         CAST(c12.n12 * 1000000 // c1.n1 AS BIGINT) AS p_ppm
  FROM c12 JOIN c1 ON c12.w1 = c1.w1
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lm.p_ppm) AS BIGINT) AS p_sum_ppm,
       CAST(SUM(lm.p_ppm) // COUNT(*) AS BIGINT) AS fluency_ppm,
       CAST(MIN(lm.p_ppm) AS BIGINT) AS worst_bigram_ppm
FROM bigrams b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
GROUP BY b.doc_id
""",
    tags=("training", "lm", "fluency"),
)
def q234_lm_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring — the perplexity stand-in that needs
    no neural model and no logarithm: every document's bigrams are
    scored by the corpus conditional P(w2|w1) in integer ppm (q155's
    LM table applied back to the corpus), and a doc's fluency is the
    mean (and worst-case) conditional probability of its transitions.
    Low fluency_ppm = improbable word sequences (gibberish,
    boilerplate keyboard-mash); low worst_bigram_ppm pinpoints the
    single most broken transition.

    Scale shape: the LM table collapses to bigram-vocab size (two
    stacked map-side-combined aggregations — never a second corpus
    scan); scoring joins the per-occurrence stream against the LM on
    the bigram key (at 100 TB: xxhash64(bigram), same as q151's
    plan) and re-aggregates per doc."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    bigrams = (
        d.withColumn("words", _words_col())
        .filter(F.size("words") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("words"), i).alias("w1"),
                        F.element_at(F.col("words"), i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    lm = c12.join(c1, "w1").select(
        "w1", "w2", F.expr("n12 * 1000000 div n1").cast("long").alias("p_ppm")
    )
    return (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("p_ppm").cast("long").alias("p_sum_ppm"),
            F.expr("sum(p_ppm) div count(1)").cast("long").alias("fluency_ppm"),
            F.min("p_ppm").cast("long").alias("worst_bigram_ppm"),
        )
    )


def _pq_sql(n_sub: int, sub_dim: int, iters: int, k: int) -> str:
    """Product-quantization oracle: one q158-style unrolled Lloyd CTE
    chain PER SUBSPACE (prefixed names, pos restricted to the
    subspace's dim range; _SQL_QDIMS pos is 1-based), unioned into the
    per-(subspace, cluster) census."""
    ctes = [f"q AS ({_SQL_QDIMS})"]
    arms = []
    for s in range(n_sub):
        p = f"s{s}_"
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        ctes.append(
            f"{p}q AS (SELECT vec_id, pos, qv FROM q WHERE pos BETWEEN {lo} AND {hi})")
        ctes.append(
            f"{p}c0 AS (SELECT vec_id AS cid, pos, qv AS cv FROM {p}q WHERE vec_id < {k})")
        prev = f"{p}c0"
        for i in range(1, iters + 1):
            ctes.append(
                f"{p}a{i} AS (SELECT q.vec_id, c.cid, "
                f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
                f"FROM {p}q q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
            ctes.append(
                f"{p}m{i} AS (SELECT vec_id, cid, d2, row_number() OVER "
                f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM {p}a{i})")
            ctes.append(
                f"{p}c{i} AS (SELECT m.cid, q.pos, "
                f"CAST(floor(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv "
                f"FROM {p}q q JOIN (SELECT vec_id, cid FROM {p}m{i} WHERE rn = 1) m "
                f"ON q.vec_id = m.vec_id GROUP BY m.cid, q.pos)")
            prev = f"{p}c{i}"
        fin = iters + 1
        ctes.append(
            f"{p}a{fin} AS (SELECT q.vec_id, c.cid, "
            f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
            f"FROM {p}q q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
        ctes.append(
            f"{p}m{fin} AS (SELECT vec_id, cid, d2, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM {p}a{fin})")
        arms.append(
            f"SELECT {s} AS subspace, cid AS cluster_id, COUNT(*) AS n_members, "
            f"CAST(SUM(d2) AS BIGINT) AS sse FROM {p}m{fin} WHERE rn = 1 "
            f"GROUP BY cid")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)


_PQ_SUB, _PQ_DIM = 4, 16


@register(
    "q322_pq_codebook",
    oracle=_pq_sql(_PQ_SUB, _PQ_DIM, _KMEANS_ITERS, _KMEANS_K),
    tags=("training", "ann", "product_quantization", "iterative"),
)
def q322_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training (Jégou et al., TPAMI'11
    — the memory layer under every billion-vector ANN index): the
    64-dim space splits into 4 independent 16-dim subspaces, each
    running the q158 deterministic Lloyd (k = 4, 2 unrolled
    iterations, exact quantized-integer arithmetic, lowest-vec_id
    seeds), and the audit reports per-(subspace, centroid) membership
    and quantization SSE — the readout that sizes PQ's
    accuracy/memory tradeoff (4 subspaces × 4 codes = 1 byte per
    vector here; production uses 8–16 × 256).

    Scale shape: identical to q158 per subspace — centroid relations
    broadcast (k × sub_dim rows), distances partial-aggregate from the
    exploded-dim relation, vectors never shuffle; the 4 subspaces
    share ONE scan of the exploded dims (the pos filter splits it),
    so PQ costs the same passes as one full-width k-means."""
    q_all = _qdims(spark, sf_dir).select("vec_id", "pos", "qv")

    def assign(qd: DataFrame, cent: DataFrame) -> DataFrame:
        d = (
            qd.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv")))
                .cast("long")
                .alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    outs = []
    for s in range(_PQ_SUB):
        lo, hi = s * _PQ_DIM, (s + 1) * _PQ_DIM - 1
        qd = q_all.filter((F.col("pos") >= lo) & (F.col("pos") <= hi))
        cent = qd.filter(F.col("vec_id") < _KMEANS_K).select(
            F.col("vec_id").alias("cid"), "pos", F.col("qv").alias("cv")
        )
        for _ in range(_KMEANS_ITERS):
            members = assign(qd, cent).select("vec_id", "cid")
            cent = (
                qd.join(members, "vec_id")
                .groupBy("cid", "pos")
                .agg(
                    F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)) + 0.5)
                    .cast("long")
                    .alias("cv")
                )
            )
        outs.append(
            assign(qd, cent)
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("d2").cast("long").alias("sse"),
            )
            .select(
                F.lit(s).alias("subspace"),
                F.col("cid").alias("cluster_id"),
                "n_members",
                "sse",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _ivfpq_sql(n_sub: int, sub_dim: int, iters: int, k: int) -> str:
    """IVF-PQ oracle: the shared coarse Lloyd chain (_kmeans_ctes),
    centroids RE-ESTIMATED from the final assignment (the documented
    residual reference — derivable from the membership without
    re-running the loop), the residual relation, then one q322-style
    unrolled PQ chain per subspace over the residuals."""
    ctes, members = _kmeans_ctes(iters, k)
    ctes.append(
        f"fm AS (SELECT vec_id, cid FROM {members} WHERE rn = 1)")
    ctes.append(
        "cent3 AS (SELECT fm.cid, q.pos, "
        "CAST(floor(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv "
        "FROM q JOIN fm ON q.vec_id = fm.vec_id GROUP BY fm.cid, q.pos)")
    ctes.append(
        "r AS (SELECT q.vec_id, q.pos, q.qv - c.cv AS qv "
        "FROM q JOIN fm ON q.vec_id = fm.vec_id "
        "JOIN cent3 c ON c.cid = fm.cid AND c.pos = q.pos)")
    arms = []
    for s in range(n_sub):
        p = f"r{s}_"
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        ctes.append(
            f"{p}q AS (SELECT vec_id, pos, qv FROM r WHERE pos BETWEEN {lo} AND {hi})")
        ctes.append(
            f"{p}c0 AS (SELECT vec_id AS cid, pos, qv AS cv FROM {p}q WHERE vec_id < {k})")
        prev = f"{p}c0"
        for i in range(1, iters + 1):
            ctes.append(
                f"{p}a{i} AS (SELECT q.vec_id, c.cid, "
                f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
                f"FROM {p}q q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
            ctes.append(
                f"{p}m{i} AS (SELECT vec_id, cid, d2, row_number() OVER "
                f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM {p}a{i})")
            ctes.append(
                f"{p}c{i} AS (SELECT m.cid, q.pos, "
                f"CAST(floor(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv "
                f"FROM {p}q q JOIN (SELECT vec_id, cid FROM {p}m{i} WHERE rn = 1) m "
                f"ON q.vec_id = m.vec_id GROUP BY m.cid, q.pos)")
            prev = f"{p}c{i}"
        fin = iters + 1
        ctes.append(
            f"{p}a{fin} AS (SELECT q.vec_id, c.cid, "
            f"CAST(SUM((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2 "
            f"FROM {p}q q JOIN {prev} c ON q.pos = c.pos GROUP BY q.vec_id, c.cid)")
        ctes.append(
            f"{p}m{fin} AS (SELECT vec_id, cid, d2, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM {p}a{fin})")
        arms.append(
            f"SELECT {s} AS subspace, cid AS code, COUNT(*) AS n_members, "
            f"CAST(SUM(d2) AS BIGINT) AS residual_sse FROM {p}m{fin} WHERE rn = 1 "
            f"GROUP BY cid")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)


@register(
    "q355_ivfpq_residual",
    oracle=_ivfpq_sql(_PQ_SUB, _PQ_DIM, _KMEANS_ITERS, _KMEANS_K),
    tags=("training", "ann", "ivf", "product_quantization", "iterative"),
)
def q355_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ RESIDUAL codebook training (Jégou et al. TPAMI'11 §V —
    the composition FAISS's IVFPQ index actually runs, completing
    q84's coarse-bucket IVF and q322's direct-space PQ): vectors are
    assigned to q158's deterministic coarse centroids, each vector is
    replaced by its RESIDUAL to the re-estimated centroid of its
    coarse cell (residuals are what PQ quantizes in an IVF index —
    they concentrate near zero, so the same code budget buys less
    distortion than direct PQ), and the 4×16-dim PQ Lloyd then trains
    on the residual space. Output per (subspace, code): membership
    and residual SSE, all in exact quantized-integer arithmetic.

    Scale shape: the coarse assignment is the cached q158 membership
    (localCheckpointed, shared with SemDeDup); residual construction
    is one keyed join against the broadcast (k × 64)-row centroid
    relation — vectors never shuffle; the PQ stage inherits q322's
    plan (per-iteration broadcast centroid joins over the shared
    exploded-dim scan, exchange count = the unrolled iteration
    budget, none fact-wide)."""
    q_all = _qdims(spark, sf_dir).select("vec_id", "pos", "qv")
    members = _kmeans_membership(spark, sf_dir).select("vec_id", "cid")
    cent3 = (
        q_all.join(members, "vec_id")
        .groupBy("cid", "pos")
        .agg(
            F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)) + 0.5)
            .cast("long")
            .alias("cv")
        )
    )
    r_all = (
        q_all.join(members, "vec_id")
        .join(F.broadcast(cent3), ["cid", "pos"])
        .select("vec_id", "pos", (F.col("qv") - F.col("cv")).alias("qv"))
    )

    def assign(qd: DataFrame, cent: DataFrame) -> DataFrame:
        d = (
            qd.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv")))
                .cast("long")
                .alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    outs = []
    for s in range(_PQ_SUB):
        lo, hi = s * _PQ_DIM, (s + 1) * _PQ_DIM - 1
        qd = r_all.filter((F.col("pos") >= lo) & (F.col("pos") <= hi))
        cent = qd.filter(F.col("vec_id") < _KMEANS_K).select(
            F.col("vec_id").alias("cid"), "pos", F.col("qv").alias("cv")
        )
        for _ in range(_KMEANS_ITERS):
            m = assign(qd, cent).select("vec_id", "cid")
            cent = (
                qd.join(m, "vec_id")
                .groupBy("cid", "pos")
                .agg(
                    F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)) + 0.5)
                    .cast("long")
                    .alias("cv")
                )
            )
        outs.append(
            assign(qd, cent)
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("d2").cast("long").alias("residual_sse"),
            )
            .select(
                F.lit(s).alias("subspace"),
                F.col("cid").alias("code"),
                "n_members",
                "residual_sse",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# q378: deterministic span-start draw — md5 byte of (doc_id, token
# position), the q105 portable-hex idiom.
_SPAN_BYTE = (
    "(instr('0123456789abcdef', substr(md5({key}), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5({key}), 2, 1)) - 1"
)

_SPAN_CORE = """
WITH toks AS (
  SELECT doc_id, lang, pos
  FROM (SELECT doc_id, lang, {words} AS w FROM documents){lat}
),
marked AS (
  SELECT doc_id, lang, pos,
         CASE WHEN {byte} < 13 THEN 1 ELSE 0 END AS is_start
  FROM toks
),
spans AS (
  SELECT doc_id, lang, pos, is_start,
         MAX(is_start) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS corrupted
  FROM marked
),
runs AS (
  SELECT doc_id, lang, corrupted,
         CASE WHEN corrupted = 1 AND COALESCE(LAG(corrupted) OVER (
                PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS sentinel_open
  FROM spans
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(corrupted) AS BIGINT) AS n_corrupted,
       CAST(SUM(sentinel_open) AS BIGINT) AS n_sentinels,
       CAST(SUM(corrupted) * 1000000 {div} COUNT(*) AS BIGINT)
         AS corruption_ppm
FROM runs
GROUP BY lang
"""


@register(
    "q378_span_corruption_mask",
    oracle=_SPAN_CORE.format(
        words=_SQL_WORDS,
        lat=", LATERAL (SELECT UNNEST(generate_series(1, len(w))) AS pos)",
        byte=_SPAN_BYTE.format(
            key="CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"),
        div="//",
    ),
    tags=("training", "masking", "t5"),
)
def q378_span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption planning (Raffel et al., JMLR'20):
    every token position draws a deterministic md5 byte; positions
    under 13/256 ≈ 5% open a 3-token corruption span, overlapping
    spans merge, and each maximal corrupted run is one sentinel —
    start density × mean span ≈ the 15% noise target, with the merge
    making realized corruption measurable rather than assumed (the
    statistic an actual pretraining mix is tuned on). Census per
    lang: tokens, corrupted tokens, sentinel count, realized ppm.

    Shapes that survive 100 TB: the mask is a pure expression over
    (doc_id, pos) — no RNG state to synchronize across executors, so
    the same corpus always yields the same masks (reproducible
    pretraining), and the merge is a 2-row-bounded window within
    doc_id — no cross-document state. Sentinel counting is the q201
    gaps-and-islands open-edge trick (corrupted AND NOT
    lag(corrupted))."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SPAN_CORE.format(
        words="filter(split(lower(text), ' '), w -> w != '')",
        lat=" LATERAL VIEW posexplode(w) AS pos0, _tok",
        byte=_SPAN_BYTE.format(
            key="CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING)"),
        div="div",
    ).replace("SELECT doc_id, lang, pos\n  FROM",
              "SELECT doc_id, lang, pos0 + 1 AS pos\n  FROM"))


@register(
    "q398_sequence_packing",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
         len(list_filter(string_split(text, ' '), x -> x != '')) AS tok,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
),
fold AS (
  SELECT lang, rn, tok, 1 AS bin, tok AS cum
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.rn, t.tok,
         CASE WHEN f.cum + t.tok <= 512 THEN f.bin ELSE f.bin + 1 END,
         CASE WHEN f.cum + t.tok <= 512 THEN f.cum + t.tok ELSE t.tok END
  FROM fold f JOIN toks t ON t.lang = f.lang AND t.rn = f.rn + 1
)
SELECT lang, CAST(bin AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS tok_sum,
       CAST(1000000 * SUM(tok) // 512 AS BIGINT) AS fill_ppm
FROM fold GROUP BY lang, bin
""",
    tags=("training", "packing", "pandas_udf"),
)
def q398_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTEXT-WINDOW SEQUENCE PACKING (next-fit): assign documents,
    in deterministic corpus order, to 512-token training contexts —
    a new context opens whenever the incoming doc would overflow the
    current one (oversize docs get a context of their own). This is
    the pretraining batch-prep step that turns a deduped corpus into
    fixed-length examples; fill_ppm per context is the padding-waste
    metric that decides between next-fit and offline bin packing.
    Packing is a SEQUENTIAL fold — each doc's context depends on
    every prior doc — so it cannot be a window/prefix-sum (the
    remaining-capacity state RESETS on overflow, breaking
    associativity). The scalable contract: order only matters WITHIN
    a shard (here lang; at 100 TB, input file or dedup-shard), so
    each shard folds independently in one Arrow-batched
    `applyInPandas` pass, O(docs) per shard with no cross-shard
    traffic, and the context census aggregates distributed. The
    oracle replays the identical fold as a per-lang recursive CTE."""
    import pandas as pd

    budget = 512
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .alias("tok"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        bin_id, cum = 0, 0
        for tok in pdf["tok"]:
            if bin_id == 0 or cum + tok > budget:
                bin_id += 1
                cum = int(tok)
            else:
                cum += int(tok)
            bins.append(bin_id)
        pdf["bin_id"] = bins
        return pdf[["lang", "bin_id", "tok"]]

    packed = d.groupBy("lang").applyInPandas(
        pack, schema="lang string, bin_id long, tok long"
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("tok_sum"),
        F.expr("CAST(1000000 * sum(tok) DIV 512 AS BIGINT)").alias("fill_ppm"),
    )
