"""Round-11 operators: the end-to-end dedup flagship plus six new
surfaces (weighted reservoir sampling, naive-Bayes lang-ID, KMV
distinct sketches, largest-remainder split allocation, CDC log
compaction, per-source language-mixture KL drift).

Shared discipline (the q273/q392 rules): every cross-engine float
step is ONE identical IEEE chain shared verbatim between the Spark
expression and the DuckDB oracle, floored to integer micro/ppm units
BEFORE any aggregation, so sums are order-independent and the
hash-compare is exact. Deterministic randomness comes from md5 of a
row key (the q105 idiom), never from an RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.dedup import (
    _SQL_SHINGLES,
    prefix_filter_candidates,
    shingles_df,
)
from cli_spark.operators.graph import connected_components
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# 60-bit integer from the first 15 hex chars of md5(key) — the
# established cross-engine hash idiom (dedup.py minhash lanes).
_H60_SPARK = "CAST(conv(substr(md5(CAST({key} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
_H60_DUCK = "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
_TWO60 = "1152921504606846976.0"  # 2^60 as a double literal


# Single-slot per-session registry for the md5(text) exact-family +
# Jaccard>=0.5 connected-components chain shared by q446 (the dedup
# flagship ledger) and q463 (the cluster TF-IDF labels) — the same
# pattern and rationale as dedup.py's _FAMILY_CACHE: the chain is the
# dominant cost of both queries, identical between them, and consumed
# multiple times per invocation; the slot is evicted on dataset
# change, so a long parity/driver session holds at most one
# materialization.
_CLUSTER_CACHE: dict[tuple, tuple] = {}
# Companion single-slot cache: the chain's qualifying-pair relation
# (doc_a, doc_b, inter, un) WITH its Jaccard components — filled by
# the same exact_family_clusters run (one chain, two artifacts). q480
# reads the whole curve off it; without the slot it would re-pay the
# shingle + prefix-filter + verify chain (~16 s warm at sf0.1) that
# the cluster cache already paid for q446.
_QP_CACHE: dict[tuple, "DataFrame"] = {}


def qualifying_pairs(spark: SparkSession, sf_dir: str):
    """(doc_a, doc_b, inter, un): the q446 chain's Jaccard >= 0.5
    qualifying pairs with intersection/union sizes, from the shared
    single-slot session cache (built by exact_family_clusters)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _QP_CACHE:
        exact_family_clusters(spark, sf_dir)
    return _QP_CACHE[key]


def exact_family_clusters(spark: SparkSession, sf_dir: str):
    """(fam, reps, cc): per-doc exact-family keys (doc_id, fkey =
    md5(text)), family representatives (fkey, rep = min doc_id), and
    near-dup components over the representatives (doc_id, component)
    from the prefix-filter Jaccard >= 0.5 join + connected components
    — stages 1-2 of the q446 flagship, shared verbatim with q463.
    fam/reps/cc are persisted under the single-slot cache; the rep
    shingle relation is released as soon as cc materializes."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _CLUSTER_CACHE:
        return _CLUSTER_CACHE[key]
    d = load_table(spark, sf_dir, "documents")
    fam = d.select("doc_id", F.md5("text").alias("fkey")).persist()
    reps = fam.groupBy("fkey").agg(F.min("doc_id").alias("rep")).persist()
    # The rep shingle relation feeds FOUR consumers — the candidate
    # generator's prefix self-join (which evaluates its upstream
    # twice) and both sides of the verify join — so without a cache
    # the trigram shingle expression (split + transform +
    # array_distinct per doc) runs ~5x per invocation.
    sh = (
        shingles_df(spark, sf_dir, fanout=True)
        .join(reps.select(F.col("rep").alias("doc_id")), "doc_id")
        .filter(F.size("shingles") > 0)
        .select("doc_id", "shingles", F.size("shingles").alias("n"))
        .persist()
    )
    _, cand = prefix_filter_candidates(spark, sf_dir, sh=sh)
    av = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("shingles").alias("sa"), F.col("n").alias("na"))
    bv = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("shingles").alias("sb"), F.col("n").alias("nb"))
    qp = (
        cand.join(av, "doc_a").join(bv, "doc_b")
        .withColumn("inter",
                    F.size(F.array_intersect("sa", "sb")).cast("long"))
        .withColumn("un",
                    (F.col("na") + F.col("nb") - F.col("inter"))
                    .cast("long"))
        .filter(2 * F.col("inter") >= F.col("un"))
        .select("doc_a", "doc_b", "inter", "un")
        .persist()
    )
    edges = qp.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .unionByName(qp.select(F.col("doc_b").alias("src"),
                               F.col("doc_a").alias("dst")))
    cc = connected_components(
        reps.select(F.col("rep").alias("doc_id")), edges).persist()
    cc.count()  # materialize so the shingle relation can be released
    qp.count()  # qp too — it outlives sh in the companion cache slot
    sh.unpersist()
    for stale in [k for k in _CLUSTER_CACHE if k != key]:
        for df in _CLUSTER_CACHE.pop(stale):
            try:
                df.unpersist()
            except Exception:
                pass  # entry may belong to an already-stopped session
    for stale in [k for k in _QP_CACHE if k != key]:
        try:
            _QP_CACHE.pop(stale).unpersist()
        except Exception:
            pass
    _QP_CACHE[key] = qp
    _CLUSTER_CACHE[key] = (fam, reps, cc)
    return fam, reps, cc


@register(
    "q446_dedup_pipeline_flagship",
    oracle=f"""
WITH RECURSIVE fam AS (
  SELECT doc_id, md5(text) AS fkey FROM documents
),
st AS (SELECT min(doc_id) AS doc_id FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, s.shingles, len(s.shingles) AS n
  FROM shall s JOIN st USING (doc_id)
  WHERE len(s.shingles) > 0
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sz),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
qp AS (
  SELECT p.da, p.db
  FROM pr p
  JOIN sz sa ON sa.doc_id = p.da
  JOIN sz sb ON sb.doc_id = p.db
  WHERE 2 * p.inter >= sa.n + sb.n - p.inter
),
edges AS (
  SELECT da AS src, db AS dst FROM qp
  UNION ALL SELECT db, da FROM qp
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM st
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
cc AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
c0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM st),
c2 AS (SELECT CAST(COUNT(DISTINCT comp) AS BIGINT) AS c FROM cc)
SELECT '1_exact_family' AS stage, c0.c AS n_in,
       c0.c - c1.c AS n_removed, c1.c AS n_out,
       CAST((c0.c - c1.c) * 1000000 // c0.c AS BIGINT) AS removed_ppm
FROM c0, c1
UNION ALL
SELECT '2_neardup_cc', c1.c, c1.c - c2.c, c2.c,
       CAST((c1.c - c2.c) * 1000000 // c1.c AS BIGINT)
FROM c1, c2
UNION ALL
SELECT '3_manifest', c0.c, c0.c - c2.c, c2.c,
       CAST((c0.c - c2.c) * 1000000 // c0.c AS BIGINT)
FROM c0, c2
""",
    tags=("dedup", "pipeline", "flagship", "graph"),
)
def q446_dedup_pipeline_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END DEDUP FLAGSHIP (VERDICT r10 #7) — the full
    production chain as one audited run with a per-stage loss ledger
    (the q400 accounting pattern applied to dedup):

      stage 1  exact-family collapse  md5(text) keying, min-doc rep —
               removes byte-identical copies and, crucially, keeps
               them OUT of the similarity join's candidate generator
               (the q392/q440 lesson: candidates must ride distinct-
               text volume, never raw-copy volume);
      stage 2  prefix-filter Jaccard >= 0.5 join over the surviving
               representatives (lossless Bayardo/Chaudhuri prefix
               bound), then connected components over the qualifying
               pair graph (hook + pointer-jump, O(log d) rounds) —
               each near-dup cluster keeps one canonical doc;
      stage 3  the manifest line: raw corpus -> canonical corpus.

    Ledger columns (stage, n_in, n_removed, n_out, removed_ppm) in
    exact integer arithmetic. At 100 TB this ledger IS the per-batch
    report a curation team signs off on: stage-1 rides one md5
    shuffle, stage-2's candidate relation is duplication-invariant by
    construction, and the CC loop shuffles only edge-participating
    reps (isolated reps never iterate). The DuckDB oracle recomputes
    the whole chain — including the transitive closure — from scratch
    on the unfiltered all-pairs relation, so the hash match is an
    empirical proof of both the prefix bound and the cluster
    resolution."""
    # Round 12: stages 1-2 come from the exact_family_clusters
    # single-slot cache shared with q463's labeling pass — same
    # chain, same results, computed once per (session, dataset).
    fam, reps, cc = exact_family_clusters(spark, sf_dir)
    n0 = load_table(spark, sf_dir, "documents").count()
    n1 = reps.count()
    n2 = cc.select("component").distinct().count()
    rows = [
        ("1_exact_family", n0, n0 - n1, n1, (n0 - n1) * 1_000_000 // n0),
        ("2_neardup_cc", n1, n1 - n2, n2, (n1 - n2) * 1_000_000 // n1),
        ("3_manifest", n0, n0 - n2, n2, (n0 - n2) * 1_000_000 // n0),
    ]
    return spark.createDataFrame(
        rows,
        "stage string, n_in long, n_removed long, n_out long, "
        "removed_ppm long",
    )


# A-ES key chain, shared verbatim: u = (h + 1) / 2^60 in (0, 1],
# key = ln(u) / w — monotone in u^(1/w), so top-k by key descending
# IS Efraimidis–Spirakis weighted sampling without replacement.
_AES_KEY = (
    "ln((CAST(h AS DOUBLE) + 1.0) / " + _TWO60 + ") / CAST(w AS DOUBLE)"
)


@register(
    "q447_weighted_reservoir_aes",
    oracle=f"""
WITH keyed AS (
  SELECT lang, doc_id,
         GREATEST(n_chars, 1) AS w,
         {_H60_DUCK.format(key='doc_id')} AS h
  FROM documents
),
scored AS (
  SELECT lang, doc_id, w,
         {_AES_KEY} AS k
  FROM keyed
),
ranked AS (
  SELECT lang, doc_id, w, k,
         row_number() OVER (PARTITION BY lang
                            ORDER BY k DESC, doc_id ASC) AS pick
  FROM scored
)
SELECT lang, CAST(pick AS BIGINT) AS pick, doc_id, w,
       CAST(floor(k * 1000000.0) AS BIGINT) AS key_micro
FROM ranked WHERE pick <= 10
""",
    tags=("sampling", "weighted", "reservoir", "deterministic"),
)
def q447_weighted_reservoir_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED RESERVOIR SAMPLING without replacement per language —
    the Efraimidis–Spirakis A-ES algorithm (IPL 2006): each item
    draws u ~ U(0,1] and survives by the key u^(1/w); the k largest
    keys are EXACTLY a weighted sample without replacement. Here the
    draw is the deterministic 60-bit md5 lane (the q105 idiom), the
    key is ln(u)/w (monotone in u^(1/w) — avoids the underflow
    u^(1/w) hits when w is large), and k = 10 per language with
    doc_id tie-break. Weights = n_chars: longer documents
    proportionally likelier, the "sample by token mass" step of every
    data-mixing recipe.

    Scale shape: a pure projection (hash + one ln per row) and ONE
    per-group top-k window that Spark executes as WindowGroupLimit
    (rank pushdown keeps per-partition heaps of k, never a full
    sort-materialize of the corpus). A-ES is also mergeable — take
    the k best keys of any union of reservoirs — which is what makes
    it THE distributed weighted sampler at 100 TB. The one float step
    (ln chain) is shared verbatim with the oracle and floored to
    micro units only for display."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "lang", "doc_id",
        F.greatest("n_chars", F.lit(1)).alias("w"),
        F.expr(_H60_SPARK.format(key="doc_id")).alias("h"),
    )
    scored = keyed.withColumn("k", F.expr(_AES_KEY))
    ranked = scored.withColumn(
        "pick",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("k").desc(),
                                               F.col("doc_id").asc())
        ),
    )
    return ranked.filter(F.col("pick") <= 10).select(
        "lang", F.col("pick").cast("long").alias("pick"), "doc_id", "w",
        F.expr("CAST(floor(k * 1000000.0) AS BIGINT)").alias("key_micro"),
    )


# Per-(token, lang) log-likelihood, floored to an INTEGER before the
# per-document sum so summation order cannot move the result:
# llk = floor(1e6 * ln((cnt + 1) / (tot_lang + V)))  (Laplace).
_NB_LLK = (
    "CAST(floor(1000000.0 * ln((CAST(cnt AS DOUBLE) + 1.0) / "
    "(CAST(tot AS DOUBLE) + CAST(v AS DOUBLE)))) AS BIGINT)"
)
_NB_PRIOR = (
    "CAST(floor(1000000.0 * ln(CAST(nl AS DOUBLE) / "
    "CAST(ntr AS DOUBLE))) AS BIGINT)"
)


@register(
    "q448_naive_bayes_langid",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(
    list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
  FROM documents
),
tr AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
te AS (SELECT doc_id, lang, t, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
cnt_lt AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tr GROUP BY lang, t),
tot_l AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot
          FROM tr GROUP BY lang),
voc AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM tr),
prior AS (
  SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nl
  FROM tr GROUP BY lang
),
ntr AS (SELECT CAST(SUM(nl) AS BIGINT) AS ntr FROM prior),
staged AS (
  SELECT te.doc_id, te.lang AS actual, tl.lang AS cand, te.c,
         COALESCE(cl.cnt, 0) AS cnt, tl.tot AS tot, voc.v AS v
  FROM te
  CROSS JOIN tot_l tl
  CROSS JOIN voc
  LEFT JOIN cnt_lt cl ON cl.lang = tl.lang AND cl.t = te.t
),
tokscore AS (
  SELECT doc_id, actual, cand, c * ({_NB_LLK}) AS part
  FROM staged
),
priored AS (
  SELECT lang AS cand, {_NB_PRIOR} AS prior_micro
  FROM prior CROSS JOIN ntr
),
docscore AS (
  SELECT ts.doc_id, ts.actual, ts.cand,
         pr.prior_micro + SUM(ts.part) AS score
  FROM tokscore ts
  JOIN priored pr ON pr.cand = ts.cand
  GROUP BY ts.doc_id, ts.actual, ts.cand, pr.prior_micro
),
pred AS (
  SELECT doc_id, actual, cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand ASC) AS rn
  FROM docscore
)
SELECT actual, cand AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY actual, cand
""",
    tags=("text", "classification", "langid", "ml"),
)
def q448_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTINOMIAL NAIVE BAYES language identification, trained and
    scored inside the engine — the classical quality/domain classifier
    of corpus pipelines (fastText-style gating before anything
    expensive runs). Train split = even doc_ids, test = odd. Model:
    Laplace-smoothed token log-likelihoods ln((cnt+1)/(tot_l+V)) and
    document-count priors; every log is floored to an INTEGER micro
    unit per (token, lang) BEFORE the per-document sum, so the score
    is a sum of integers — order-independent, hence bit-exact across
    engines (a raw double sum would differ by summation order).
    Prediction = argmax with lang tie-break; output is the confusion
    matrix (actual x predicted x count).

    Scale shape: the model (lang x vocab llk table, lang totals, V)
    is a broadcastable dimension built with two aggregates over the
    train tokens; scoring is explode -> broadcast-join -> reduce, one
    shuffle on (doc, cand). 100-TB inference with a 5-lang model
    never shuffles fact text — only (doc_id, token, count) triples."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t"),
    )
    tr = toks.filter(F.col("doc_id") % 2 == 0)
    te = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", F.col("lang").alias("actual"), "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnt_lt = tr.groupBy(F.col("lang").alias("cand"), "t").agg(
        F.count(F.lit(1)).alias("cnt"))
    tot_l = tr.groupBy(F.col("lang").alias("cand")).agg(
        F.count(F.lit(1)).alias("tot"))
    v = tr.select(F.countDistinct("t").alias("v"))
    prior = tr.groupBy(F.col("lang").alias("cand")).agg(
        F.countDistinct("doc_id").alias("nl"))
    ntr = prior.agg(F.sum("nl").alias("ntr"))
    tokscore = (
        te.crossJoin(F.broadcast(tot_l))
        .crossJoin(F.broadcast(v))
        .join(F.broadcast(cnt_lt), ["cand", "t"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .select(
            "doc_id", "actual", "cand",
            (F.col("c") * F.expr(_NB_LLK)).alias("part"),
        )
    )
    docscore = (
        tokscore.groupBy("doc_id", "actual", "cand")
        .agg(F.sum("part").alias("toksum"))
        .join(F.broadcast(prior), "cand")
        .crossJoin(F.broadcast(ntr))
        .select(
            "doc_id", "actual", "cand",
            (F.expr(_NB_PRIOR) + F.col("toksum")).alias("score"),
        )
    )
    pred = docscore.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                                 F.col("cand").asc())
        ),
    ).filter(F.col("rn") == 1)
    return pred.groupBy("actual", F.col("cand").alias("predicted")).agg(
        F.count(F.lit(1)).alias("n_docs"))


# KMV estimate chain, shared verbatim: with k = 64 minima over
# 60-bit hashes, distinct ~= (k - 1) * 2^60 / h_k (double to avoid
# the 63 * 2^60 BIGINT overflow; floored once).
_KMV_EST = (
    "CAST(floor(63.0 * " + _TWO60 + " / CAST(hk AS DOUBLE)) AS BIGINT)"
)


@register(
    "q449_kmv_distinct_sketch",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT source,
         {_H60_DUCK.format(key='t')} AS h
  FROM (
    SELECT source, unnest(
      list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
    FROM documents
  )
),
pools AS (
  SELECT source, h FROM toks
  UNION ALL
  SELECT '__union__' AS source, h FROM (SELECT DISTINCT h FROM toks)
),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS nd
  FROM pools
),
per AS (
  SELECT source, CAST(MAX(nd) AS BIGINT) AS exact_distinct,
         MIN(CASE WHEN rn = 64 THEN h END) AS hk
  FROM ranked GROUP BY source
),
est AS (
  SELECT source, exact_distinct,
         CASE WHEN exact_distinct < 64 THEN exact_distinct
              ELSE {_KMV_EST} END AS kmv_estimate
  FROM per
)
SELECT source, exact_distinct,
       CAST(kmv_estimate AS BIGINT) AS kmv_estimate,
       CAST(abs(kmv_estimate - exact_distinct) * 1000000
            // exact_distinct AS BIGINT) AS err_ppm
FROM est
""",
    tags=("sketch", "distinct", "kmv", "mergeable"),
)
def q449_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002;
    the bottom-k theta sketch): per source, keep the k = 64 smallest
    60-bit token hashes; distinct ~= (k-1) * 2^60 / h_k. The '__union__'
    row demonstrates the property that makes KMV the 100-TB
    cardinality tool: sketches MERGE by taking the k smallest of the
    union of the pools — the union estimate is computed from exactly
    the same bottom-k rule applied to the merged hash set, never from
    re-scanning the parts. Each row also carries the exact distinct
    count and the realized error in ppm, so the sketch's accuracy
    contract (~1/sqrt(k) ~ 12.5%) is auditable in the result itself.

    Engine shape: distinct (source, hash) reduction (map-side
    combine), one per-source bottom-k window (WindowGroupLimit-style:
    per-partition heaps of 64, no full sort), integer/shared-chain
    arithmetic end to end. Sources with fewer than k distinct tokens
    report exactly (the sketch IS the set below k)."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("t"),
        )
        .select("source", F.expr(_H60_SPARK.format(key="t")).alias("h"))
        .distinct()
    )
    pools = toks.unionByName(
        toks.select(F.lit("__union__").alias("source"), "h").distinct())
    ranked = pools.select(
        "source", "h",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("h").asc())
        ).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("nd"),
    )
    per = ranked.groupBy("source").agg(
        F.max("nd").cast("long").alias("exact_distinct"),
        F.min(F.when(F.col("rn") == 64, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("exact_distinct") < 64, F.col("exact_distinct")
    ).otherwise(F.expr(_KMV_EST))
    return per.select(
        "source", "exact_distinct",
        est.cast("long").alias("kmv_estimate"),
    ).withColumn(
        "err_ppm",
        F.expr("CAST(abs(kmv_estimate - exact_distinct) * 1000000 "
               "DIV exact_distinct AS BIGINT)"),
    )


@register(
    "q450_largest_remainder_split",
    oracle="""
WITH strata AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
alloc AS (
  SELECT lang, n, 'train' AS split, n * 8 // 10 AS base,
         n * 8 % 10 AS rem, 0 AS prio FROM strata
  UNION ALL
  SELECT lang, n, 'val', n // 10, n % 10, 1 FROM strata
  UNION ALL
  SELECT lang, n, 'test', n // 10, n % 10, 2 FROM strata
),
seats AS (
  SELECT lang, n, split, base, prio,
         n - SUM(base) OVER (PARTITION BY lang) AS leftover,
         row_number() OVER (PARTITION BY lang
                            ORDER BY rem DESC, prio ASC) AS rn
  FROM alloc
),
quota AS (
  SELECT lang, split, prio,
         CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS quota
  FROM seats
),
cuts AS (
  SELECT lang,
         MAX(CASE WHEN split = 'train' THEN quota END) AS tq,
         MAX(CASE WHEN split = 'val' THEN quota END) AS vq
  FROM quota GROUP BY lang
),
assigned AS (
  SELECT d.lang,
         CASE WHEN rk <= c.tq THEN 'train'
              WHEN rk <= c.tq + c.vq THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                       doc_id ASC) AS rk
    FROM documents
  ) d JOIN cuts c ON c.lang = d.lang
)
SELECT q.lang, q.split, q.quota,
       CAST(COALESCE(a.n_assigned, 0) AS BIGINT) AS n_assigned
FROM quota q
LEFT JOIN (
  SELECT lang, split, COUNT(*) AS n_assigned
  FROM assigned GROUP BY lang, split
) a ON a.lang = q.lang AND a.split = q.split
""",
    tags=("sampling", "split", "allocation", "deterministic"),
)
def q450_largest_remainder_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-PROPORTION train/val/test allocation by the LARGEST-
    REMAINDER (Hamilton) method, per language stratum: quotas are
    floor(n*p) seats plus one extra seat per leftover unit, awarded
    in descending fractional-remainder order (train > val > test
    tie-break) — so per-stratum quotas sum EXACTLY to n and the
    realized 80/10/10 mix is as close to proportional as integers
    allow (naive independent rounding drifts by up to one doc per
    class per stratum, which at 100 TB is millions of documents of
    systematic mix error). Documents are then assigned by rank in the
    deterministic md5 order (the q96/q105 discipline: membership is
    stable under corpus growth re-ranking only within the stratum).
    Output audits quota vs realized count per (lang, split) — equal
    by construction, and the oracle re-derives both sides.

    Engine shape: one tiny per-lang census, a 3-row-per-stratum seat
    table (two windows over 3xL rows), one rank window over the
    corpus, one census — no joins of fact rows against fact rows."""
    d = load_table(spark, sf_dir, "documents")
    strata = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    alloc = strata.selectExpr(
        "lang", "n",
        "stack(3, "
        " 'train', n * 8 div 10, n * 8 % 10, 0, "
        " 'val',   n div 10,     n % 10,     1, "
        " 'test',  n div 10,     n % 10,     2"
        ") AS (split, base, rem, prio)",
    )
    seats = alloc.select(
        "lang", "n", "split", "base", "prio",
        (F.col("n") - F.sum("base").over(Window.partitionBy("lang")))
        .alias("leftover"),
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("rem").desc(),
                                               F.col("prio").asc())
        ).alias("rn"),
    )
    quota = seats.select(
        "lang", "split", "prio",
        (F.col("base")
         + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0))
        .cast("long").alias("quota"),
    )
    cuts = quota.groupBy("lang").agg(
        F.max(F.when(F.col("split") == "train", F.col("quota"))).alias("tq"),
        F.max(F.when(F.col("split") == "val", F.col("quota"))).alias("vq"),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.expr("md5(CAST(doc_id AS STRING))").asc(),
            F.col("doc_id").asc())
    )
    assigned = (
        d.select("lang", "doc_id").withColumn("rk", rk)
        .join(F.broadcast(cuts), "lang")
        .select(
            "lang",
            F.when(F.col("rk") <= F.col("tq"), "train")
            .when(F.col("rk") <= F.col("tq") + F.col("vq"), "val")
            .otherwise("test").alias("split"),
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_assigned"))
    )
    return quota.select("lang", "split", "quota").join(
        assigned, ["lang", "split"], "left"
    ).select(
        "lang", "split", "quota",
        F.coalesce("n_assigned", F.lit(0)).cast("long").alias("n_assigned"),
    )


# Deterministic delete decision: first md5 byte of the order key < 85
# (~1/3 of keys that reach version 2 end tombstoned).
_CDC_BYTE = (
    "(instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS {vch})), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', "
    "substr(md5(CAST(o_orderkey AS {vch})), 2, 1)) - 1"
)


@register(
    "q451_cdc_log_compaction",
    oracle=f"""
WITH log AS (
  SELECT o_orderkey, o_orderstatus, v,
         CASE WHEN v = 0 THEN 'I'
              WHEN v = 1 THEN 'U'
              WHEN ({_CDC_BYTE.format(vch='VARCHAR')}) < 85 THEN 'D'
              ELSE 'U' END AS op,
         CAST(floor(o_totalprice * 100.0) AS BIGINT) + v AS value_cents
  FROM orders, unnest(generate_series(0, o_orderkey % 3)) AS t(v)
),
last AS (
  SELECT o_orderkey, o_orderstatus, op, value_cents,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY v DESC) AS rn
  FROM log
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(*) FILTER (WHERE op != 'D') AS BIGINT) AS n_live,
       CAST(COUNT(*) FILTER (WHERE op = 'D') AS BIGINT) AS n_tombstoned,
       CAST(COALESCE(SUM(value_cents) FILTER (WHERE op != 'D'), 0)
            AS BIGINT) AS live_value_cents
FROM last WHERE rn = 1
GROUP BY o_orderstatus
""",
    tags=("cdc", "compaction", "incremental"),
)
def q451_cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC LOG COMPACTION — last-writer-wins with tombstones, the
    Kafka-compacted-topic / Delta-change-feed apply step that turns a
    change log (INSERT / UPDATE / DELETE per key, ordered by version)
    back into current state. The log is derived deterministically
    from orders: key k gets versions 0..(k mod 3) (I, then U, then a
    final op that is a DELETE for ~1/3 of keys by md5 byte), values
    are exact integer cents. Compaction = keep the highest version
    per key; a trailing tombstone removes the key from live state.
    Output: per-status census of keys / live rows / tombstones /
    surviving value mass.

    Engine shape: explode the version range (no join against a log
    table — the generator IS the log), ONE shuffle on the key for the
    top-1-per-key window (WindowGroupLimit: only the max-version row
    survives the partial sort), then a census. At 100 TB compaction
    cost rides distinct-key cardinality, exactly like the streaming
    dedup state stores (q179/q285) — this is the batch twin of that
    operator."""
    o = load_table(spark, sf_dir, "orders")
    log = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.explode(F.sequence(F.lit(0),
                             (F.col("o_orderkey") % 3).cast("int")))
        .alias("v"),
    ).select(
        "o_orderkey", "o_orderstatus", "v",
        F.when(F.col("v") == 0, "I")
        .when(F.col("v") == 1, "U")
        .when(F.expr(_CDC_BYTE.format(vch="STRING")) < 85, "D")
        .otherwise("U").alias("op"),
        (F.expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)") + F.col("v"))
        .alias("value_cents"),
    )
    last = log.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("o_orderkey").orderBy(F.col("v").desc())
        ),
    ).filter(F.col("rn") == 1)
    return last.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count_if(F.col("op") != "D").alias("n_live"),
        F.count_if(F.col("op") == "D").alias("n_tombstoned"),
        F.coalesce(F.sum(F.when(F.col("op") != "D", F.col("value_cents"))),
                   F.lit(0)).cast("long").alias("live_value_cents"),
    )


# Per-(source, lang) KL term, floored to an integer BEFORE the
# per-source sum: p*ln(p/q) with p = c/n (lang share within source)
# and q = m/N (corpus-wide lang share).
_KL_TERM = (
    "CAST(floor(1000000.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * "
    "ln((CAST(c AS DOUBLE) * CAST(bign AS DOUBLE)) / "
    "(CAST(n AS DOUBLE) * CAST(m AS DOUBLE)))) AS BIGINT)"
)


@register(
    "q452_source_lang_kl",
    oracle=f"""
WITH sl AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
),
s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sl GROUP BY source),
l AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS m FROM sl GROUP BY lang),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS bign FROM sl),
terms AS (
  SELECT sl.source, s.n,
         {_KL_TERM} AS term
  FROM sl
  JOIN s ON s.source = sl.source
  JOIN l ON l.lang = sl.lang
  CROSS JOIN tot
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(term) AS BIGINT) AS kl_micro
FROM terms GROUP BY source
""",
    tags=("audit", "drift", "mixture", "information"),
)
def q452_source_lang_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE LANGUAGE-MIXTURE DRIFT: KL divergence of each
    source's language distribution from the corpus-wide mixture,
    KL(p_source || p_corpus) = sum_lang p*ln(p/q) — the mixture-drift
    audit run before re-weighting a multi-source training blend (a
    source whose mix diverges is the one whose sampling temperature
    needs retuning; cf. the q202 DSIR and q203 temperature-sampling
    operators this feeds). Absent (source, lang) cells contribute
    exactly 0 (lim p->0 of p*ln(p/q)), so the inner join IS the sum.
    Each term is floored to integer micro units before the per-source
    sum (order-independent, bit-exact across engines).

    Engine shape: one (source, lang) census — 100 rows at any corpus
    size — then broadcast-joined marginals and a 5-term integer sum
    per source; the fact table is scanned once for the census and
    never again."""
    d = load_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    s = sl.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    lng = sl.groupBy("lang").agg(F.sum("c").cast("long").alias("m"))
    tot = sl.agg(F.sum("c").cast("long").alias("bign"))
    terms = (
        sl.join(F.broadcast(s), "source")
        .join(F.broadcast(lng), "lang")
        .crossJoin(F.broadcast(tot))
        .select("source", "n", F.expr(_KL_TERM).alias("term"))
    )
    return terms.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("term").cast("long").alias("kl_micro"),
    )
