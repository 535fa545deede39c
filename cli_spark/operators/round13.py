"""Round-13 queue (built in round 12): repeated-substring census via
prefix doubling, mergeable histogram-quantile drift, theta-sketch
set-expression estimates, TF-IDF labeling of dedup clusters, and
harmonic size-class token packing.

Same cross-engine determinism discipline as round11.py/round12.py:
every float step is ONE IEEE chain shared verbatim between the Spark
expression and the DuckDB oracle, floored to integer micro/ppm units
BEFORE any aggregation; deterministic randomness is md5-of-row-key
(the q105 idiom); counts are exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.dedup import _SQL_SHINGLES
from cli_spark.operators.round11 import (
    _H60_DUCK,
    _H60_SPARK,
    _TWO60,
    exact_family_clusters,
)
from cli_spark.plans.registry import register
from cli_spark.session import materialize_local
from cli_spark.tables import load_table

# Doubling ladder for the k-mer census: 7 levels, k = 2^j.
_KMER_LEVELS = (1, 2, 4, 8, 16, 32, 64)


# Single-slot per-session cache for the (doc_id, source, h) shingle-
# hash incidence relation — the shared base of the sketch family
# (q462 theta, q465 HLL) and fuzzy blocking (q468). The per-doc
# shingle expression (split + transform + array_distinct) plus ~1M
# md5 hashes is the dominant cost of all three; without the slot each
# invocation re-shingles the corpus (measured ~9-11 s warm each at
# sf0.1 — with it, the pool is built once per session/dataset). Same
# pattern and eviction rule as exact_family_clusters / _FAMILY_CACHE.
_POOL_CACHE: dict[tuple, DataFrame] = {}


def shingle_hash_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, h): one row per (document, distinct word
    3-gram), h = the 60-bit md5 hash idiom."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _POOL_CACHE:
        return _POOL_CACHE[key]
    from cli_spark.operators.dedup import shingles_df

    d = load_table(spark, sf_dir, "documents")
    pool = (
        shingles_df(spark, sf_dir, fanout=True)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", F.explode("shingles").alias("t"))
        .select("doc_id", "source",
                F.expr(_H60_SPARK.format(key="t")).alias("h"))
        .persist()
    )
    pool.count()
    for stale in [k for k in _POOL_CACHE if k != key]:
        try:
            _POOL_CACHE.pop(stale).unpersist()
        except Exception:
            pass  # entry may belong to an already-stopped session
    _POOL_CACHE[key] = pool
    return pool


@register(
    "q460_repeated_kmer_census",
    oracle="""
WITH ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS k),
pos AS (
  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS p
  FROM documents
),
wins AS (
  SELECT ks.k, substr(pos.text, pos.p, ks.k) AS s
  FROM pos CROSS JOIN ks
  WHERE pos.p + ks.k - 1 <= len(pos.text)
),
grp AS (SELECT k, s, CAST(COUNT(*) AS BIGINT) AS c FROM wins GROUP BY k, s)
SELECT CAST(k AS BIGINT) AS k,
       CAST(SUM(c) AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS repeated_windows,
       CAST(MAX(c) AS BIGINT) AS max_multiplicity
FROM grp GROUP BY k
""",
    tags=("text", "substring", "prefix-doubling", "census"),
)
def q460_repeated_kmer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LONGEST-REPEATED-SUBSTRING census by PREFIX DOUBLING (the
    Manber–Myers suffix-ranking step, run as distributed rank joins):
    for each window length k = 1,2,4,...,64, how many character
    k-grams exist corpus-wide, how many are distinct, how many repeat
    (appear >= 2 times anywhere in the corpus), and the maximum
    multiplicity. The largest k with n_repeated > 0 bounds the
    longest repeated substring to [k, 2k) — the dedup/plagiarism
    primitive behind suffix-array fingerprinting.

    Shuffle-width discipline: an ASCII k-gram of k <= 8 chars is at
    most 8 bytes — the width of a long — so levels 1/2/4 are censused
    DIRECTLY by a map-side-combined groupBy on the substring
    (shuffle-optimal already; a lift would only add exchanges). The
    iterative machinery starts where it pays: level 8's groups are
    renumbered to dense long keys (groupBy(s8) -> min global position
    id + count), and levels 16/32/64 lift those: the equality key for
    the window starting at p is the PAIR (key_k(p), key_k(p+k)) of
    level-k keys, fetched by a (doc_id, p+k) shift join. Pair
    renumbering is a map-side-combined aggregate, deliberately NOT a
    pair-partitioned window: hot grams would pile one window
    partition per hot key.

    The lift iterates over REPEATED-group members ONLY — a window in
    a singleton group can never be half of a repeated longer window,
    so positions whose group count is 1 are pruned from the state
    after every level (the connected_components discipline of
    iterating only rows that can still change). The pruned stats are
    recovered in closed form: n_windows(k) = sum(max(0, len-k+1))
    straight off the document lengths, and n_distinct = n_windows -
    repeated_windows + n_repeated. On real corpora the repeated mass
    shrinks geometrically with k (here: 100% of 8-gram windows ->
    9% of 32-gram windows), so per-level state collapses the way CC's
    edge frontier does — the property that makes this viable at
    100 TB, where positions outnumber documents 300:1. Each level's
    census is a free scan of the checkpointed state (a row represents
    its group iff gid == key), and every lift shuffle carries 4
    fixed-width longs per position regardless of k (a direct k = 64
    substring groupBy would shuffle 8x more bytes per row and could
    not prune at all). Each level is materialized with an EAGER
    localCheckpoint before the next is built — without the lineage
    truncation the level-j plan embeds 2^j copies of the base scan
    (the pairs/agg-of-pairs join doubles it every doubling step) and
    plan compilation alone OOMs the driver by level 5. The DuckDB
    oracle computes the same census DIRECTLY from substr() windows at
    every k (no pruning, no closed forms), so the hash match is an
    empirical proof of both the lift's equivalence classes and the
    pruning algebra."""
    # fan the RAW doc rows out FIRST (the q311/shingles_df idiom,
    # round-16: the single-file scan is ONE partition, so the 1.45 M-
    # position explode+substr and every map-side partial below it ran
    # single-task)
    d = load_table(spark, sf_dir, "documents")
    fanned = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    pos = (
        fanned.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("p"),
        )
        .select(
            "doc_id", "p",
            (F.col("doc_id") * 1024 + F.col("p")).alias("gid"),
            F.expr("substr(text, p, 8)").alias("s8"),
        )
        .persist()
    )

    def census_groups(groups: DataFrame, k: int) -> DataFrame:
        """Lazy 1-row census from an unpruned (group, c) relation."""
        return groups.agg(
            F.lit(k).cast("long").alias("k"),
            F.sum("c").cast("long").alias("n_windows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("long").alias("n_repeated"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("long").alias("repeated_windows"),
            F.max("c").cast("long").alias("max_multiplicity"),
        )

    # Closed-form total window counts per level (one tiny scan of the
    # doc lengths) — the pruned lift state can no longer count them.
    nw_row = d.agg(*[
        F.sum(F.greatest(F.length("text") - F.lit(kk - 1), F.lit(0)))
        .cast("long").alias(f"w{kk}")
        for kk in _KMER_LEVELS
    ]).collect()[0]
    nw = {kk: (nw_row[f"w{kk}"] or 0) for kk in _KMER_LEVELS}

    def census_pruned(state: DataFrame, k: int) -> DataFrame:
        """Lazy 1-row census from a repeated-members-only position
        relation plus the closed-form total (free scan of the
        checkpointed state: a row represents its group iff
        gid == key)."""
        return state.agg(
            F.lit(k).cast("long").alias("k"),
            F.lit(nw[k]).cast("long").alias("n_windows"),
            (F.lit(nw[k])
             - F.count(F.lit(1))
             + F.coalesce(
                 F.sum(F.when(F.col("gid") == F.col("key"), 1).otherwise(0)),
                 F.lit(0)))
            .cast("long").alias("n_distinct"),
            F.coalesce(
                F.sum(F.when(F.col("gid") == F.col("key"), 1).otherwise(0)),
                F.lit(0)).cast("long").alias("n_repeated"),
            F.count(F.lit(1)).cast("long").alias("repeated_windows"),
            F.coalesce(F.max("c"), F.lit(1))
            .cast("long").alias("max_multiplicity"),
        )

    censuses = []
    for k in (1, 2, 4):
        g = (
            pos.filter(F.length("s8") >= k)
            .groupBy(F.expr(f"substr(s8, 1, {k})").alias("s"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        censuses.append(census_groups(g, k))
    # Renumber-and-fetch as WINDOWS, not groupBy + join-back (round-16
    # optimization, guide §2.4): the old shape paid FIVE exchanges per
    # level — the (doc_id, p) self-join shuffled the state twice, the
    # pair aggregate once, and the join-back shuffled both its sides —
    # but the join-back already moved EVERY position to its group's
    # partition, so a whole-partition window (min(gid), count(*)) over
    # the same key computes the identical renumbering in that ONE
    # exchange, and the partner fetch key_k(p+k) is a per-doc
    # RANGE-frame lookup (positions are unique per doc, so the
    # [p+k, p+k] frame holds exactly the partner row or nothing —
    # bit-identical to the inner join). Two exchanges per level, same
    # skew profile as before (the hash partitioning by group key is
    # unchanged — map-side combine only ever shrank the small
    # aggregate side, not the position shuffle).
    wg8 = Window.partitionBy("s8")
    cur = (
        pos.filter(F.length("s8") == 8)
        .select(
            "doc_id", "p", "gid",
            F.min("gid").over(wg8).alias("key"),
            F.count(F.lit(1)).over(wg8).alias("c"),
        )
        .filter(F.col("c") >= 2)
        .select("doc_id", "p", "gid", "key", "c")
        .localCheckpoint(eager=True)
    )
    censuses.append(census_pruned(cur, 8))
    k = 8
    for next_k in (16, 32, 64):
        wd = Window.partitionBy("doc_id").orderBy("p").rangeBetween(k, k)
        pairs = (
            cur.select(
                "doc_id", "p", "gid", F.col("key").alias("k1"),
                F.max("key").over(wd).alias("k2"),
            )
            .filter(F.col("k2").isNotNull())
        )
        wp = Window.partitionBy("k1", "k2")
        new = (
            pairs.select(
                "doc_id", "p", "gid",
                F.min("gid").over(wp).alias("key"),
                F.count(F.lit(1)).over(wp).alias("c"),
            )
            .filter(F.col("c") >= 2)
            .select("doc_id", "p", "gid", "key", "c")
            .localCheckpoint(eager=True)
        )
        censuses.append(census_pruned(new, next_k))
        cur, k = new, next_k
    result = censuses[0]
    for c in censuses[1:]:
        result = result.unionByName(c)
    # one action computes all seven censuses (each a cheap scan of a
    # cached/checkpointed relation); zero-window levels are omitted to
    # mirror the oracle's GROUP BY. (A persist+count materialization
    # WITH AQE was measured slower here — 15.5 s vs 12.2 s warm at
    # sf0.1: the checkpoint's pinned low-partition layout beats AQE's
    # 32-partition shuffles at this state size.)
    out = materialize_local(result.filter(F.col("n_windows") > 0))
    pos.unpersist()
    return out


@register(
    "q461_histogram_quantile_drift",
    oracle="""
WITH base AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type, MIN(cents) AS minc, MAX(cents) AS maxc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY event_type
),
bucketed AS (
  SELECT b.event_type,
         (b.cents - s.minc) * 64 // (s.maxc - s.minc + 1) AS bkt
  FROM base b JOIN stats s USING (event_type)
),
bc AS (
  SELECT event_type, bkt, CAST(COUNT(*) AS BIGINT) AS c
  FROM bucketed GROUP BY event_type, bkt
),
cum AS (
  SELECT event_type, bkt,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bkt ASC) AS cum
  FROM bc
),
qs AS (SELECT unnest([50, 90, 99]) AS q),
targets AS (
  SELECT s.event_type, qs.q, s.n, s.minc, s.maxc,
         (qs.q * s.n + 99) // 100 AS tgt
  FROM stats s CROSS JOIN qs
),
est AS (
  SELECT t.event_type, t.q, t.n, t.minc, t.maxc, t.tgt,
         MIN(c.bkt) AS eb
  FROM targets t
  JOIN cum c ON c.event_type = t.event_type AND c.cum >= t.tgt
  GROUP BY t.event_type, t.q, t.n, t.minc, t.maxc, t.tgt
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents ASC, event_id ASC) AS rk
  FROM base
)
SELECT e.event_type, CAST(e.q AS BIGINT) AS q, e.n,
       r.cents AS exact_cents,
       CAST(e.minc + ((2 * e.eb + 1) * (e.maxc - e.minc + 1)) // 128
            AS BIGINT) AS est_cents,
       CAST(abs(e.minc + ((2 * e.eb + 1) * (e.maxc - e.minc + 1)) // 128
                - r.cents) * 1000000 // (e.maxc - e.minc + 1) AS BIGINT)
         AS drift_ppm
FROM est e
JOIN ranked r ON r.event_type = e.event_type AND r.rk = e.tgt
""",
    tags=("sketch", "quantile", "histogram", "audit"),
)
def q461_histogram_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-HISTOGRAM quantile estimates vs exact rank
    selection, per event type: a 64-bucket equal-width histogram over
    integer cents estimates p50/p90/p99 as the midpoint of the first
    bucket whose cumulative count reaches ceil(q*n/100); the exact
    side selects the value at that same rank. drift_ppm reports the
    estimate's error as ppm OF THE VALUE RANGE — the histogram's
    accuracy contract (<= 1/64 of range + half a bucket) is auditable
    in the result.

    This is the ONLINE-quantile design that actually distributes:
    unlike sequential estimators (P-squared), a fixed-grid histogram
    is order-independent and MERGEABLE — partial histograms combine
    by bucket-wise addition (one map-side-combined groupBy here), so
    the same sketch works per-partition, per-micro-batch, and
    cross-cluster at 100 TB. The exact side is the audit baseline: a
    rank selection via one per-type sort, joined back at the target
    rank. All arithmetic is integer; bucket index, midpoint, and
    drift are the same DIV chains in both engines."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "event_id",
        F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("cents"),
    )
    stats = base.groupBy("event_type").agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    bucketed = base.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.expr("(cents - minc) * 64 DIV (maxc - minc + 1)").alias("bkt"),
    )
    bc = bucketed.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    cum = bc.select(
        "event_type", "bkt",
        F.sum("c").over(
            Window.partitionBy("event_type").orderBy(F.col("bkt").asc())
        ).alias("cum"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q long")
    targets = stats.crossJoin(F.broadcast(qs)).select(
        "event_type", "q", "n", "minc", "maxc",
        F.expr("(q * n + 99) DIV 100").alias("tgt"),
    )
    est = (
        targets.join(
            cum.withColumnRenamed("event_type", "et"),
            (F.col("et") == F.col("event_type")) & (F.col("cum") >= F.col("tgt")),
        )
        .groupBy("event_type", "q", "n", "minc", "maxc", "tgt")
        .agg(F.min("bkt").alias("eb"))
    )
    ranked = base.select(
        F.col("event_type").alias("et"), "cents",
        F.row_number().over(
            Window.partitionBy("event_type")
            .orderBy(F.col("cents").asc(), F.col("event_id").asc())
        ).alias("rk"),
    )
    return (
        est.join(ranked, (F.col("et") == F.col("event_type"))
                 & (F.col("rk") == F.col("tgt")))
        .select(
            "event_type",
            F.col("q").cast("long").alias("q"),
            "n",
            F.col("cents").alias("exact_cents"),
            F.expr("CAST(minc + ((2 * eb + 1) * (maxc - minc + 1)) DIV 128 "
                   "AS BIGINT)").alias("est_cents"),
            F.expr("CAST(abs(minc + ((2 * eb + 1) * (maxc - minc + 1)) "
                   "DIV 128 - cents) * 1000000 DIV (maxc - minc + 1) "
                   "AS BIGINT)").alias("drift_ppm"),
        )
    )


@register(
    "q462_theta_sketch_intersection",
    oracle=f"""
WITH shall AS ({_SQL_SHINGLES}),
toks AS (
  SELECT DISTINCT d.source, {_H60_DUCK.format(key='u.t')} AS h
  FROM shall s
  JOIN documents d USING (doc_id), unnest(s.shingles) AS u(t)
),
sk AS (
  SELECT source, h
  FROM (SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
        FROM toks)
  WHERE rn <= 64
),
srcs AS (SELECT DISTINCT source FROM toks),
pl AS (
  SELECT a.source AS s1, b.source AS s2
  FROM srcs a JOIN srcs b ON a.source < b.source
),
un AS (
  SELECT DISTINCT s1, s2, h FROM (
    SELECT p.s1, p.s2, s.h FROM pl p JOIN sk s ON s.source = p.s1
    UNION ALL
    SELECT p.s1, p.s2, s.h FROM pl p JOIN sk s ON s.source = p.s2
  )
),
th AS (
  SELECT s1, s2,
         COALESCE(MAX(CASE WHEN rn = 64 THEN h END), 1152921504606846976)
           AS theta
  FROM (SELECT s1, s2, h,
               row_number() OVER (PARTITION BY s1, s2 ORDER BY h ASC) AS rn
        FROM un)
  GROUP BY s1, s2
),
com AS (
  SELECT a.source AS s1, b.source AS s2, a.h
  FROM sk a JOIN sk b ON a.h = b.h AND a.source < b.source
),
ni AS (
  SELECT t.s1, t.s2, t.theta,
         CAST(COALESCE(SUM(CASE WHEN c.h < t.theta THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_below
  FROM th t LEFT JOIN com c ON c.s1 = t.s1 AND c.s2 = t.s2
  GROUP BY t.s1, t.s2, t.theta
),
ex AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT)
    AS exact_inter
  FROM toks a JOIN toks b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
),
est AS (
  SELECT n.s1, n.s2,
         CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter,
         CAST(floor(CAST(n.n_below AS DOUBLE) * {_TWO60} /
                    CAST(n.theta AS DOUBLE)) AS BIGINT) AS est_inter
  FROM ni n LEFT JOIN ex e ON e.s1 = n.s1 AND e.s2 = n.s2
)
SELECT s1, s2, exact_inter, est_inter,
       CAST(abs(est_inter - exact_inter) * 1000000
            // GREATEST(exact_inter, 1) AS BIGINT) AS err_ppm
FROM est
""",
    tags=("sketch", "theta", "intersection", "mergeable"),
)
def q462_theta_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA-SKETCH set-expression estimates (the q449 KMV bottom-k
    extended to A-intersect-B): for every pair of sources, merge the
    two bottom-64 SHINGLE-hash sketches (word 3-grams — the token
    vocabulary is ~31 words, under the sketch size, which would pin
    every pair to the exact fallback; the ~1.2-1.5k shingles per
    source put the estimator in its sampling regime), set theta = the
    64th smallest hash of the union, and estimate |A n B| as (common
    sketch hashes below theta) * 2^60 / theta — the standard
    theta-sketch intersection rule (the composable form of KMV).
    Pairs whose merged sketch holds fewer than 64 hashes fall back to
    theta = 2^60, which makes the estimate EXACT (the sketch IS the
    union). Each row carries the exact intersection and the realized
    error in ppm, so the ~1/sqrt(64) accuracy contract is auditable
    in-result.

    Why this is the 100-TB set-overlap tool: per-source sketches are
    64 longs REGARDLESS of corpus size, build with one distinct +
    bottom-k reduction each, and every pairwise estimate afterwards
    touches only sketch rows (sources^2 x 64 longs — broadcastable).
    The exact side (full pool self-join on hash) exists purely as the
    audit baseline. Union/theta/below-theta counting is the identical
    integer chain in both engines; the single float step (the 2^60 /
    theta scale) is one shared IEEE chain floored to a BIGINT.

    The distinct (source, hash) pool feeds five consumers (sketch,
    both union arms, both exact-join sides), so it is persisted for
    the invocation (derived from the shared shingle_hash_pool slot —
    the per-doc shingle expression is the dominant cost of the whole
    sketch family) and released after the 190-row result is
    materialized locally — without the caches the plan re-reads and
    re-shingles the documents scan eight times (seen in the formatted
    plan during the round-12 audit)."""
    toks = (
        shingle_hash_pool(spark, sf_dir)
        .select("source", "h")
        .distinct()
        .persist()
    )
    sk = (
        toks.select(
            "source", "h",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.col("h").asc())
            ).alias("rn"),
        )
        .filter(F.col("rn") <= 64)
        .select("source", "h")
    )
    srcs = toks.select("source").distinct()
    pl = (
        srcs.select(F.col("source").alias("s1"))
        .join(srcs.select(F.col("source").alias("s2")),
              F.col("s1") < F.col("s2"))
    )
    un = (
        pl.join(F.broadcast(sk), F.col("source") == F.col("s1"))
        .select("s1", "s2", "h")
        .unionByName(
            pl.join(F.broadcast(sk), F.col("source") == F.col("s2"))
            .select("s1", "s2", "h"))
        .distinct()
    )
    two60_long = 1152921504606846976
    th = (
        un.select(
            "s1", "s2", "h",
            F.row_number().over(
                Window.partitionBy("s1", "s2").orderBy(F.col("h").asc())
            ).alias("rn"),
        )
        .groupBy("s1", "s2")
        .agg(F.coalesce(
            F.max(F.when(F.col("rn") == 64, F.col("h"))),
            F.lit(two60_long)).alias("theta"))
    )
    com = (
        sk.select(F.col("source").alias("s1"), "h")
        .join(sk.select(F.col("source").alias("s2"),
                        F.col("h").alias("h2")),
              (F.col("h") == F.col("h2")) & (F.col("s1") < F.col("s2")))
        .select("s1", "s2", "h")
    )
    ni = (
        th.join(com.withColumnRenamed("h", "ch"), ["s1", "s2"], "left")
        .groupBy("s1", "s2", "theta")
        .agg(F.coalesce(
            F.sum(F.when(F.col("ch") < F.col("theta"), 1).otherwise(0)),
            F.lit(0)).cast("long").alias("n_below"))
    )
    ex = (
        toks.select(F.col("source").alias("s1"), "h")
        .join(toks.select(F.col("source").alias("s2"),
                          F.col("h").alias("h2")),
              (F.col("h") == F.col("h2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est = (
        ni.join(ex, ["s1", "s2"], "left")
        .select(
            "s1", "s2",
            F.coalesce("exact_inter", F.lit(0)).cast("long")
            .alias("exact_inter"),
            F.expr(f"CAST(floor(CAST(n_below AS DOUBLE) * {_TWO60} / "
                   "CAST(theta AS DOUBLE)) AS BIGINT)").alias("est_inter"),
        )
    )
    out = materialize_local(
        est.withColumn(
            "err_ppm",
            F.expr("CAST(abs(est_inter - exact_inter) * 1000000 "
                   "DIV GREATEST(exact_inter, 1) AS BIGINT)"),
        )
    )
    toks.unpersist()
    return out


@register(
    "q463_cluster_tfidf_labels",
    oracle=f"""
WITH RECURSIVE fam AS (
  SELECT doc_id, md5(text) AS fkey FROM documents
),
st AS (SELECT fkey, MIN(doc_id) AS rep FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, s.shingles, len(s.shingles) AS n
  FROM shall s JOIN st ON st.rep = s.doc_id
  WHERE len(s.shingles) > 0
),
exx AS (SELECT doc_id, unnest(shingles) AS s FROM sz),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
  FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
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
  SELECT rep, rep FROM st
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
cc AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
memb AS (
  SELECT f.doc_id, c.comp
  FROM fam f JOIN st ON st.fkey = f.fkey JOIN cc c ON c.node = st.rep
),
sizes AS (
  SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM memb GROUP BY comp HAVING COUNT(*) >= 2
),
rtoks AS (
  SELECT c.comp,
         unnest(list_filter(string_split(lower(d.text), ' '), x -> x != ''))
           AS term
  FROM cc c
  JOIN sizes z ON z.comp = c.comp
  JOIN documents d ON d.doc_id = c.node
),
tf AS (
  SELECT comp, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM rtoks GROUP BY comp, term
),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sizes),
scored AS (
  SELECT t.comp, t.term, t.tf,
         CAST(floor(1000000.0 * CAST(t.tf AS DOUBLE) *
                    ln(CAST(nq.n AS DOUBLE) / CAST(d.df AS DOUBLE)))
              AS BIGINT) AS tfidf_micro
  FROM tf t JOIN dft d ON d.term = t.term CROSS JOIN nq
),
ranked AS (
  SELECT comp, term, tf, tfidf_micro,
         row_number() OVER (PARTITION BY comp
                            ORDER BY tfidf_micro DESC, term ASC) AS rank
  FROM scored
)
SELECT CAST(r.comp AS BIGINT) AS cluster_id, z.n_members,
       CAST(r.rank AS BIGINT) AS rank, r.term, r.tf, r.tfidf_micro
FROM ranked r JOIN sizes z ON z.comp = r.comp
WHERE r.rank <= 3
""",
    tags=("dedup", "tfidf", "labeling", "curation"),
)
def q463_cluster_tfidf_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF LABELS for dedup clusters — the curation-report pass
    that closes q446's loop: rerun the flagship's exact-family
    collapse + prefix-filter Jaccard>=0.5 join + connected
    components, then, for every cluster with >= 2 member documents,
    name it by its top-3 terms scored tf * ln(N/df) where tf counts
    tokens over the cluster's FAMILY-REPRESENTATIVE texts (the
    collapse discipline: label evidence rides distinct-text volume,
    never raw-copy volume), df is the number of qualifying clusters
    containing the term, and N the number of qualifying clusters.
    This is what a 100-TB dedup manifest needs to be reviewable by a
    human: not "cluster 1234 has 8 members" but "cluster 1234 is the
    mortgage-rate boilerplate".

    Scale shape: stages 1-2 are q446's audited scale-correct chain
    (duplication-invariant candidates, O(log d) CC rounds); the
    labeling pass adds one explode + two map-side-combined groupBys
    over REP texts of multi-member clusters only — a vanishing
    fraction of the corpus. The single ln chain is shared verbatim
    with the oracle and floored to micro units, so the per-cluster
    top-3 (tie-broken on the term) is bit-identical. The DuckDB
    oracle recomputes everything including the transitive closure
    from the raw all-pairs relation."""
    d = load_table(spark, sf_dir, "documents")
    # Stages 1-2 from the exact_family_clusters single-slot cache
    # shared with q446 (the chain is both queries' dominant cost).
    fam, reps, cc = exact_family_clusters(spark, sf_dir)
    memb = fam.join(reps, "fkey").join(
        cc.withColumnRenamed("doc_id", "rep"), "rep")
    sizes = (
        memb.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    rtoks = (
        cc.join(sizes, "component")
        .join(d.select(F.col("doc_id").alias("rdoc"), "text"),
              F.col("doc_id") == F.col("rdoc"))
        .select(
            "component",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("term"),
        )
    )
    tf = rtoks.groupBy("component", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nq = sizes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(nq))
        .withColumn(
            "tfidf_micro",
            F.expr("CAST(floor(1000000.0 * CAST(tf AS DOUBLE) * "
                   "ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))) AS BIGINT)"),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("component")
            .orderBy(F.col("tfidf_micro").desc(), F.col("term").asc())
        ),
    )
    return (
        ranked.filter(F.col("rank") <= 3)
        .join(sizes, "component")
        .select(
            F.col("component").cast("long").alias("cluster_id"),
            "n_members",
            F.col("rank").cast("long").alias("rank"),
            "term", "tf", "tfidf_micro",
        )
    )


@register(
    "q464_harmonic_token_packing",
    oracle="""
WITH items AS (
  SELECT doc_id,
         GREATEST(len(list_filter(string_split(text, ' '), x -> x != '')), 1)
           AS n_tok
  FROM documents
),
classed AS (SELECT doc_id, n_tok, 128 // n_tok AS k FROM items),
per AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
         CAST((COUNT(*) + k - 1) // k AS BIGINT) AS bins
  FROM classed GROUP BY k
),
rows_ AS (
  SELECT CAST(k AS BIGINT) AS k, n_items, sum_tokens, bins,
         CAST((sum_tokens + 127) // 128 AS BIGINT) AS lower_bound
  FROM per
  UNION ALL
  SELECT CAST(-1 AS BIGINT), CAST(SUM(n_items) AS BIGINT),
         CAST(SUM(sum_tokens) AS BIGINT), CAST(SUM(bins) AS BIGINT),
         CAST((SUM(sum_tokens) + 127) // 128 AS BIGINT)
  FROM per
)
SELECT k, n_items, sum_tokens, bins, lower_bound,
       CAST(sum_tokens * 1000000 // (bins * 128) AS BIGINT)
         AS occupancy_ppm,
       CAST(bins * 1000000 // lower_bound AS BIGINT) AS vs_lb_ppm
FROM rows_
""",
    tags=("packing", "training", "layout", "audit"),
)
def q464_harmonic_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARMONIC size-class TOKEN PACKING audit — sequence packing for
    a 128-token training context, done the way that parallelizes:
    classify each document by k = floor(128 / n_tok) (the harmonic
    algorithm's size classes, Lee & Lee JACM'85), pack class-k items
    k per bin in closed form bins_k = ceil(n_k / k), and report per
    class and in TOTAL (k = -1): items, token mass, bins used, the
    fractional lower bound ceil(sum_tokens/128), bin occupancy in
    ppm, and bins-vs-lower-bound in ppm. First-fit-decreasing packs
    tighter but is inherently sequential over the item stream; the
    harmonic rule is ONE map-side-combined groupBy — every statistic
    here distributes at 100 TB, and the vs_lb_ppm column puts the
    price of that parallelism on the record (harmonic's worst case is
    ~1.69x the optimum; the audit shows the realized ratio). Pure
    integer arithmetic end to end."""
    d = load_table(spark, sf_dir, "documents")
    items = d.select(
        "doc_id",
        F.greatest(
            F.size(F.filter(F.split("text", " "), lambda x: x != "")),
            F.lit(1),
        ).cast("long").alias("n_tok"),
    )
    classed = items.select("n_tok", F.expr("128 DIV n_tok").alias("k"))
    per = (
        classed.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "bins", F.expr("CAST((n_items + k - 1) DIV k AS BIGINT)"))
    )
    per_rows = per.select(
        F.col("k").cast("long").alias("k"), "n_items", "sum_tokens", "bins",
        F.expr("CAST((sum_tokens + 127) DIV 128 AS BIGINT)")
        .alias("lower_bound"),
    )
    tot = (
        per.agg(
            F.sum("n_items").cast("long").alias("n_items"),
            F.sum("sum_tokens").cast("long").alias("sum_tokens"),
            F.sum("bins").cast("long").alias("bins"),
        )
        .select(
            F.lit(-1).cast("long").alias("k"),
            "n_items", "sum_tokens", "bins",
            F.expr("CAST((sum_tokens + 127) DIV 128 AS BIGINT)")
            .alias("lower_bound"),
        )
    )
    return per_rows.unionByName(tot).select(
        "k", "n_items", "sum_tokens", "bins", "lower_bound",
        F.expr("CAST(sum_tokens * 1000000 DIV (bins * 128) AS BIGINT)")
        .alias("occupancy_ppm"),
        F.expr("CAST(bins * 1000000 DIV lower_bound AS BIGINT)")
        .alias("vs_lb_ppm"),
    )


# HLL estimate chains, shared verbatim between engines. The register
# sum is kept EXACT in integers: each register M contributes
# 2^(55 - M) (a BIGINT; M <= 55), so sum(2^-M) = reg_sum / 2^55 with
# no float addition anywhere — a 64-term float sum of powers of two
# spans > 53 bits of precision and could round differently under
# reordering, which would break the cross-engine hash compare.
# (Literals are CAST to DOUBLE explicitly: DuckDB types a bare
# decimal literal as DECIMAL, and DECIMAL*DECIMAL*DECIMAL overflows
# at 2^55 scale where the double product is exact.)
_HLL_RAW = (
    "CAST(floor(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * "
    "CAST(36028797018963968 AS DOUBLE) / CAST(reg_sum AS DOUBLE)) "
    "AS BIGINT)"
)
_HLL_SMALL = (
    "CAST(floor(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / "
    "CAST(zeros AS DOUBLE))) AS BIGINT)"
)


@register(
    "q465_hll_register_sketch",
    oracle=f"""
WITH shall AS ({_SQL_SHINGLES}),
toks AS (
  SELECT DISTINCT d.source, {_H60_DUCK.format(key='u.t')} AS h
  FROM shall s
  JOIN documents d USING (doc_id), unnest(s.shingles) AS u(t)
),
pools AS (
  SELECT source, h FROM toks
  UNION ALL
  SELECT '__union__' AS source, h FROM (SELECT DISTINCT h FROM toks)
),
rhos AS (
  SELECT source, h % 64 AS bucket,
         CASE WHEN h // 64 = 0 THEN 55
              ELSE 55 - length(bin(h // 64)) END AS rho
  FROM pools
),
regs AS (
  SELECT source, bucket, MAX(rho) AS m FROM rhos GROUP BY source, bucket
),
per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(CAST(power(2.0, 55 - m) AS BIGINT))
              + (64 - COUNT(*)) * 36028797018963968 AS BIGINT) AS reg_sum
  FROM regs GROUP BY source
),
ex AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM pools GROUP BY source
),
est AS (
  SELECT p.source, e.exact_distinct,
         CAST(64 - p.nb AS BIGINT) AS zeros,
         {_HLL_RAW} AS raw_est
  FROM per p JOIN ex e ON e.source = p.source
),
fin AS (
  SELECT source, exact_distinct, zeros,
         CASE WHEN raw_est <= 160 AND zeros > 0
              THEN {_HLL_SMALL} ELSE raw_est END AS hll_estimate
  FROM est
)
SELECT source, exact_distinct, zeros, hll_estimate,
       CAST(abs(hll_estimate - exact_distinct) * 1000000
            // exact_distinct AS BIGINT) AS err_ppm
FROM fin
""",
    tags=("sketch", "hll", "distinct", "mergeable"),
)
def q465_hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG distinct-count sketch (Flajolet et al. 2007) over
    per-source SHINGLE-hash pools (word 3-grams — the corpus
    vocabulary is ~31 tokens, far below m = 64 registers, while the
    shingle space runs ~1.2-1.5k per source: the regime where HLL's
    raw estimator actually operates) — the register-based counterpart of
    q449's KMV bottom-k and q462's theta intersections, completing
    the mergeable-sketch set: bucket = h mod 64, rho = leading-zero
    rank of the remaining 54 bits, register = max rho per bucket,
    estimate = alpha_64 * m^2 / sum(2^-M_j) with Flajolet's
    small-range correction m*ln(m/zeros) when the raw estimate is
    under 2.5m and empty registers remain. The '__union__' row is the
    merge property on display: HLL sketches of disjoint scans combine
    by REGISTER-WISE MAX (computed here over the merged hash pool,
    which is algebraically identical), so 64 bytes per source is all
    a 1000-executor cluster ships to count distinct tokens corpus-
    wide. Exact distinct and realized err_ppm ride along, making the
    ~1.04/sqrt(64) = 13% accuracy contract auditable in-result.

    Determinism: the register sum is EXACT INTEGER arithmetic — each
    register contributes 2^(55 - M) as a BIGINT, so sum(2^-M) =
    reg_sum / 2^55 without a single float addition (a 64-term float
    sum of powers of two spans more than 53 bits and could round
    differently under Spark's unordered aggregation); the only float
    steps are the two shared division/ln chains, floored to BIGINT.
    Engine shape: one distinct (source, hash) reduction, one
    map-side-combined max per (source, bucket), one 64-row-per-source
    aggregate — every stage mergeable, nothing driver-side."""
    toks = (
        shingle_hash_pool(spark, sf_dir)
        .select("source", "h")
        .distinct()
    )
    pools = toks.unionByName(
        toks.select(F.lit("__union__").alias("source"), "h").distinct())
    rhos = pools.select(
        "source",
        F.expr("h % 64").alias("bucket"),
        F.expr("CASE WHEN h DIV 64 = 0 THEN 55 "
               "ELSE 55 - length(bin(h DIV 64)) END").alias("rho"),
    )
    regs = rhos.groupBy("source", "bucket").agg(F.max("rho").alias("m"))
    per = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.expr("CAST(SUM(CAST(power(2.0, 55 - m) AS BIGINT)) "
               "+ (64 - COUNT(*)) * 36028797018963968 AS BIGINT)")
        .alias("reg_sum"),
    )
    ex = pools.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    est = (
        per.join(ex, "source")
        .select(
            "source", "exact_distinct",
            (F.lit(64) - F.col("nb")).cast("long").alias("zeros"),
            F.expr(_HLL_RAW).alias("raw_est"),
        )
    )
    fin = est.select(
        "source", "exact_distinct", "zeros",
        F.when((F.col("raw_est") <= 160) & (F.col("zeros") > 0),
               F.expr(_HLL_SMALL)).otherwise(F.col("raw_est"))
        .alias("hll_estimate"),
    )
    return fin.withColumn(
        "err_ppm",
        F.expr("CAST(abs(hll_estimate - exact_distinct) * 1000000 "
               "DIV exact_distinct AS BIGINT)"),
    )


@register(
    "q466_family_split_leakage",
    oracle=f"""
WITH RECURSIVE fam AS (
  SELECT doc_id, md5(text) AS fkey FROM documents
),
st AS (SELECT fkey, MIN(doc_id) AS rep FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, s.shingles, len(s.shingles) AS n
  FROM shall s JOIN st ON st.rep = s.doc_id
  WHERE len(s.shingles) > 0
),
exx AS (SELECT doc_id, unnest(shingles) AS s FROM sz),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
  FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
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
  SELECT rep, rep FROM st
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
cc AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
memb AS (
  SELECT f.doc_id, c.comp,
         CASE WHEN CAST(concat('0x', substr(md5(CAST(f.doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 10 < 8
              THEN 'train'
              WHEN CAST(concat('0x', substr(md5(CAST(f.doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 10 = 8
              THEN 'val' ELSE 'test' END AS split
  FROM fam f JOIN st ON st.fkey = f.fkey JOIN cc c ON c.node = st.rep
),
cs AS (SELECT DISTINCT comp, split FROM memb),
pairs AS (
  SELECT a.comp, a.split AS s1, b.split AS s2
  FROM cs a JOIN cs b ON a.comp = b.comp AND a.split < b.split
),
leaky AS (
  SELECT s1, s2, comp FROM pairs
),
per AS (
  SELECT l.s1, l.s2,
         CAST(COUNT(DISTINCT l.comp) AS BIGINT) AS n_straddling_clusters,
         CAST(COUNT(*) AS BIGINT) AS n_leaked_docs
  FROM leaky l
  JOIN memb m ON m.comp = l.comp AND m.split IN (l.s1, l.s2)
  GROUP BY l.s1, l.s2
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT p.s1, p.s2, p.n_straddling_clusters, p.n_leaked_docs,
       CAST(p.n_leaked_docs * 1000000 // t.n_docs AS BIGINT) AS leak_ppm
FROM per p CROSS JOIN tot t
""",
    tags=("dedup", "split", "contamination", "audit"),
)
def q466_family_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP SPLIT-LEAKAGE audit — the contamination check q324's
    group-kfold cannot see: a deterministic md5(doc_id) 80/10/10
    train/val/test assignment is scored against q446's near-dup
    clusters, and every cluster with members in two different splits
    is TEST-SET LEAKAGE (a near-duplicate of a training document
    sitting in eval — the failure mode behind inflated benchmark
    numbers that naive random splits guarantee on undeduplicated
    corpora; Lee et al. 2022's core argument). Per split pair:
    straddling clusters, documents involved, and leak_ppm of the
    corpus. The fix this audit motivates is splitting BY CLUSTER, and
    the correct target reading is zero rows only when splits are
    cluster-atomic.

    Engine shape: the cluster chain comes from the
    exact_family_clusters single-slot cache (shared with q446/q463 —
    one materialization per session/dataset); the audit itself is one
    DISTINCT (cluster, split) reduction, a within-cluster split-pair
    join on the cluster key, and one membership count — every stage
    keyed and map-side combinable. Split assignment is the md5 idiom
    (q105/q450): bit-identical in both engines, no RNG."""
    d = load_table(spark, sf_dir, "documents")
    fam, reps, cc = exact_family_clusters(spark, sf_dir)
    split = F.expr(
        "CASE WHEN " + _H60_SPARK.format(key="doc_id") + " % 10 < 8 "
        "THEN 'train' WHEN " + _H60_SPARK.format(key="doc_id")
        + " % 10 = 8 THEN 'val' ELSE 'test' END")
    memb = (
        fam.join(reps, "fkey")
        .join(cc.withColumnRenamed("doc_id", "rep"), "rep")
        .select("doc_id", "component", split.alias("split"))
    )
    cs = memb.select("component", "split").distinct()
    pairs = (
        cs.select("component", F.col("split").alias("s1"))
        .join(cs.select(F.col("component").alias("c2"),
                        F.col("split").alias("s2")),
              (F.col("component") == F.col("c2"))
              & (F.col("s1") < F.col("s2")))
        .select("component", "s1", "s2")
    )
    # equi-join on the cluster key + IN filter (an OR join would fall
    # to a nested loop in both engines — the q441 lesson)
    per = (
        pairs.join(memb.withColumnRenamed("component", "mc"),
                   F.col("mc") == F.col("component"))
        .filter((F.col("split") == F.col("s1"))
                | (F.col("split") == F.col("s2")))
        .groupBy("s1", "s2")
        .agg(
            F.countDistinct("component").cast("long")
            .alias("n_straddling_clusters"),
            F.count(F.lit(1)).cast("long").alias("n_leaked_docs"),
        )
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return per.crossJoin(F.broadcast(tot)).select(
        "s1", "s2", "n_straddling_clusters", "n_leaked_docs",
        F.expr("CAST(n_leaked_docs * 1000000 DIV n_docs AS BIGINT)")
        .alias("leak_ppm"),
    )


# Per-term IDF, floored to integer micro units BEFORE the per-doc sum
# so the lexical score is an order-independent integer aggregate.
_IDF_MICRO = (
    "CAST(floor(1000000.0 * ln((CAST(n AS DOUBLE) + 1.0) / "
    "(CAST(df AS DOUBLE) + 1.0))) AS BIGINT)"
)


@register(
    "q467_rrf_hybrid_retrieval",
    oracle=f"""
WITH qt AS (
  SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),
                                     x -> x != '')) AS t
  FROM documents WHERE doc_id = 0
),
toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS t
  FROM documents
),
dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY t),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
lex AS (
  SELECT tk.doc_id, CAST(SUM({_IDF_MICRO}) AS BIGINT) AS lex_score
  FROM toks tk
  JOIN qt ON qt.t = tk.t
  JOIN dfreq d ON d.t = tk.t
  CROSS JOIN nn
  WHERE tk.doc_id != 0
  GROUP BY tk.doc_id
),
lrank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY lex_score DESC, doc_id ASC) AS lex_rank
  FROM lex
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
den AS (
  SELECT e.vec_id AS doc_id,
         (CAST(list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(floor(CAST(list_extract(e.embedding, i) AS DOUBLE) * CAST(list_extract(q.qe, i) AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000.0)
           / (sqrt((CAST(list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(floor(CAST(list_extract(e.embedding, i) AS DOUBLE) * CAST(list_extract(e.embedding, i) AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000.0)) * sqrt((CAST(list_sum(list_transform(generate_series(1, len(q.qe)), i -> CAST(floor(CAST(list_extract(q.qe, i) AS DOUBLE) * CAST(list_extract(q.qe, i) AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000.0))) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != 0
),
drank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS dense_rank
  FROM den
),
fused AS (
  SELECT d.doc_id, l.lex_rank, d.dense_rank,
         CAST(COALESCE(1000000 // (60 + l.lex_rank), 0)
              + 1000000 // (60 + d.dense_rank) AS BIGINT) AS rrf_micro
  FROM drank d LEFT JOIN lrank l ON l.doc_id = d.doc_id
),
final AS (
  SELECT row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS rank,
         doc_id, lex_rank, dense_rank, rrf_micro
  FROM fused
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(dense_rank AS BIGINT) AS dense_rank, rrf_micro
FROM final WHERE rank <= 20
""",
    tags=("retrieval", "rrf", "hybrid", "ranking"),
)
def q467_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL-RANK-FUSION hybrid retrieval (Cormack et al.
    SIGIR'09 — the standard lexical+dense combiner): document 0 is
    the query on BOTH axes (its tokens for the lexical leg, its
    embedding — vec_id aligns with doc_id in this corpus — for the
    dense leg). Lexical score = sum of per-term smoothed-IDF weights
    over the query terms a document shares (each term's
    floor(1e6*ln((N+1)/(df+1))) is an integer BEFORE the sum, so the
    aggregate is order-independent); dense score = the q80 cosine
    chain. Each leg becomes a rank, and RRF fuses them as
    1e6 DIV (60 + rank) — INTEGER reciprocal contributions, k = 60
    per the original paper — with documents absent from the lexical
    leg contributing 0 there (the standard RRF treatment of missing
    rankings). Top-20 with both leg ranks exposed, so the fusion is
    auditable row by row.

    Engine shape: the lexical leg is one distinct-incidence reduction
    + a broadcastable query-term join; the dense leg is q80's
    broadcast cross join; each rank is one WindowGroupLimit-style
    ordering over SCORED DOCS ONLY (never the corpus crossed with
    itself). At 100 TB the legs shard independently — rank fusion
    only ever touches two integer rank columns."""
    from cli_spark.operators.similarity import dot

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("t"),
        )
        .distinct()
    )
    qt = toks.filter(F.col("doc_id") == 0).select("t").distinct()
    dfreq = toks.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    lex = (
        toks.filter(F.col("doc_id") != 0)
        .join(F.broadcast(qt), "t")
        .join(dfreq, "t")
        .crossJoin(F.broadcast(nn))
        .groupBy("doc_id")
        .agg(F.sum(F.expr(_IDF_MICRO)).cast("long").alias("lex_score"))
    )
    lrank = lex.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("lex_score").desc(), F.col("doc_id").asc())
        ).alias("lex_rank"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    den = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot("embedding", "qe")
             / (F.sqrt(dot("embedding", "embedding"))
                * F.sqrt(dot("qe", "qe")))).alias("cosine"),
        )
    )
    drank = den.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        ).alias("dense_rank"),
    )
    fused = (
        drank.join(lrank, "doc_id", "left")
        .select(
            "doc_id", "lex_rank", "dense_rank",
            (F.coalesce(F.expr("1000000 DIV (60 + lex_rank)"), F.lit(0))
             + F.expr("1000000 DIV (60 + dense_rank)"))
            .cast("long").alias("rrf_micro"),
        )
    )
    final = fused.select(
        F.row_number().over(
            Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
        ).cast("long").alias("rank"),
        "doc_id",
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("dense_rank").cast("long").alias("dense_rank"),
        "rrf_micro",
    )
    return final.filter(F.col("rank") <= 20)


@register(
    "q468_blocked_fuzzy_join",
    oracle=f"""
WITH fam AS (SELECT doc_id, md5(text) AS fkey FROM documents),
st AS (SELECT fkey, MIN(doc_id) AS rep FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, s.shingles
  FROM shall s JOIN st ON st.rep = s.doc_id
  WHERE len(s.shingles) > 0
),
exx AS (SELECT doc_id, unnest(shingles) AS s FROM sz),
hashes AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
  FROM exx
),
bot2 AS (
  SELECT doc_id, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h ASC) AS rk
  FROM hashes
),
remix AS (
  SELECT doc_id,
         MIN(CAST(concat('0x', substr(md5(CAST(h AS VARCHAR)), 1, 15))
             AS BIGINT)) AS b2
  FROM hashes GROUP BY doc_id
),
lanes AS (
  SELECT doc_id, 1 AS lane, h AS block FROM bot2 WHERE rk <= 2
  UNION ALL
  SELECT doc_id, 2 AS lane, b2 AS block FROM remix
),
okblk AS (
  SELECT lane, block FROM lanes GROUP BY lane, block
  HAVING COUNT(*) <= 32
),
cblk AS (SELECT l.doc_id, l.lane, l.block
         FROM lanes l JOIN okblk o USING (lane, block)),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM cblk a JOIN cblk b
    ON a.lane = b.lane AND a.block = b.block AND a.doc_id < b.doc_id
),
txt AS (SELECT doc_id, text, len(text) AS ln FROM documents)
SELECT c.da AS doc_a, c.db AS doc_b,
       CAST(ta.ln AS BIGINT) AS len_a, CAST(tb.ln AS BIGINT) AS len_b,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist
FROM cand c
JOIN txt ta ON ta.doc_id = c.da
JOIN txt tb ON tb.doc_id = c.db
WHERE abs(ta.ln - tb.ln) <= 16
  AND levenshtein(ta.text, tb.text) <= 32
""",
    tags=("dedup", "fuzzy", "levenshtein", "blocking"),
)
def q468_blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED FUZZY JOIN — record-linkage-style edit-distance dedup
    (Fellegi–Sunter blocking + Levenshtein verify): exact-duplicate
    families collapse first (the q392/q440/q446 discipline — copies
    must never inflate the candidate space), each surviving
    representative is keyed by its BOTTOM-2 SKETCH (Broder: the two
    smallest 60-bit shingle hashes — block keys in the shared hash
    space) plus one independent remix lane (minimum of an md5 remix
    of each shingle hash — a second permutation), and only
    same-lane-same-block pairs within a +/-16-char length band pay
    the O(len^2) Levenshtein verify, reported for pairs with distance
    <= 32. Two documents share the min-hash block with probability
    equal to their Jaccard similarity (the MinHash property); the
    bottom-2 keys additionally make one-shingle-difference pairs
    DETERMINISTIC (for B ⊂ A with |A\\B| = 1, A's second minimum IS
    B's minimum whenever A's unique shingle carries the minimum).

    RECALL, measured against exact all-pairs ground truth at sf0.01
    (25 true pairs with lev <= 32 over the rep universe; the
    |len diff| <= 32 prefilter makes the all-pairs scan lossless and
    feasible — scripts in PLANS.md round-13 section): the original
    ONE-lane form read 24/25 = 0.96 — the miss was a J=0.9
    subset-shaped short-doc pair whose single off-shingle carried the
    minimum under BOTH the base and remix permutations (a verified
    ~1% two-lane event), and cross-lang, so the q428 metadata-blocker
    union could NOT recover it. The bottom-2 form reads 25/25 = 1.00,
    catching that pair deterministically; the length band's recall
    cost measured ZERO (no-band recall identical). (A rarest-shingle
    argmin block was tried first and yields ZERO candidates here — a
    near-duplicate's rarest shingle is exactly its most doc-specific
    one, so edited twins never share it.)

    Complementary to q428's METADATA blocker (same language + capped
    length band, threshold-form levenshtein kernel): production
    entity resolution unions independent blockers to buy recall, and
    these are the two standard families — q428 blocks on record
    attributes and caps hot blocks (bounded cost, documented
    abstention), q468 blocks on CONTENT with collapse-first reps (a
    MinHash block needs no cap: its size tracks true near-dup
    density). A pair missed by one blocker is usually caught by the
    other.

    Engine shape: the bottom-2 keys are one per-doc WindowGroupLimit
    (rank <= 2 heaps, never a sort-materialize) and the remix lane
    one map-side-combined min, both over the shared shingle-hash
    pool; blocks larger than 32 documents ABSTAIN per lane (q428's
    cap rule — the first sf1 sweep without it read 75x super-linear:
    a near-dup-saturated tier floods every block and the verify pays
    len^2 per pair; the cap bounds the worst block's pair count at
    any corpus size, with abstention as the documented recall
    tradeoff); candidates are one equi-join on the capped
    (lane, block) key,
    the length band prunes inside the join before any text is
    compared, and the Spark kernel uses the THRESHOLD form
    levenshtein(a, b, 32) — O(len*k) banded DP returning -1 past the
    threshold — while the oracle recomputes the full unbounded
    distance, so the graded match proves the banded kernel agrees
    with ground truth on every surviving pair (the q428 property).
    Levenshtein runs JVM-side (whole-stage codegen) on the few
    surviving pairs. Both engines share the identical integer chain
    end to end — Spark's and DuckDB's levenshtein agree by
    definition (unit-cost edit distance), pinned by the parity gate."""
    d = load_table(spark, sf_dir, "documents")
    fam, reps, _cc = exact_family_clusters(spark, sf_dir)
    rep_hashes = (
        shingle_hash_pool(spark, sf_dir)
        .join(reps.select(F.col("rep").alias("doc_id")), "doc_id")
        .select("doc_id", "h")
    )
    bot2 = (
        rep_hashes.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("h").asc())),
        )
        .filter(F.col("rk") <= 2)
        .select("doc_id", F.lit(1).alias("lane"), F.col("h").alias("block"))
    )
    remix = (
        rep_hashes.groupBy("doc_id")
        .agg(F.min(F.expr(_H60_SPARK.format(key="h"))).alias("block"))
        .select("doc_id", F.lit(2).alias("lane"), "block")
    )
    lanes = bot2.unionByName(remix)
    okblk = (
        lanes.groupBy("lane", "block").agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= 32).select("lane", "block")
    )
    cblk = lanes.join(okblk, ["lane", "block"])
    cand = (
        cblk.select(F.col("doc_id").alias("da"), "lane", "block")
        .join(cblk.select(F.col("doc_id").alias("db"),
                          F.col("lane").alias("l2"),
                          F.col("block").alias("blk2")),
              (F.col("lane") == F.col("l2"))
              & (F.col("block") == F.col("blk2"))
              & (F.col("da") < F.col("db")))
        .select("da", "db")
        .distinct()
    )
    txt = d.select("doc_id", "text", F.length("text").alias("ln"))
    return (
        cand
        .join(txt.select(F.col("doc_id").alias("da"),
                         F.col("text").alias("ta"),
                         F.col("ln").alias("len_a")), "da")
        .join(txt.select(F.col("doc_id").alias("db"),
                         F.col("text").alias("tb"),
                         F.col("ln").alias("len_b")), "db")
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= 16)
        .withColumn("edit_dist",
                    F.expr("levenshtein(ta, tb, 32)").cast("long"))
        .filter(F.col("edit_dist") >= 0)
        .select(
            F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
            F.col("len_a").cast("long").alias("len_a"),
            F.col("len_b").cast("long").alias("len_b"),
            "edit_dist",
        )
    )


# Mann–Kendall normalized statistic: z = (S - sign(S)) / sqrt(VarS),
# VarS = var18 / 18 (kept as the exact integer var18 until this one
# shared chain). Guarded for the degenerate all-tied/one-day case.
_MK_Z = (
    "CASE WHEN var18 = 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(floor(1000000.0 * (CAST(s_stat AS DOUBLE) "
    "- CAST(sign(s_stat) AS DOUBLE)) "
    "/ sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT) END"
)
_MK_TREND = (
    "CASE WHEN z_micro > 1959963 THEN 'increasing' "
    "WHEN z_micro < -1959963 THEN 'decreasing' ELSE 'none' END"
)


@register(
    "q469_mann_kendall_trend",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY event_type, day
),
pairs AS (
  SELECT a.event_type,
         CAST(SUM(sign(b.cents - a.cents)) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type
),
nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie18
  FROM (
    SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY event_type, cents
  ) GROUP BY event_type
),
stat AS (
  SELECT p.event_type, n.n_days, p.s_stat,
         CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
              - t.tie18 AS BIGINT) AS var18
  FROM pairs p
  JOIN nd n ON n.event_type = p.event_type
  JOIN ties t ON t.event_type = p.event_type
),
z AS (
  SELECT event_type, n_days, s_stat, var18, {_MK_Z} AS z_micro
  FROM stat
)
SELECT event_type, n_days, s_stat, var18, z_micro,
       {_MK_TREND} AS trend
FROM z
""",
    tags=("timeseries", "trend", "nonparametric", "audit"),
)
def q469_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL trend test per event type (Mann 1945, Kendall's
    tau numerator): S = sum over day pairs i < j of
    sign(x_j - x_i) on the DAILY revenue series, variance with the
    exact tie correction n(n-1)(2n+5) - sum t(t-1)(2t+5) (kept as
    the integer 18*Var), continuity-corrected z, and the standard
    5%-level trend verdict. The nonparametric trend detector for
    pipeline telemetry — no normality assumption, robust to the
    heavy-tailed daily totals a revenue series actually has.

    Scale design: the test runs on the BOUNDED time grid, not the
    event stream — daily aggregation is one map-side-combined groupBy
    over the facts, after which the O(n^2) sign-pair join touches
    n = 30 rows per type REGARDLESS of corpus scale (435 pairs; the
    pair space rides the calendar, never the data volume). Everything
    through var18 is exact integer arithmetic; the single float chain
    (continuity-corrected z, guarded for the all-tied case) is shared
    verbatim and floored to micro units; the verdict thresholds on
    the floored integer against +/-1959963 (the 1.96 critical value
    in micro units), so the label is bit-stable too."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.expr("CAST(floor(value * 100.0) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    a = daily.select("event_type", F.col("day").alias("da"),
                     F.col("cents").alias("ca"))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("day").alias("db"), F.col("cents").alias("cb"))
    pairs = (
        a.join(b, (F.col("event_type") == F.col("et2"))
               & (F.col("da") < F.col("db")))
        .groupBy("event_type")
        .agg(F.sum(F.signum(F.col("cb") - F.col("ca")))
             .cast("long").alias("s_stat"))
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(F.coalesce(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0))
            .cast("long").alias("tie18"))
    )
    stat = (
        pairs.join(nd, "event_type").join(ties, "event_type")
        .select(
            "event_type", "n_days", "s_stat",
            F.expr("CAST(n_days * (n_days - 1) * (2 * n_days + 5) "
                   "- tie18 AS BIGINT)").alias("var18"),
        )
    )
    z = stat.withColumn("z_micro", F.expr(_MK_Z))
    return z.withColumn("trend", F.expr(_MK_TREND))


@register(
    "q470_dedup_manifest",
    oracle=f"""
WITH RECURSIVE fam AS (
  SELECT doc_id, md5(text) AS fkey FROM documents
),
st AS (SELECT fkey, MIN(doc_id) AS rep FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, s.shingles, len(s.shingles) AS n
  FROM shall s JOIN st ON st.rep = s.doc_id
  WHERE len(s.shingles) > 0
),
exx AS (SELECT doc_id, unnest(shingles) AS s FROM sz),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
  FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
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
  SELECT rep, rep FROM st
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
cc AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
memb AS (
  SELECT f.doc_id, f.fkey, st.rep, c.comp
  FROM fam f JOIN st ON st.fkey = f.fkey JOIN cc c ON c.node = st.rep
),
elect AS (
  SELECT m.comp, m.doc_id AS kept_doc
  FROM (
    SELECT m.comp, m.doc_id,
           row_number() OVER (PARTITION BY m.comp
                              ORDER BY d.n_chars DESC, m.doc_id ASC)
             AS rn
    FROM memb m JOIN documents d ON d.doc_id = m.doc_id
  ) m WHERE m.rn = 1
),
kept AS (
  SELECT e.comp, e.kept_doc, mk.fkey AS kept_fkey
  FROM elect e JOIN memb mk ON mk.doc_id = e.kept_doc
)
SELECT m.doc_id AS dropped_doc, k.kept_doc,
       CAST(m.comp AS BIGINT) AS cluster_id,
       CASE WHEN m.fkey = k.kept_fkey THEN 'exact_copy'
            ELSE 'near_dup' END AS reason
FROM memb m
JOIN kept k ON k.comp = m.comp
WHERE m.doc_id != k.kept_doc
""",
    tags=("dedup", "manifest", "curation", "audit"),
)
def q470_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP MANIFEST — the deliverable of the whole dedup stack: one
    row per DROPPED document with the document kept in its place, the
    cluster that binds them, and the reason ('exact_copy' when the
    dropped doc is byte-identical to the keeper — same md5(text)
    family; 'near_dup' when it joined through the Jaccard >= 0.5
    clusters). The canonical document per cluster is elected
    deterministically: longest text first (keep the most complete
    variant — the standard curation election), doc_id as the
    tiebreak. q446 reports the LEDGER (how much was removed); this is
    the per-document record a reproducible corpus release actually
    ships, and what makes the removal auditable doc by doc.

    Engine shape: clusters come from the exact_family_clusters
    single-slot cache (built once per session across q446/q463/q466/
    q470); the election is one per-cluster WindowGroupLimit over
    members (bounded by cluster size), and the manifest is one join
    back on the cluster key. Reasons need no text comparison — the
    family key already in the membership relation decides
    exact-vs-near."""
    d = load_table(spark, sf_dir, "documents")
    fam, reps, cc = exact_family_clusters(spark, sf_dir)
    memb = (
        fam.join(reps, "fkey")
        .join(cc.withColumnRenamed("doc_id", "rep"), "rep")
        .select("doc_id", "fkey", "component")
    )
    elect = (
        memb.join(d.select("doc_id", "n_chars"), "doc_id")
        .select(
            "component", "doc_id",
            F.row_number().over(
                Window.partitionBy("component")
                .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
            ).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("kept_doc"))
    )
    kept = elect.join(
        memb.select(F.col("doc_id").alias("kept_doc"),
                    F.col("fkey").alias("kept_fkey")),
        "kept_doc",
    )
    return (
        memb.join(kept, "component")
        .filter(F.col("doc_id") != F.col("kept_doc"))
        .select(
            F.col("doc_id").alias("dropped_doc"),
            "kept_doc",
            F.col("component").cast("long").alias("cluster_id"),
            F.when(F.col("fkey") == F.col("kept_fkey"), "exact_copy")
            .otherwise("near_dup").alias("reason"),
        )
    )


# Sign-safe integer division shared by both engines: Spark's DIV
# truncates toward zero while DuckDB's // floors, so negatives would
# diverge — routing through sign(a) * (abs(a) div b) makes both
# truncate identically. b is always positive here.
def _idiv(a: str, b: str, div: str) -> str:
    return f"CAST(sign({a}) * (abs({a}) {div} {b}) AS BIGINT)"


def _power_iter_sql(div: str) -> str:
    """Three unrolled power-iteration steps over the integer-quantized
    embedding matrix; `div` is the engine's integer-division token."""
    steps = []
    prev = "v0"
    for t in (1, 2, 3):
        steps.append(f"""
s{t} AS (
  SELECT x.vec_id, CAST(SUM(x.x * v.v) AS BIGINT) AS s
  FROM xi x JOIN {prev} v ON v.j = x.j GROUP BY x.vec_id
),
sc{t} AS (
  SELECT vec_id, {_idiv('s', '67108864', div)} AS sc FROM s{t}
),
w{t} AS (
  SELECT x.j, CAST(SUM(x.x * s.sc) AS BIGINT) AS w
  FROM xi x JOIN sc{t} s ON s.vec_id = x.vec_id GROUP BY x.j
),
m{t} AS (
  SELECT GREATEST(MAX(abs(w)) {div} 1048576, 1) AS m FROM w{t}
),
v{t} AS (
  SELECT w.j, {_idiv('w.w', 'm.m', div)} AS v
  FROM w{t} w CROSS JOIN m{t} m
)""")
        prev = f"v{t}"
    return ",".join(steps)


@register(
    "q471_power_iteration_eigvec",
    oracle=f"""
WITH xi AS (
  SELECT vec_id, j,
         CAST(floor(CAST(list_extract(embedding, j) AS DOUBLE)
                    * 1048576.0) AS BIGINT) AS x
  FROM embeddings, generate_series(1, 64) AS t(j)
),
v0 AS (SELECT j, CAST(1048576 AS BIGINT) AS v
       FROM generate_series(1, 64) AS t(j)),
{_power_iter_sql('//')}
SELECT CAST(a.j AS BIGINT) AS j, a.v AS v1, b.v AS v2, c.v AS v3
FROM v1 a JOIN v2 b ON b.j = a.j JOIN v3 c ON c.j = a.j
""",
    tags=("embeddings", "pca", "power-iteration", "linear-algebra"),
)
def q471_power_iteration_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER ITERATION for the top eigenvector of the (uncentered)
    embedding second-moment matrix X^T X — the PCA/spectral primitive
    (Mises–Pollaczek-Geiringer 1929) behind embedding whitening,
    spectral dedup and drift detection — run THREE steps from the
    all-ones start, reporting the direction after every step (64 rows
    x v1/v2/v3) so convergence is visible in-result.

    The iteration never materializes the 64x64 covariance: each step
    is v <- X^T (X v), i.e. one row-score join-aggregate (s_r =
    x_r . v) and one dimension aggregate (w_j = sum_r s_r x_rj) —
    the map-side-combinable factored form that scales to arbitrary
    row counts with 64-row state between steps.

    Determinism is the hard part and the design: embeddings are
    quantized ONCE to integers (floor(x * 2^20)), the per-row score
    and per-dimension accumulations are pure INTEGER sums (no float
    addition exists anywhere, so Spark's unordered aggregation cannot
    re-round), and each step renormalizes in integers (max-abs to
    2^20) with a bound argument: |s| <= 64 * 2^40 < 2^46, scores
    rescaled by 2^26, |w| <= N * 2^40 — overflow-free through
    N ~ 2^23 rows. Spark's DIV truncates toward zero while DuckDB's
    // floors, so every division routes through
    sign(a) * (abs(a) div b) to make both truncate identically."""
    e = load_table(spark, sf_dir, "embeddings")
    xi = (
        e.select(
            "vec_id",
            F.posexplode("embedding").alias("j0", "xval"),
        )
        .select(
            "vec_id", (F.col("j0") + 1).alias("j"),
            F.expr("CAST(floor(CAST(xval AS DOUBLE) * 1048576.0) AS BIGINT)")
            .alias("x"),
        )
        .persist()
    )
    v = spark.range(1, 65).select(
        F.col("id").alias("j"), F.lit(1048576).cast("long").alias("v"))
    outs = []
    for _t in range(3):
        s = (
            xi.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("v")).cast("long").alias("s"))
        )
        sc = s.select(
            "vec_id",
            F.expr("CAST(sign(s) * (abs(s) DIV 67108864) AS BIGINT)")
            .alias("sc"),
        )
        w = (
            xi.join(sc, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("x") * F.col("sc")).cast("long").alias("w"))
        )
        m = w.agg(
            F.greatest(F.expr("MAX(abs(w)) DIV 1048576"), F.lit(1))
            .alias("m"))
        # pin the 64-row direction to a LOCAL relation: otherwise the
        # final 3-way join evaluates step 1 three times, step 2 twice
        # (each outs[t] plan nests every earlier step), and each lazy
        # broadcast(v) adds a sequential broadcast job per nesting
        # level (round-15 optimization, guide §2.4/§5)
        v = materialize_local(
            w.crossJoin(F.broadcast(m))
            .select(
                "j",
                F.expr("CAST(sign(w) * (abs(w) DIV m) AS BIGINT)")
                .alias("v"),
            )
        )
        outs.append(v)
    out = (
        outs[0].withColumnRenamed("v", "v1")
        .join(outs[1].withColumnRenamed("v", "v2"), "j")
        .join(outs[2].withColumnRenamed("v", "v3"), "j")
        .select(F.col("j").cast("long").alias("j"), "v1", "v2", "v3")
    )
    out = materialize_local(out)
    xi.unpersist()
    return out
