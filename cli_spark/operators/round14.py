"""Round-13 build: estimator-audit operators that close loops opened
in earlier rounds — the Horvitz–Thompson total estimate over the
weighted sample (q447's sampler finally gets its estimator), an AMS
tug-of-war F2 sketch completing the mergeable-sketch family
(q449 KMV / q465 HLL / q462 theta / q256 CMS), and a Neyman-vs-
proportional stratified-allocation audit.

Same cross-engine determinism discipline as round11.py–round13.py:
every float step is ONE IEEE chain shared verbatim between the Spark
expression and the DuckDB oracle, floored to integer micro/ppm units
BEFORE any cross-row aggregation; deterministic randomness is
md5-of-row-key (the q105 idiom); counts are exact integers end to
end. Where a quotient can be negative, both sides floor a DOUBLE
(DuckDB `//` floors while Spark `DIV` truncates toward zero — the
shared floor(double) chain sidesteps the disagreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.dedup import _SQL_SHINGLES
from cli_spark.operators.round11 import _H60_DUCK, _H60_SPARK, _TWO60
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# Priority p = w / u with u = (h + 1) / 2^60 in (0, 1] — the
# Duffield–Lund–Thorup priority. Shared verbatim; the two divisions
# are one IEEE chain in both engines.
_PRI = (
    "CAST(w AS DOUBLE) / ((CAST(h AS DOUBLE) + 1.0) / " + _TWO60 + ")"
)
# Per-item Horvitz–Thompson weight estimate max(w, tau), floored to
# integer micro units BEFORE the per-stratum sum so summation order
# cannot move the result. tau = 0 when the stratum has <= k items
# (every item sampled, inclusion probability 1 — the estimate is
# exact by construction).
_HT_TERM = (
    "CAST(floor(GREATEST(CAST(w AS DOUBLE), tau) * 1000000.0) AS BIGINT)"
)
_ERR_PPM = (
    "CAST(floor((CAST({est} AS DOUBLE) {unscale} - CAST({exact} AS DOUBLE))"
    " * 1000000.0 / CAST({exact} AS DOUBLE)) AS BIGINT)"
)


@register(
    "q472_horvitz_thompson_audit",
    oracle=f"""
WITH base AS (
  SELECT lang, doc_id, GREATEST(n_chars, 1) AS w,
         {_H60_DUCK.format(key='doc_id')} AS h
  FROM documents
),
pri AS (
  SELECT lang, doc_id, w, {_PRI} AS p FROM base
),
ranked AS (
  SELECT lang, doc_id, w, p,
         row_number() OVER (PARTITION BY lang
                            ORDER BY p DESC, doc_id ASC) AS rk
  FROM pri
),
taus AS (SELECT lang, p AS tau_raw FROM ranked WHERE rk = 11),
est AS (
  SELECT r.lang,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM({_HT_TERM}) AS BIGINT) AS est_micro
  FROM (SELECT ranked.lang, w, COALESCE(t.tau_raw, 0.0) AS tau
        FROM ranked LEFT JOIN taus t ON t.lang = ranked.lang
        WHERE rk <= 10) r
  GROUP BY r.lang
),
exact AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS w_exact
  FROM base GROUP BY lang
)
SELECT e.lang, e.n_docs, s.k_used, e.w_exact, s.est_micro,
       {_ERR_PPM.format(est='s.est_micro', unscale='/ 1000000.0',
                        exact='e.w_exact')} AS err_ppm
FROM exact e JOIN est s ON s.lang = e.lang
""",
    tags=("sampling", "estimator", "horvitz-thompson", "audit"),
)
def q472_horvitz_thompson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HORVITZ–THOMPSON total estimate from a k-item weighted sample,
    per language — closing the loop q447 opened (sample → estimator →
    realized error). A-ES order sampling has no closed-form inclusion
    probabilities, so the estimator uses the PRIORITY-SAMPLING form of
    Duffield–Lund–Thorup (JACM 2007): priority p_i = w_i / u_i with
    the same deterministic 60-bit md5 draw as q447, keep the k = 10
    largest priorities per stratum, let tau be the (k+1)-th priority,
    and estimate each sampled item's weight as max(w_i, tau) — the HT
    estimator with empirically-computable inclusion probabilities
    P[i in S] = min(1, w_i / tau), proven unbiased for any weight
    sequence. The result reports, per language: corpus size, the
    sample actually used, the exact character mass, the estimate, and
    the realized signed error in ppm.

    Scale shape: one projection (hash + two divisions per row), ONE
    per-group top-(k+1) window that Spark executes as
    WindowGroupLimit (per-partition heaps of k+1, never a full sort),
    and a broadcast of the 1-row-per-stratum tau relation back onto
    the k sampled rows. Priority sampling is also MERGEABLE (take the
    k+1 best priorities of any union of reservoirs), which is what
    makes it THE distributed weighted estimator at 100 TB: executors
    keep bounded heaps, the driver merges priorities, and the total
    estimate needs no second pass over the data. Strata with <= k
    items degenerate to a census (tau = 0 ⇒ estimate = exact), which
    the audit columns make visible. Per-item HT terms are floored to
    integer micros BEFORE the sum; the only cross-row float is the
    final err_ppm chain, shared verbatim with the oracle."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang", "doc_id",
        F.greatest("n_chars", F.lit(1)).alias("w"),
        F.expr(_H60_SPARK.format(key="doc_id")).alias("h"),
    )
    pri = base.withColumn("p", F.expr(_PRI))
    ranked = pri.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("p").desc(),
                                               F.col("doc_id").asc())
        ),
    )
    taus = ranked.filter(F.col("rk") == 11).select(
        F.col("lang").alias("tl"), F.col("p").alias("tau_raw"))
    sampled = (
        ranked.filter(F.col("rk") <= 10)
        .join(F.broadcast(taus), F.col("lang") == F.col("tl"), "left")
        .withColumn("tau", F.coalesce("tau_raw", F.lit(0.0)))
    )
    est = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(F.expr(_HT_TERM)).cast("long").alias("est_micro"),
    )
    exact = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("w_exact"),
    )
    return exact.join(F.broadcast(est), "lang").select(
        "lang", "n_docs", "k_used", "w_exact", "est_micro",
        F.expr(_ERR_PPM.format(est="est_micro", unscale="/ 1000000.0",
                               exact="w_exact")).alias("err_ppm"),
    )


_N_EST = 16  # AMS estimators averaged; X_i is integer end to end


@register(
    "q474_ams_f2_sketch",
    oracle=f"""
WITH fk AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS f
  FROM events GROUP BY event_type, user_id
),
signs AS (
  SELECT f.event_type, f.f, i.i,
         CASE WHEN ({_H60_DUCK.format(
             key="CAST(i.i AS VARCHAR) || ':' || CAST(f.user_id AS VARCHAR)")})
              % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM fk f CROSS JOIN (SELECT unnest(range({_N_EST})) AS i) i
),
x AS (
  SELECT event_type, i, CAST(SUM(f * s) AS BIGINT) AS x
  FROM signs GROUP BY event_type, i
),
est AS (
  SELECT event_type, CAST(SUM(x * x) AS BIGINT) // {_N_EST} AS f2_est
  FROM x GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(SUM(f) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(f * f) AS BIGINT) AS f2_exact
  FROM fk GROUP BY event_type
)
SELECT e.event_type, e.n_rows, e.n_keys, e.f2_exact, s.f2_est,
       {_ERR_PPM.format(est='s.f2_est', unscale='',
                        exact='e.f2_exact')} AS err_ppm
FROM exact e JOIN est s ON s.event_type = e.event_type
""",
    tags=("sketch", "ams", "f2", "audit"),
)
def q474_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" second-moment sketch (Alon–Matias–Szegedy,
    STOC 1996) vs exact F2 = Σ_k f_k², per event type over user_id —
    the self-join-size statistic a cost-based optimizer and every
    skew detector wants, completing the mergeable-sketch family
    (q449 KMV distinct / q465 HLL / q462 theta intersections / q256
    CMS inner product). Each of the 16 estimators draws a
    deterministic ±1 sign per (estimator, key) from the md5 lane and
    keeps X_i = Σ_k f_k·s_i(k); E[X_i²] = F2 exactly, and the result
    reports the 16-estimator mean against the exact value with the
    realized signed error in ppm.

    Scale shape: ONE groupBy to per-key counts (map-side combinable),
    a 16-way explode of the TINY per-key relation, and one more
    map-side-combined sum — X_i is a plain integer sum, so partial
    sketches from any partition/micro-batch/day MERGE by addition,
    which is the whole point at 100 TB: F2 of a year of data is 16
    integers per shard added up, no re-scan. EVERY arithmetic step is
    exact integer (signs ±1, counts, X_i, X_i²) — the only float is
    the final err_ppm chain, shared verbatim with the oracle.
    Overflow bound: |X_i| <= n_rows, so X_i² <= n_rows² — safe in
    int64 through ~3×10⁹ rows per group; beyond that the estimator
    shards by sub-key and merges, same contract."""
    e = load_table(spark, sf_dir, "events")
    fk = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("f"))
    ii = spark.range(_N_EST).select(F.col("id").alias("i"))
    signs = fk.crossJoin(F.broadcast(ii)).withColumn(
        "s",
        F.expr(
            "CASE WHEN (" + _H60_SPARK.format(
                key="concat(CAST(i AS STRING), ':', CAST(user_id AS STRING))")
            + ") % 2 = 0 THEN 1 ELSE -1 END"
        ),
    )
    x = signs.groupBy("event_type", "i").agg(
        F.sum(F.col("f") * F.col("s")).cast("long").alias("x"))
    est = x.groupBy("event_type").agg(
        F.expr(f"CAST(SUM(x * x) AS BIGINT) DIV {_N_EST}").alias("f2_est"))
    exact = fk.groupBy("event_type").agg(
        F.sum("f").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"),
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type", "n_rows", "n_keys", "f2_exact", "f2_est",
        F.expr(_ERR_PPM.format(est="f2_est", unscale="",
                               exact="f2_exact")).alias("err_ppm"),
    )


_BUDGET = 100  # total sample budget allocated across strata

# Within-stratum sample std dev — the one float chain, shared
# verbatim: S_h = sqrt((Σy² - (Σy)²/n) / (n - 1)). Guarded for the
# legal single-document stratum (ADVICE r13): without the CASE the
# 0/0 is NULL in Spark's non-ANSI Divide but NaN in DuckDB's IEEE
# float ops, and the two engines diverge (NULL-propagating sums vs
# NaN poisoning). S_h of an n=1 stratum is 0 by convention.
_SH = (
    "(CASE WHEN n_h < 2 THEN 0.0 ELSE "
    "sqrt((CAST(sum_y2 AS DOUBLE) - CAST(sum_y AS DOUBLE) * "
    "CAST(sum_y AS DOUBLE) / CAST(n_h AS DOUBLE)) / "
    "(CAST(n_h AS DOUBLE) - 1.0)) END)"
)
# Per-stratum integer summaries floored BEFORE any cross-stratum sum:
# N_h·S_h in micro units and N_h·S_h² in whole units.
_NHS_MICRO = f"CAST(floor(CAST(n_h AS DOUBLE) * {_SH} * 1000000.0) AS BIGINT)"
_NHS2 = f"CAST(floor(CAST(n_h AS DOUBLE) * {_SH} * {_SH}) AS BIGINT)"
# Variance-reduction of Neyman over proportional allocation (Cochran,
# Sampling Techniques §5.5, continuous allocation, no fpc):
# 1 − (Σ W_h S_h)² / (Σ W_h S_h²) = 1 − A² / (10¹² · N · B).
# Guarded for the degenerate all-zero-variance corpus (every stratum
# n_h = 1 or constant-y): B = 0 would be 0/0 — NULL in Spark, NaN in
# DuckDB — so both chains pin the reduction (and the Neyman
# allocation, whose denominator A is then also 0) to 0 identically.
_RED_PPM = (
    "(CASE WHEN b = 0 THEN CAST(0 AS BIGINT) ELSE "
    "CAST(floor(1000000.0 * (1.0 - CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / "
    "(1000000000000.0 * CAST(n_tot AS DOUBLE) * CAST(b AS DOUBLE)))) "
    "AS BIGINT) END)"
)
_ALLOC_NEY = (
    "(CASE WHEN a = 0 THEN CAST(0 AS BIGINT) ELSE "
    f"CAST(floor({_BUDGET}000000.0 * CAST(nhs_micro AS DOUBLE) / "
    "CAST(a AS DOUBLE)) AS BIGINT) END)"
)


@register(
    "q475_neyman_allocation_audit",
    oracle=f"""
WITH strat AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(n_chars) AS BIGINT) AS sum_y,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_y2
  FROM documents GROUP BY lang
),
per AS (
  SELECT lang, n_h, sum_y,
         CAST(floor({_SH} * {_SH} * 1000000.0) AS BIGINT) AS s2_micro,
         {_NHS_MICRO} AS nhs_micro,
         {_NHS2} AS nhs2
  FROM strat
),
tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n_tot,
         CAST(SUM(nhs_micro) AS BIGINT) AS a,
         CAST(SUM(nhs2) AS BIGINT) AS b
  FROM per
)
SELECT p.lang, p.n_h, p.sum_y, p.s2_micro,
       CAST({_BUDGET} * 1000000 * p.n_h // t.n_tot AS BIGINT)
         AS alloc_prop_micro,
       {_ALLOC_NEY} AS alloc_neyman_micro,
       {_RED_PPM} AS reduction_ppm
FROM per p CROSS JOIN tot t
""",
    tags=("sampling", "stratified", "neyman", "audit"),
)
def q475_neyman_allocation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN vs PROPORTIONAL stratified-sample allocation, with the
    variance reduction the optimal design buys (Cochran, Sampling
    Techniques §5.5): for strata = languages and y = n_chars, Neyman
    allocates a fixed budget ∝ N_h·S_h (stratum size × within-stratum
    std dev) instead of ∝ N_h; the variance ratio of the two
    stratified-mean estimators is (Σ W_h S_h)² / (Σ W_h S_h²) — a
    Cauchy–Schwarz quantity that equals 1 only when all strata share
    one S_h. The result reports, per language: stratum size, exact
    character mass, within-stratum variance (micro), both allocations
    in micro-samples, and the corpus-level variance reduction in ppm
    (repeated per row — it is the design's headline number). This is
    the QA-sampling design step of a curation pipeline: given a fixed
    human-review budget, where do the reviews go.

    Scale shape: ONE map-side-combined groupBy to 3 integer
    aggregates per stratum (count, Σy, Σy²) — the sufficient
    statistics — then arithmetic on a relation with ONE ROW PER
    STRATUM; the corpus is scanned exactly once regardless of size.
    Cross-stratum sums are over per-stratum INTEGER summaries
    (N_h·S_h floored to micros first), so stratum iteration order
    cannot move a float sum; the S_h chain and both final ratios are
    shared verbatim with the oracle."""
    d = load_table(spark, sf_dir, "documents")
    strat = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("n_chars").cast("long").alias("sum_y"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long")
        .alias("sum_y2"),
    )
    per = strat.select(
        "lang", "n_h", "sum_y",
        F.expr(f"CAST(floor({_SH} * {_SH} * 1000000.0) AS BIGINT)")
        .alias("s2_micro"),
        F.expr(_NHS_MICRO).alias("nhs_micro"),
        F.expr(_NHS2).alias("nhs2"),
    )
    tot = per.agg(
        F.sum("n_h").cast("long").alias("n_tot"),
        F.sum("nhs_micro").cast("long").alias("a"),
        F.sum("nhs2").cast("long").alias("b"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang", "n_h", "sum_y", "s2_micro",
        F.expr(f"CAST({_BUDGET} * 1000000 * n_h DIV n_tot AS BIGINT)")
        .alias("alloc_prop_micro"),
        F.expr(_ALLOC_NEY).alias("alloc_neyman_micro"),
        F.expr(_RED_PPM).alias("reduction_ppm"),
    )


# Laplace(b = 1/eps) noise by inverse CDF from the deterministic md5
# uniform: u = (h+1)/2^60 - 0.5 in (-0.5, 0.5], noise =
# -b*sign(u)*ln(1-2|u|). ONE shared float chain, floored to an
# integer count delta; the 1e-18 guard covers the measure-zero
# u = 0.5 draw (ln 0) identically in both engines. eps = 0.5 -> b = 2.
_LAP_NOISE = (
    "CAST(floor(-2.0 * sign(u) * ln(GREATEST(0.000000000000000001, "
    "1.0 - 2.0 * abs(u)))) AS BIGINT)"
)
_LAP_U = (
    "((CAST(h AS DOUBLE) + 1.0) / " + _TWO60 + ") - 0.5"
)


@register(
    "q477_dp_laplace_release",
    oracle=f"""
WITH langs AS (SELECT DISTINCT lang FROM documents),
sources AS (SELECT DISTINCT source FROM documents),
counts AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
),
cells AS (
  SELECT l.lang, s.source, COALESCE(c.n, 0) AS n_true
  FROM langs l CROSS JOIN sources s
  LEFT JOIN counts c ON c.lang = l.lang AND c.source = s.source
),
keyed AS (
  SELECT lang, source, n_true,
         {_H60_DUCK.format(key="lang || ':' || source")} AS h
  FROM cells
),
drawn AS (
  SELECT lang, source, n_true, {_LAP_U} AS u FROM keyed
)
SELECT lang, source, n_true,
       n_true + {_LAP_NOISE} AS n_noisy,
       CAST(500000 AS BIGINT) AS eps_micro
FROM drawn
""",
    tags=("privacy", "dp", "laplace", "audit"),
)
def q477_dp_laplace_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE count release (Dwork et al. 2006) with a
    utility audit: per-(lang, source) document counts released under
    eps = 0.5 Laplace noise (sensitivity-1 counting query, scale
    b = 1/eps = 2), the noise drawn by inverse CDF from the
    deterministic md5 uniform (the q105 idiom — auditable releases
    need reproducible noise seeds; production would key the draw by a
    per-release secret). Two DP correctness points are load-bearing
    and tested: the release covers the FULL domain grid (langs ×
    sources including EMPTY cells — releasing only non-empty cells
    leaks exact emptiness, the classic DP release bug), and the true
    count appears beside the noisy one ONLY because this is the
    utility-audit operator (realized |noise| vs the 2b expectation);
    the production artifact drops n_true.

    Scale shape: one map-side-combined groupBy to the cell counts,
    a broadcast domain grid (|langs| x |sources| rows — metadata),
    and one hash + one ln per CELL, not per document: the noise cost
    is O(domain), independent of corpus size — the whole release for
    a 100 TB corpus is a few hundred rows. The noise chain is ONE
    shared float expression floored to an integer delta; everything
    else is exact integers."""
    d = load_table(spark, sf_dir, "documents")
    langs = d.select("lang").distinct()
    sources = d.select("source").distinct()
    counts = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    cells = (
        langs.crossJoin(F.broadcast(sources))
        .join(counts, ["lang", "source"], "left")
        .select("lang", "source",
                F.coalesce("n", F.lit(0)).cast("long").alias("n_true"))
    )
    drawn = cells.withColumn(
        "h",
        F.expr(_H60_SPARK.format(key="concat(lang, ':', source)")),
    ).withColumn("u", F.expr(_LAP_U))
    return drawn.select(
        "lang", "source", "n_true",
        (F.col("n_true") + F.expr(_LAP_NOISE)).alias("n_noisy"),
        F.lit(500000).cast("long").alias("eps_micro"),
    )


_KC_K = 8  # centers selected by greedy farthest-point (Gonzalez)


def _kcenter_sql() -> str:
    """Unrolled greedy k-center SQL (DuckDB side): d{t} = per-point
    min squared distance to the first t+1 centers; s{t} = the point
    selected at step t (argmax of d{t-1}, min-vec_id tie-break).
    Generated programmatically — 8 mechanical steps, one shared
    integer distance lambda."""

    def d2(a: str, b: str) -> str:
        # dimension-agnostic like the Spark side's zip_with/aggregate:
        # the range bound derives from the vector itself, so a fixture
        # dimension change fails loudly instead of silently truncating
        # (ADVICE r13)
        return (f"CAST(list_sum(list_transform(range(1, len({a}.q) + 1), "
                f"i -> ({a}.q[i] - {b}.q[i]) * ({a}.q[i] - {b}.q[i]))) "
                f"AS BIGINT)")

    parts = [f"""pts AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (SELECT MIN(vec_id) AS cid FROM pts),
d0 AS (
  SELECT p.vec_id, {d2('p', 'c')} AS md
  FROM pts p, pts c, c0 WHERE c.vec_id = c0.cid
)"""]
    for t in range(1, _KC_K):
        parts.append(f"""s{t} AS (
  SELECT vec_id, md FROM d{t - 1} ORDER BY md DESC, vec_id ASC LIMIT 1
)""")
        if t < _KC_K - 1:
            parts.append(f"""d{t} AS (
  SELECT d.vec_id, LEAST(d.md, {d2('p', 'c')}) AS md
  FROM d{t - 1} d, pts p, pts c, s{t}
  WHERE p.vec_id = d.vec_id AND c.vec_id = s{t}.vec_id
)""")
    selects = ["SELECT CAST(0 AS BIGINT) AS step, c0.cid AS center_id, "
               "CAST(0 AS BIGINT) AS d2_sel FROM c0"]
    selects += [f"SELECT CAST({t} AS BIGINT), vec_id, md FROM s{t}"
                for t in range(1, _KC_K)]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@register(
    "q478_kcenter_coreset",
    oracle=_kcenter_sql(),
    tags=("embedding", "coreset", "kcenter", "diversity"),
)
def q478_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY k-CENTER CORESET over the embeddings (Gonzalez 1985
    farthest-point traversal, the 2-approximation to metric k-center)
    — diversity selection for data curation: pick the 8 embeddings
    that best COVER the corpus, with the coverage radius each pick
    achieved in-result (d2_sel at step t is the squared distance of
    the selected point to the first t centers = the coverage radius
    of the t-center solution; the sequence is non-increasing, an
    invariant tests/test_round14.py pins). Deterministic seed: the
    minimum vec_id; ties at equal distance break to the smaller
    vec_id in both engines.

    INTEGER-EXACT throughout (the q471 discipline): embeddings
    quantize once to floor(x * 2^20) longs, squared distances are
    zip_with/aggregate integer chains (<= 64 * (2^21)^2 = 2^48, safe
    in int64 for any corpus), so unordered aggregation cannot
    re-round anything. Engine shape: the quantized relation persists
    once; each of the 7 refinement steps is ONE broadcast of a single
    64-int center against the point set, a zip_with kernel inside
    whole-stage codegen, and an integer LEAST against the running
    min-distance column — O(k·n·dim) total work, one tiny argmax
    TakeOrdered per step (k driver-side 1-row collects, the bounded-
    scalar pattern). At 100 TB the same loop runs with the centers in
    a broadcast variable and the min-distance column carried in the
    point relation — no shuffle of the points EVER happens."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
               "* 1048576.0) AS BIGINT))").alias("q"),
    ).persist()
    _D2_NEW = ("CAST(aggregate(zip_with(q, qc, (x, y) -> (x - y) * (x - y)),"
               " 0L, (acc, v) -> acc + v) AS BIGINT)")
    cached = []
    try:
        seed = pts.orderBy("vec_id").limit(1).collect()[0]
        chosen = [(0, int(seed["vec_id"]), 0)]
        md = (
            pts.withColumn("qc", F.array(*[F.lit(int(v))
                                           for v in seed["q"]]))
            .select("vec_id", "q", F.expr(_D2_NEW).alias("md"))
        )
        for t in range(1, _KC_K):
            md = md.persist()
            cached.append(md)
            pick = (md.orderBy(F.col("md").desc(), F.col("vec_id").asc())
                    .limit(1).collect()[0])
            chosen.append((t, int(pick["vec_id"]), int(pick["md"])))
            md = (
                md.withColumn(
                    "qc", F.array(*[F.lit(int(v)) for v in pick["q"]]))
                .select("vec_id", "q",
                        F.expr(f"least(md, {_D2_NEW})").alias("md"))
            )
        return spark.createDataFrame(
            chosen, "step long, center_id long, d2_sel long")
    finally:
        pts.unpersist()
        for df in cached:
            df.unpersist()


@register(
    "q480_threshold_sensitivity_curve",
    oracle=f"""
WITH fam AS (SELECT doc_id, md5(text) AS fkey FROM documents),
st AS (SELECT fkey, MIN(doc_id) AS rep FROM fam GROUP BY fkey),
shall AS ({_SQL_SHINGLES}),
sz AS (
  SELECT s.doc_id, len(s.shingles) AS n, s.shingles
  FROM shall s JOIN st ON st.rep = s.doc_id
  WHERE len(s.shingles) > 0
),
exx AS (SELECT doc_id, n, unnest(shingles) AS s FROM sz),
pr AS (
  SELECT a.doc_id AS da, a.n AS na, b.doc_id AS db, b.n AS nbb,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
jp AS (
  SELECT da, db, inter, na + nbb - inter AS un
  FROM pr WHERE 2 * inter >= na + nbb - inter
),
banded AS (SELECT (10 * inter) // un AS band, da, db FROM jp),
pairs AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM banded GROUP BY band
),
docs AS (
  SELECT band, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
  FROM (SELECT band, da AS d FROM banded
        UNION ALL SELECT band, db FROM banded)
  GROUP BY band
)
SELECT CAST(p.band AS BIGINT) AS band, p.n_pairs, d.n_docs,
       CAST(SUM(p.n_pairs) OVER (ORDER BY p.band DESC) AS BIGINT)
         AS cum_pairs_at_threshold
FROM pairs p JOIN docs d USING (band)
""",
    tags=("dedup", "threshold", "sensitivity", "audit"),
)
def q480_threshold_sensitivity_curve(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP THRESHOLD SENSITIVITY CURVE — the parameter-tuning
    deliverable of the near-dup stack: qualifying pairs of the q446
    chain bucketed by Jaccard band (band b = floor(10·J), b = 5..10),
    with the per-band document footprint and the CUMULATIVE pair
    count at each candidate threshold (cum at band b = pairs a
    J >= b/10 cutoff would act on). A curation team reads this table
    to pick the threshold: how much removal mass each 0.1 step of
    strictness adds, BEFORE re-running anything — the whole curve
    costs one verify pass because the 0.5 prefix filter is lossless
    for every band above it.

    Engine shape: the q392/q446 machinery — exact-family collapse
    (candidates ride distinct-text volume), Bayardo/Chaudhuri
    prefix-filter candidates at the 0.5 bound (lossless for ALL
    reported bands — the reason one candidate pass serves six
    thresholds), one array_intersect verify per candidate — all of it
    read from the `qualifying_pairs` companion slot of the q446
    cluster cache (the chain is paid ONCE per session; without the
    slot this query re-paid it at ~16 s warm), then a 6-row band
    census with a window cumsum over bands. All integer arithmetic:
    the band index is (10·inter) DIV union; no float exists
    anywhere."""
    from cli_spark.operators.round11 import qualifying_pairs

    jp = qualifying_pairs(spark, sf_dir)
    banded = jp.select(
        F.expr("(10 * inter) DIV un").alias("band"), "doc_a", "doc_b")
    pairs = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))
    docs = (
        banded.select("band", F.col("doc_a").alias("d"))
        .unionAll(banded.select("band", F.col("doc_b").alias("d")))
        .groupBy("band")
        .agg(F.countDistinct("d").cast("long").alias("n_docs"))
    )
    return (
        pairs.join(docs, "band")
        .withColumn(
            "cum_pairs_at_threshold",
            F.sum("n_pairs").over(
                Window.orderBy(F.col("band").desc())
                .rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .select(F.col("band").cast("long").alias("band"), "n_pairs",
                "n_docs", "cum_pairs_at_threshold")
    )
