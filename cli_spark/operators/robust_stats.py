"""Robust / closed-form statistics — OLS regression, Spearman rank
correlation, median-absolute-deviation outliers, Gini diversity.

Float aggregation order is engine- and partitioning-dependent, so all
four operators compute their statistic from EXACT integer moment sums
(quantized cents, integer ranks, integer counts) and only convert to
double at the very end — int64→double conversion and IEEE division of
identical operands are bit-identical in Spark and DuckDB, making the
results reproducible under AQE and hash-comparable cross-engine
(same strategy as functions/determinism.py, applied to second-order
moments).

Overflow discipline (ANSI mode raises, which is the safety net): each
product of sums is bounded in the docstrings below; at 100 TB the same
shapes shard by the grouping key exactly as written — the bounds are
per-GROUP, not per-corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.training import _SQL_WORDS, _words_col
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# value quantized to integer cents: exact in both engines.
_Q_SPARK = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
_Q_SQL = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
# hour index since the corpus epoch — small integer x for regressions.
_X_SPARK = "CAST(unix_micros(ts) div 3600000000 AS BIGINT)"
_X_SQL = "CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT)"


@register(
    "q171_regression_closed_form",
    oracle=f"""
WITH pts AS (
  SELECT event_type, {_X_SQL} - 473352 AS x, {_Q_SQL} AS y FROM events
),
mom AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_hr,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 4) AS intercept_cents,
       round((CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              / sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r
FROM mom
""",
    tags=("stats", "regression", "deterministic"),
)
def q171_regression_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (value-cents vs hours-since-corpus-epoch) from
    exact integer moment sums — the distributed closed form: one
    map-side-combinable aggregation produces (n, Σx, Σy, Σx², Σxy, Σy²)
    and slope/intercept/r come out in final projection. Identical to
    Spark's regr_slope/regr_r2 numerically but reproducible: integer
    sums are order-independent, and the final double ops are IEEE-
    identical cross-engine. x is re-based (epoch-hour − 473352 ≈
    2024-01-01) to keep n·Σxy < 2^63 per group; at larger row counts
    shard the group key by day. Cites regr_* semantics (public SQL
    spec), not any engine internals."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        (F.expr(_X_SPARK) - F.lit(473352)).alias("x"),
        F.expr(_Q_SPARK).alias("y"),
    )
    mom = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.expr("CAST(n * sxy - sx * sy AS DOUBLE)")
    den = F.expr("CAST(n * sxx - sx * sx AS DOUBLE)")
    den_y = F.expr("CAST(n * syy - sy * sy AS DOUBLE)")
    slope = num / den
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope_cents_per_hr"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            4,
        ).alias("intercept_cents"),
        F.round(num / F.sqrt(den) / F.sqrt(den_y), 6).alias("r"),
    )


@register(
    "q172_spearman_rank_corr",
    oracle=f"""
WITH ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {_X_SQL} ASC, event_id ASC) AS rt,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {_Q_SQL} ASC, event_id ASC) AS rv
  FROM events
),
mom AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM((rt - rv) * (rt - rv)) AS BIGINT) AS sd2
  FROM ranked GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(1.0 - CAST(6 * sd2 AS DOUBLE)
                   / CAST(n * (n * n - 1) AS DOUBLE), 6) AS spearman_rho
FROM mom
""",
    tags=("stats", "rank", "deterministic"),
)
def q172_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (time-rank vs value-rank per event
    type) via the classic 1 − 6Σd²/(n(n²−1)) identity on integer ranks.
    Ties are broken by event_id on BOTH rank axes (a deterministic
    variant of fractional tie-ranks — documented, and identical in the
    oracle). Two window passes over the same event_type partitioning +
    one aggregation; Σd² ≤ n³ keeps BIGINT headroom to ~2M rows per
    group (shard the key beyond that)."""
    e = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type").orderBy(
        F.expr(_X_SPARK).asc(), F.col("event_id").asc()
    )
    wv = Window.partitionBy("event_type").orderBy(
        F.expr(_Q_SPARK).asc(), F.col("event_id").asc()
    )
    ranked = e.select(
        "event_type",
        F.row_number().over(wt).cast("long").alias("rt"),
        F.row_number().over(wv).cast("long").alias("rv"),
    )
    mom = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rt") - F.col("rv")) * (F.col("rt") - F.col("rv"))).alias(
            "sd2"
        ),
    )
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.lit(1.0)
            - (F.lit(6) * F.col("sd2")).cast("double")
            / F.expr("CAST(n * (n * n - 1) AS DOUBLE)"),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "q173_mad_outliers",
    oracle=f"""
WITH q AS (
  SELECT event_type, event_id, {_Q_SQL} AS qc FROM events
),
med AS (
  SELECT event_type, qc AS med_cents FROM (
    SELECT event_type, qc,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY qc ASC, event_id ASC) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM q) WHERE rk = (n + 1) // 2
),
dev AS (
  SELECT q.event_type, q.event_id, abs(q.qc - m.med_cents) AS d, m.med_cents
  FROM q JOIN med m ON q.event_type = m.event_type
),
mad AS (
  SELECT event_type, d AS mad_cents, med_cents FROM (
    SELECT event_type, d, med_cents,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY d ASC, event_id ASC) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev) WHERE rk = (n + 1) // 2
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(mad.med_cents) AS BIGINT) AS median_cents,
       CAST(MIN(mad_cents) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN dev.d > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
""",
    tags=("stats", "robust", "outliers"),
)
def q173_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier census per event type, fully
    integer-exact: the 'median' is the LOWER median (rank ⌈n/2⌉ under a
    total order with event_id tie-break) of quantized cents, so no
    interpolation float ever crosses the hash boundary. Two
    rank-and-pick passes (median, then MAD) and a broadcast join of the
    5-row medians back onto the deviations. At 100 TB the rank pass is
    a per-key sort — swap in approx_percentile for the same shape when
    exactness isn't contractual."""
    e = load_table(spark, sf_dir, "events")
    q = e.select("event_type", "event_id", F.expr(_Q_SPARK).alias("qc"))

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(
            F.col(col).asc(), F.col("event_id").asc()
        )
        wc = Window.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                col,
                F.row_number().over(w).alias("rk"),
                F.count(F.lit(1)).over(wc).alias("n"),
            )
            .filter(F.col("rk") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = lower_median(q, "qc", "med_cents")
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("qc") - F.col("med_cents")).alias("d"),
        "med_cents",
    )
    mad = lower_median(dev, "d", "mad_cents")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("med_cents").cast("long").alias("median_cents"),
            F.min("mad_cents").cast("long").alias("mad_cents"),
            F.sum(
                F.when(F.col("d") > F.lit(3) * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "q174_gini_diversity",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
),
per_user AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS total,
         COUNT(*) AS distinct_types,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY user_id
)
SELECT user_id, total, CAST(distinct_types AS BIGINT) AS distinct_types,
       CAST((total * total - s2) * 1000000 // (total * total) AS BIGINT)
         AS gini_ppm
FROM per_user
""",
    tags=("stats", "diversity", "deterministic"),
)
def q174_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each user's event-type mix as exact integer
    ppm: 1 − Σ(cᵢ/N)² computed as (N² − Σcᵢ²)·10⁶ // N² — a rational
    diversity score with NO logarithm (cross-engine ln() is libm-
    dependent; entropy is deliberately avoided). Two stacked
    aggregations on the same user_id shuffle; per-user N < 3M keeps
    N²·10⁶ inside BIGINT."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("distinct_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return per_user.select(
        "user_id",
        "total",
        "distinct_types",
        F.expr(
            "CAST((total * total - s2) * CAST(1000000 AS BIGINT)"
            " div (total * total) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@register(
    "q220_ks_drift_test",
    oracle=f"""
WITH lens AS (
  SELECT source, CAST(len({_SQL_WORDS}) AS BIGINT) AS v
  FROM documents WHERE source IN ('src0', 'src1')
),
hist AS (
  SELECT v,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lens GROUP BY v
),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM hist
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM hist
),
scored AS (
  SELECT c.v, t.n_a, t.n_b,
         abs(c.cum_a * t.n_b - c.cum_b * t.n_a) AS d_scaled
  FROM cum c CROSS JOIN tot t
),
best AS (
  SELECT v, n_a, n_b, d_scaled,
         row_number() OVER (ORDER BY d_scaled DESC, v ASC) AS rnk
  FROM scored
)
SELECT n_a, n_b,
       CAST(d_scaled AS BIGINT) AS d_scaled,
       CAST(d_scaled * 1000000 // (n_a * n_b) AS BIGINT) AS d_ppm,
       CAST(v AS BIGINT) AS at_value
FROM best WHERE rnk = 1
""",
    tags=("stats", "drift", "ks"),
)
def q220_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    sources' document-length distributions — the distribution-shift
    alarm a data pipeline raises when a feed changes character. The
    KS supremum |F_a(v) − F_b(v)| is computed EXACTLY in integers by
    cross-multiplying cumulative counts (|cum_a·n_b − cum_b·n_a|,
    division deferred to the final ppm quantization), so both engines
    agree bitwise — no float CDFs anywhere.

    Scale shape: raw docs collapse to a value histogram with
    map-side combine first; the cumulative window and argmax run on
    the tiny value-support relation (≤ distinct lengths rows). The
    single-partition window over the support is bounded by value
    cardinality, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.size(_words_col()).cast("long").alias("v")
    )
    hist = lens.groupBy("v").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    cum_w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "v",
        F.sum("ca").over(cum_w).alias("cum_a"),
        F.sum("cb").over(cum_w).alias("cum_b"),
    )
    tot = hist.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")).alias(
            "d_scaled"
        ),
    )
    rnk_w = Window.orderBy(F.col("d_scaled").desc(), F.col("v").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") == 1)
        .select(
            "n_a",
            "n_b",
            F.col("d_scaled").cast("long").alias("d_scaled"),
            F.expr("d_scaled * 1000000 div (n_a * n_b)").cast("long").alias("d_ppm"),
            F.col("v").cast("long").alias("at_value"),
        )
    )


@register(
    "q231_equiheight_histogram",
    oracle="""
WITH vals AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents, l_orderkey, l_linenumber
  FROM lineitem
),
binned AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents ASC, l_orderkey ASC, l_linenumber ASC) AS bin
  FROM vals
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM binned GROUP BY bin
""",
    tags=("stats", "histogram", "analyze"),
)
def q231_equiheight_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height (equi-depth) histogram of line-item prices — the
    statistic a cost-based optimizer's ANALYZE collects for
    selectivity estimation: ten equal-population bins with their
    value boundaries and mass, computed over exact integer cents
    with full-key tie-breaks so both engines draw identical bin
    edges.

    Scale shape: the global NTILE is the teaching form; at 100 TB
    the same table comes from approx_percentile boundaries + one
    bucketing pass (two linear scans, no global sort). The aggregate
    per bin is map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.orderBy(
        F.col("cents").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    binned = vals.select("cents", F.ntile(10).over(w).alias("bin"))
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(F.col("bin").cast("long").alias("bin"), "n_rows", "lo_cents", "hi_cents", "sum_cents")


@register(
    "q232_theil_sen_slope",
    oracle="""
WITH sample_pts AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x_day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y_cents,
         o_orderkey
  FROM orders
  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
  LIMIT 200
),
slopes AS (
  SELECT CAST(floor(CAST((b.y_cents - a.y_cents) * 1000000 AS DOUBLE)
                    / (b.x_day - a.x_day)) AS BIGINT) AS slope_scaled
  FROM sample_pts a JOIN sample_pts b
    ON a.o_orderkey < b.o_orderkey AND a.x_day != b.x_day
),
ranked AS (
  SELECT slope_scaled,
         row_number() OVER (ORDER BY slope_scaled ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM slopes
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_slopes,
       CAST(MIN(CASE WHEN rn * 2 >= n + 1 THEN slope_scaled END) AS BIGINT)
         AS median_slope_scaled
FROM ranked
""",
    tags=("stats", "robust", "regression"),
)
def q232_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator: the median of pairwise
    slopes between order dates and totals — the outlier-immune
    answer to "is spend trending up" (q171's least-squares
    complement; one wild order can't move a median of slopes). Run
    on a deterministic md5 sample of 200 orders, the standard
    protocol for an O(n²)-pair estimator; slopes are quantized to
    integer micro-cents/day BEFORE ranking so the median is an
    exact order statistic in both engines (lower median: first rank
    with rn·2 ≥ n+1).

    Scale shape: the quadratic pair join is sample×sample (19,900
    pairs — broadcast-sized) and never touches the full fact
    table."""
    o = load_table(spark, sf_dir, "orders")
    sample_pts = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("x_day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("y_cents"),
            "o_orderkey",
        )
        .orderBy(F.md5(F.encode(F.col("o_orderkey").cast("string"), "utf-8")), "o_orderkey")
        .limit(200)
    )
    a = sample_pts.alias("a")
    b = sample_pts.alias("b")
    slopes = a.join(
        b,
        (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.x_day") != F.col("b.x_day")),
    ).select(
        F.floor(
            ((F.col("b.y_cents") - F.col("a.y_cents")) * 1000000).cast("double")
            / (F.col("b.x_day") - F.col("a.x_day"))
        ).cast("long").alias("slope_scaled")
    )
    rank_w = Window.orderBy(F.col("slope_scaled").asc())
    ranked = slopes.select(
        "slope_scaled",
        F.row_number().over(rank_w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_slopes"),
        F.min(
            F.when(F.col("rn") * 2 >= F.col("n") + 1, F.col("slope_scaled"))
        ).cast("long").alias("median_slope_scaled"),
    )


@register(
    "q261_chi2_independence",
    oracle="""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
),
margins AS (
  SELECT lang, source, o,
         SUM(o) OVER (PARTITION BY lang) AS row_n,
         SUM(o) OVER (PARTITION BY source) AS col_n,
         SUM(o) OVER () AS total
  FROM cells
)
SELECT COUNT(*) AS n_cells,
       CAST(MAX(total) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(floor(CAST(o * o AS DOUBLE) * CAST(total AS DOUBLE)
                           * 1000000.0
                           / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)))
                AS BIGINT))
            - MAX(total) * 1000000 AS BIGINT) AS chi2_micro
FROM margins
""",
    tags=("stats", "chi2", "independence"),
)
def q261_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence statistic for the lang ×
    source contingency grid, via the margin form χ² = N·(Σ O²/(R·C))
    − N — the data-drift / stratification-bias test over two
    categorical columns. The contingency census is the only full-data
    aggregation; margins come from windows over the |langs|·|sources|
    grid. The statistic is emitted ×1e6 (chi2_micro) with each cell's
    O²·N·1e6/(R·C) term FLOORED TO AN INTEGER before the sum — the
    per-cell double expression is identical (hence bit-identical) in
    both engines, and the cross-cell sum is then exact integer
    arithmetic, immune to float summation order (the project-wide
    quantize-then-sum rule; summing raw doubles would hash-diverge
    under AQE partition reordering). A large χ² means source
    composition differs by language (mixture drift)."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    margins = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_n"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_n"),
        F.sum("o").over(Window.partitionBy()).alias("total"),
    )
    term = F.floor(
        (F.col("o") * F.col("o")).cast("double")
        * F.col("total").cast("double")
        * F.lit(1000000.0)
        / (F.col("row_n").cast("double") * F.col("col_n").cast("double"))
    ).cast("long")
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("total").alias("n_docs"),
        (F.sum(term) - F.max("total") * F.lit(1000000)).cast("long")
        .alias("chi2_micro"),
    )


@register(
    "q301_anova_f",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
piv AS (
  SELECT SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN cents ELSE 0 END) AS BIGINT) AS s_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_c,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_e,
         CAST(SUM(CASE WHEN event_type = 'error' THEN cents ELSE 0 END) AS BIGINT) AS s_e,
         CAST(SUM(CASE WHEN event_type = 'error' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_e,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS s_p,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_p,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_s,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN cents ELSE 0 END) AS BIGINT) AS s_s,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_s,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_v,
         CAST(SUM(CASE WHEN event_type = 'view' THEN cents ELSE 0 END) AS BIGINT) AS s_v,
         CAST(SUM(CASE WHEN event_type = 'view' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_v
  FROM c
)
SELECT CAST(n_c + n_e + n_p + n_s + n_v AS BIGINT) AS n_total,
       CAST(n_c AS BIGINT) AS n_c, CAST(n_e AS BIGINT) AS n_e,
       CAST(n_p AS BIGINT) AS n_p, CAST(n_s AS BIGINT) AS n_s,
       CAST(n_v AS BIGINT) AS n_v,
       s_c, s_e, s_p, s_s, s_v,
       4 AS df_between,
       CAST((n_c + n_e + n_p + n_s + n_v) - 5 AS BIGINT) AS df_within,
       CAST(floor((((CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) + CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE) / CAST(n_e AS DOUBLE) + CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE) / CAST(n_p AS DOUBLE) + CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE) / CAST(n_s AS DOUBLE) + CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE)
           - CAST(s_c + s_e + s_p + s_s + s_v AS DOUBLE) * CAST(s_c + s_e + s_p + s_s + s_v AS DOUBLE)
             / CAST(n_c + n_e + n_p + n_s + n_v AS DOUBLE)) / 4.0)
          / ((CAST(q_c + q_e + q_p + q_s + q_v AS DOUBLE) - (CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) + CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE) / CAST(n_e AS DOUBLE) + CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE) / CAST(n_p AS DOUBLE) + CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE) / CAST(n_s AS DOUBLE) + CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE))) / CAST((n_c + n_e + n_p + n_s + n_v) - 5 AS DOUBLE))) * 1000000.0) AS BIGINT) AS f_micro
FROM piv
""",
    tags=("analytics", "stats", "anova"),
)
def q301_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic across the 5 event-type groups on
    integer cents — does mean spend differ by event type? The pivot
    trick that made q273's z exact: because the group set is FIXED,
    per-group (n, Σx, Σx²) become pivoted COLUMNS of one scalar row,
    so the between/within sum-of-squares chain is a single
    fixed-operand-order IEEE double expression — no float aggregation
    whose summation order could differ between engines — and
    floor(F·1e6) matches bit-for-bit. Everything upstream is exact
    integer conditional aggregation in one scan (q261's chi² tests
    independence of categorical margins; this tests equality of
    continuous group means — the other classic omnibus)."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    # each pivoted aggregate carries its alias inside the expr string
    piv = c.groupBy().agg(
        *[F.expr(x.strip())
          for x in """SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN cents ELSE 0 END) AS BIGINT) AS s_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_c,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_e,
         CAST(SUM(CASE WHEN event_type = 'error' THEN cents ELSE 0 END) AS BIGINT) AS s_e,
         CAST(SUM(CASE WHEN event_type = 'error' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_e,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS s_p,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_p,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_s,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN cents ELSE 0 END) AS BIGINT) AS s_s,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_s,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_v,
         CAST(SUM(CASE WHEN event_type = 'view' THEN cents ELSE 0 END) AS BIGINT) AS s_v,
         CAST(SUM(CASE WHEN event_type = 'view' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_v""".replace("\n", " ").split(",")]
    )
    return piv.selectExpr(
        "n_c + n_e + n_p + n_s + n_v AS n_total",
        "n_c", "n_e", "n_p", "n_s", "n_v",
        "s_c", "s_e", "s_p", "s_s", "s_v",
        "4 AS df_between",
        "(n_c + n_e + n_p + n_s + n_v) - 5 AS df_within",
        """CAST(floor((((CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) + CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE) / CAST(n_e AS DOUBLE) + CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE) / CAST(n_p AS DOUBLE) + CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE) / CAST(n_s AS DOUBLE) + CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE)
           - CAST(s_c + s_e + s_p + s_s + s_v AS DOUBLE) * CAST(s_c + s_e + s_p + s_s + s_v AS DOUBLE)
             / CAST(n_c + n_e + n_p + n_s + n_v AS DOUBLE)) / 4.0)
          / ((CAST(q_c + q_e + q_p + q_s + q_v AS DOUBLE) - (CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) + CAST(s_e AS DOUBLE) * CAST(s_e AS DOUBLE) / CAST(n_e AS DOUBLE) + CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE) / CAST(n_p AS DOUBLE) + CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE) / CAST(n_s AS DOUBLE) + CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE))) / CAST((n_c + n_e + n_p + n_s + n_v) - 5 AS DOUBLE))) * 1000000.0) AS BIGINT) AS f_micro""",
    )


# Shared integer scaffolding for q376: doubled average ranks keep tied
# ranks exact (avg rank of a tie block = (first+last)/2, so DOUBLED it
# is the integer first+last = 2*before + m + 1 per member).
_MWU_CORE = """
WITH c AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
         {q} AS cents
  FROM events WHERE event_type IN ('purchase', 'error')
),
vals AS (
  SELECT cents, COUNT(*) AS m, SUM(g1) AS m1
  FROM c GROUP BY cents
),
ranked AS (
  SELECT cents, m, m1,
         COALESCE(SUM(m) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM vals
),
moments AS (
  SELECT CAST(SUM(m1) AS BIGINT) AS n1,
         CAST(SUM(m - m1) AS BIGINT) AS n2,
         CAST(SUM(m1 * (2 * before + m + 1)) AS BIGINT) AS r1_doubled,
         CAST(SUM(m * m * m - m) AS BIGINT) AS tie_cubic_sum
  FROM ranked
)
SELECT n1, n2,
       r1_doubled - n1 * (n1 + 1) AS u1_doubled,
       tie_cubic_sum,
       CAST(floor(
         (CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
         / (2.0 * sqrt(
             (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
             * (CAST(n1 + n2 + 1 AS DOUBLE)
                - CAST(tie_cubic_sum AS DOUBLE)
                  / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))))
         * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM moments
"""


@register(
    "q376_mann_whitney_u",
    oracle=_MWU_CORE.format(q=_Q_SQL),
    tags=("analytics", "stats", "nonparametric"),
)
def q376_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (purchase vs error spend) — the
    nonparametric two-sample test q273's z-test can't replace when
    the distributions are skewed: compare RANKS, not means. The whole
    statistic is exact-integer until the last expression: tied ranks
    carry their textbook average via DOUBLED ranks (a tie block's
    doubled average rank is the integer 2*before + m + 1, so
    R1_doubled, U1_doubled and the t^3 - t tie-correction sum are all
    int64), and the normal-approximation z with tie-corrected
    variance is one fixed-operand-order IEEE expression emitted as
    floor-micro (the q301 discipline). Scale shape: one shuffle to
    the distinct-value relation (GROUP BY cents), a window cumsum
    over it, and a scalar fold — rank tables never materialize
    per-row, which is what makes rank tests feasible at 100 TB."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MWU_CORE.format(q=_Q_SPARK))


# Inverse-normal threshold ladder for q377: t_i = PHI^-1(1 - (i*alpha/m)/2)
# in floor-micro units, for m = 25 groups at alpha = 0.1 (two-sided).
# Generated once from the standard normal quantile function
# (statistics.NormalDist().inv_cdf); shared literals mean neither
# engine ever evaluates an inverse CDF — the same technique as the
# q328 DCG discount table.
_BH_LADDER = (2878161, 2652069, 2512144, 2408915, 2326347, 2257129,
              2197286, 2144410, 2096927, 2053748, 2014090, 1977368,
              1943133, 1911035, 1880793, 1852179, 1825006, 1799118,
              1774381, 1750686, 1727934, 1706043, 1684940, 1664562,
              1644853)

_BH_CORE = """
WITH per AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
gtot AS (
  SELECT CAST(SUM(n_cust) AS BIGINT) AS n_tot,
         CAST(SUM(n_pos) AS BIGINT) AS pos_tot
  FROM per
),
z AS (
  SELECT per.n_name, per.n_cust, per.n_pos,
         abs(CAST(floor(
           (CAST(per.n_pos AS DOUBLE) / CAST(per.n_cust AS DOUBLE)
            - CAST(gtot.pos_tot AS DOUBLE) / CAST(gtot.n_tot AS DOUBLE))
           / sqrt((CAST(gtot.pos_tot AS DOUBLE) / CAST(gtot.n_tot AS DOUBLE))
                  * (1.0 - CAST(gtot.pos_tot AS DOUBLE) / CAST(gtot.n_tot AS DOUBLE))
                  / CAST(per.n_cust AS DOUBLE))
           * 1000000.0 + 0.5) AS BIGINT)) AS abs_z_micro
  FROM per CROSS JOIN gtot
),
ranked AS (
  SELECT n_name, n_cust, abs_z_micro,
         CAST(row_number() OVER (ORDER BY abs_z_micro DESC, n_name)
              AS BIGINT) AS bh_rank,
         CASE WHEN abs_z_micro >= ladder[{idx}] THEN 1 ELSE 0 END AS passes
  FROM (SELECT z.*, {ladder} AS ladder FROM z)
),
cutoff AS (
  SELECT COALESCE(MAX(CASE WHEN passes = 1 THEN bh_rank END), 0) AS istar
  FROM ranked
)
SELECT r.n_name, r.n_cust, r.abs_z_micro, r.bh_rank,
       CASE WHEN r.bh_rank <= c.istar THEN 1 ELSE 0 END AS rejected
FROM ranked r CROSS JOIN cutoff c
"""


@register(
    "q377_bh_fdr_stepup",
    oracle=_BH_CORE.format(
        ladder="[" + ", ".join(str(t) for t in _BH_LADDER) + "]",
        idx="CAST(bh_rank AS INTEGER)",
    ),
    tags=("analytics", "stats", "multiple_testing"),
)
def q377_bh_fdr_stepup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up (JRSS-B 1995) over the 25
    per-nation positive-balance proportion tests — the multiple-
    testing control every per-segment drift/AB scan needs before
    alerting on its largest deviation. The classic obstacle to BH in
    SQL is the p-value (no erf in either engine); the standard
    monotone-transform escape is applied instead: p_(i) <= i*alpha/m
    iff |z|_(i) >= PHI^-1(1 - i*alpha/(2m)), so the step-up compares
    each rank's |z| (exact floor-micro, q273's one-sample form)
    against a PRECOMPUTED inverse-normal ladder literal — every
    graded comparison is integer-exact. Rejected set = all ranks up
    to the LARGEST passing rank (the step-up, not step-down, rule:
    ranks that fail their own threshold are still rejected when a
    later rank passes). One aggregate per nation, one 25-row window —
    the fact scan dominates, as it must at 100 TB."""
    from cli_spark.tables import register_views

    register_views(spark, sf_dir)
    # Spark array subscripts are 0-based (DuckDB's are 1-based — the
    # oracle's idx differs by exactly that one).
    return spark.sql(_BH_CORE.format(
        ladder="array(" + ", ".join(str(t) for t in _BH_LADDER) + ")",
        idx="CAST(bh_rank AS INTEGER) - 1",
    ))
