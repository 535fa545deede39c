"""Pipeline audit operators: referential-integrity census and
engine-portable table checksums.

At 100 TB you cannot eyeball a load — audits are queries:

* q118 counts orphan foreign keys across every relationship of the
  star schema in one result set. Each check is a broadcast anti-join
  census (dims broadcast; facts scanned once each, never shuffled),
  so the whole audit costs a handful of fact scans.
* q119 fingerprints every table with a deterministic, order- and
  partitioning-independent checksum: XOR of a 48-bit integer derived
  from md5 of the key column, plus the row count. XOR is commutative
  and associative with NO overflow at any cardinality (a SUM of
  48-bit hashes overflows BIGINT past ~65k rows — caught by the
  sf0.1 sweep under ANSI mode), and the per-row hash is
  engine-portable — so the same checksum computed by ANY engine
  (here: the DuckDB oracle) proves byte-level agreement on the key
  set after a migration or sink. The count catches the XOR blind
  spot (a value appearing an even number of times cancels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# (relationship label, fact table, fk col, dim table, pk col)
_FKS = [
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


@register(
    "q118_fk_integrity",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{label}' AS relationship,
       (SELECT COUNT(*) FROM {fact}) AS fact_rows,
       (SELECT COUNT(*) FROM {fact} f
        WHERE f.{fk} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk}))
         AS orphan_rows"""
        for label, fact, fk, dim, pk in _FKS
    ),
    tags=("audit", "integrity", "anti-join"),
)
def q118_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: per FK relationship, total fact
    rows and orphans (non-null FK with no matching dim PK) via
    broadcast left-anti joins. A clean load reports all zeros; any
    non-zero pinpoints the broken relationship without a re-scan."""
    out = None
    for label, fact, fk, dim, pk in _FKS:
        f_df = load_table(spark, sf_dir, fact)
        d_df = load_table(spark, sf_dir, dim)
        orphans = (
            f_df.filter(F.col(fk).isNotNull())
            .join(F.broadcast(d_df), f_df[fk] == d_df[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("orphan_rows"))
        )
        row = (
            f_df.agg(F.count(F.lit(1)).alias("fact_rows"))
            .crossJoin(orphans)
            .select(
                F.lit(label).alias("relationship"), "fact_rows", "orphan_rows"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# 48-bit portable row hash: 12 hex chars of md5(key) via 1-based instr
# arithmetic — identical text parses in Spark SQL and DuckDB.
def _hash48(key: str) -> str:
    digits = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({key}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"({digits})"


_KEYS = {
    "region": "CAST(r_regionkey AS STRING)",
    "nation": "CAST(n_nationkey AS STRING)",
    "customer": "CAST(c_custkey AS STRING)",
    "supplier": "CAST(s_suppkey AS STRING)",
    "part": "CAST(p_partkey AS STRING)",
    "orders": "CAST(o_orderkey AS STRING)",
    "lineitem": "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING)",
    "documents": "CAST(doc_id AS STRING)",
    "embeddings": "CAST(vec_id AS STRING)",
}


@register(
    "q119_table_checksums",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, COUNT(*) AS row_count,
       CAST(bit_xor({_hash48(k.replace("AS STRING", "AS VARCHAR"))}) AS BIGINT) AS key_checksum"""
        + f" FROM {t}"
        for t, k in _KEYS.items()
    ),
    tags=("audit", "checksum"),
)
def q119_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/partitioning-independent key checksums for every keyed
    table: row count + commutative XOR of a 48-bit md5-derived hash
    of the primary key (overflow-free at any scale, unlike a SUM).
    Identical output from any engine over the
    same data — the cheap cross-system equality proof for migrations
    and sink round-trips (events is excluded: its key audit rides the
    ns-timestamp rebuild tested elsewhere)."""
    out = None
    for t, k in _KEYS.items():
        df = load_table(spark, sf_dir, t)
        row = df.agg(
            F.count(F.lit(1)).alias("row_count"),
            F.bit_xor(F.expr(_hash48(k))).cast("long").alias("key_checksum"),
        ).select(F.lit(t).alias("table_name"), "row_count", "key_checksum")
        out = row if out is None else out.unionByName(row)
    return out


# q205 column profiler: (column, kind) drives the canonical min/max
# string form — bigint→decimal string, double→integer cents (monotone
# quantization, engine-exact), timestamp→pinned strftime format,
# varchar→identity. One wide aggregate then an unpivot: the profile
# is ONE scan of the table regardless of column count.
_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "varchar"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "varchar"),
]


def _prof_repr_sql(col: str, kind: str, agg: str) -> str:
    if kind == "double":
        return f"CAST(CAST(floor({agg}({col}) * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    if kind == "timestamp":
        return f"strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')"
    return f"CAST({agg}({col}) AS VARCHAR)"


def _prof_repr_spark(col: str, kind: str, agg) -> F.Column:
    if kind == "double":
        return F.floor(agg(col) * 100 + 0.5).cast("long").cast("string")
    if kind == "timestamp":
        return F.date_format(agg(col), "yyyy-MM-dd HH:mm:ss")
    return agg(col).cast("string")


@register(
    "q205_column_profile",
    oracle="WITH agg AS (SELECT COUNT(*) AS n_rows, "
    + ", ".join(
        f"COUNT({c}) AS nn_{i}, CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{i}, "
        f"{_prof_repr_sql(c, k, 'MIN')} AS mn_{i}, {_prof_repr_sql(c, k, 'MAX')} AS mx_{i}"
        for i, (c, k) in enumerate(_PROFILE_COLS)
    )
    + " FROM orders)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST(n_rows AS BIGINT) AS n_rows, "
        f"CAST(n_rows - nn_{i} AS BIGINT) AS n_nulls, nd_{i} AS n_distinct, "
        f"mn_{i} AS min_repr, mx_{i} AS max_repr FROM agg"
        for i, (c, k) in enumerate(_PROFILE_COLS)
    ),
    tags=("audit", "profile", "stats"),
)
def q205_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiler over `orders`: per column, row
    count, null count, exact distinct count, and canonical min/max
    string representations (doubles as integer cents — a monotone
    quantization, so min/max commute with it; timestamps in a pinned
    format so both engines print identically).

    Scale shape: ONE scan — a single wide aggregate computes every
    column's stats at once (Spark plans the multi-DISTINCT via one
    Expand + two-phase hash aggregate, still a single pass over the
    parquet), then a `stack` unpivots the 1-row result into one row
    per column. Profiling N columns never costs N scans; at 100 TB
    swap exact COUNT(DISTINCT) for approx_count_distinct per column
    and the same plan shape holds."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for i, (c, k) in enumerate(_PROFILE_COLS):
        aggs.append(F.count(c).cast("long").alias(f"nn_{i}"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{i}"))
        aggs.append(_prof_repr_spark(c, k, F.min).alias(f"mn_{i}"))
        aggs.append(_prof_repr_spark(c, k, F.max).alias(f"mx_{i}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', CAST(n_rows - nn_{i} AS BIGINT), nd_{i}, mn_{i}, mx_{i}"
        for i, (c, _k) in enumerate(_PROFILE_COLS)
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")


# Benford first-digit expectations, floor(log10(1+1/d)·1e6) — baked
# integer literals so neither engine computes a log at runtime.
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


@register(
    "q221_benford_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs),
expected(d, benford_ppm) AS (
  VALUES {", ".join(f"({i+1}, {p})" for i, p in enumerate(_BENFORD_PPM))}
)
SELECT e.d AS digit,
       COALESCE(o.n, 0) AS n_orders,
       CAST(COALESCE(o.n, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm,
       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(abs(COALESCE(o.n, 0) * 1000000 // t.total - e.benford_ppm) AS BIGINT)
         AS dev_ppm
FROM expected e LEFT JOIN obs o ON e.d = o.d CROSS JOIN tot t
""",
    tags=("audit", "benford", "stats"),
)
def q221_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    classic forensic screen for fabricated or truncated monetary
    data: observed leading-digit shares vs the log-law expectation,
    with the expectations baked in as integer ppm literals so no
    transcendental function runs in either engine. (Synthetic
    uniform-ish data FAILS Benford loudly — which is exactly what
    the audit should report; the operator's value is the comparison
    shape.)

    Scale shape: one projection to leading digits (string slice of
    the integer part — no float log), a 9-row census, and a
    broadcast expectations join."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("total"))
    expected = o.sparkSession.createDataFrame(
        [(i + 1, p) for i, p in enumerate(_BENFORD_PPM)], "d long, benford_ppm long"
    )
    return (
        expected.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
            F.expr("COALESCE(n, 0) * 1000000 div total").cast("long").alias("obs_ppm"),
            "benford_ppm",
            F.expr(
                "abs(COALESCE(n, 0) * 1000000 div total - benford_ppm)"
            ).cast("long").alias("dev_ppm"),
        )
    )


@register(
    "q327_expectations_scorecard",
    # Each expectation is one aggregate over its table — the oracle
    # states the identical census; constraint names are part of the
    # contract.
    oracle="""
SELECT * FROM (
  SELECT 'orders' AS tbl, 'o_orderkey_not_null' AS expectation,
         COUNT(*) AS n_checked,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_failed
  FROM orders
  UNION ALL
  SELECT 'orders', 'o_orderkey_unique', COUNT(*),
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders', 'o_orderstatus_accepted_values', COUNT(*),
         CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END)
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders', 'o_totalprice_positive', COUNT(*),
         CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem', 'l_orderkey_relationship', COUNT(*),
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem', 'l_quantity_range_1_50', COUNT(*),
         CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
              AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_discount_range_0_0_1', COUNT(*),
         CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                       THEN 0 ELSE 1 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'customer', 'c_custkey_unique', COUNT(*),
         CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'customer', 'c_nationkey_relationship', COUNT(*),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
)
""",
    tags=("audit", "expectations", "data_quality"),
)
def q327_expectations_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations scorecard — the dbt-test / Great
    Expectations surface as one engine pass: not_null, unique,
    accepted_values, range, cross-column ordering, and referential
    relationships declared as data, each compiled to a single
    aggregate (or one LEFT JOIN for relationships) over its table,
    unioned into the per-expectation (checked, failed) report a
    pipeline gates deploys on.

    Scale shape: every expectation over one table fuses into that
    table's single scan-and-aggregate (count/sum/countDistinct all
    partial-aggregate map-side); relationship checks are broadcast
    left joins against the dimension; nothing materializes failing
    ROWS (at 100 TB you gate on counts first and sample offenders
    separately)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def row(tbl: str, name: str, df: DataFrame, failed) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(failed).cast("long").alias("n_failed"),
        ).select(
            F.lit(tbl).alias("tbl"), F.lit(name).alias("expectation"),
            "n_checked", "n_failed",
        )

    def uniq(tbl: str, name: str, df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct(key)).cast("long").alias("n_failed"),
        ).select(
            F.lit(tbl).alias("tbl"), F.lit(name).alias("expectation"),
            "n_checked", "n_failed",
        )

    checks = [
        row("orders", "o_orderkey_not_null", o,
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
        uniq("orders", "o_orderkey_unique", o, "o_orderkey"),
        row("orders", "o_orderstatus_accepted_values", o,
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0).otherwise(1)),
        row("orders", "o_totalprice_positive", o,
            F.when(F.col("o_totalprice") > 0, 0).otherwise(1)),
        row("lineitem", "l_orderkey_relationship",
            li.join(o.select("o_orderkey"),
                    li["l_orderkey"] == F.col("o_orderkey"), "left"),
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
        row("lineitem", "l_quantity_range_1_50", li,
            F.when(F.col("l_quantity").between(1, 50), 0).otherwise(1)),
        row("lineitem", "l_discount_range_0_0_1", li,
            F.when((F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
                   0).otherwise(1)),
        uniq("customer", "c_custkey_unique", c, "c_custkey"),
        row("customer", "c_nationkey_relationship",
            c.join(F.broadcast(n.select("n_nationkey")),
                   c["c_nationkey"] == F.col("n_nationkey"), "left"),
            F.when(F.col("n_nationkey").isNull(), 1).otherwise(0)),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


@register(
    "q356_sharded_topk_audit",
    # Same construction in SQL: 16 doc-hash shards, per-shard top-10
    # terms by (count DESC, term ASC), candidate union re-scored with
    # EXACT global counts, compared against the true global top-20.
    oracle="""
WITH words AS (
  SELECT doc_id % 16 AS shard,
         unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS term
  FROM documents
),
shard_counts AS (
  SELECT shard, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM words GROUP BY shard, term
),
local_top AS (
  SELECT shard, term, n,
         row_number() OVER (PARTITION BY shard ORDER BY n DESC, term) AS rn
  FROM shard_counts
),
cand AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_shards_voting
  FROM local_top WHERE rn <= 10 GROUP BY term
),
global_counts AS (
  SELECT term, CAST(SUM(n) AS BIGINT) AS n_total FROM shard_counts GROUP BY term
),
true_top AS (
  SELECT term, n_total,
         row_number() OVER (ORDER BY n_total DESC, term) AS true_rank
  FROM global_counts
)
SELECT t.true_rank, t.term, t.n_total,
       COALESCE(c.n_shards_voting, 0) AS n_shards_voting,
       CASE WHEN c.term IS NOT NULL THEN 1 ELSE 0 END AS recovered
FROM true_top t LEFT JOIN cand c ON c.term = t.term
WHERE t.true_rank <= 20
""",
    tags=("audit", "distributed", "topk", "mergeable"),
)
def q356_sharded_topk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded top-K recoverability audit — the correctness question
    behind every scatter-gather leaderboard (and the reason
    coordinators fetch MORE than K per shard): 16 doc-hash shards
    each nominate their local top-10 terms, the coordinator unions
    the nominations and re-scores them with exact global counts, and
    the audit reports which of the TRUE global top-20 were
    recoverable from the nominations (a term missed by every shard's
    local top-10 can never reach the coordinator — the classic
    distributed top-K completeness failure) plus how many shards
    nominated each.

    Scale shape: per-shard censuses map-side combine; the per-shard
    top-10 is a shard-partitioned window (never global over terms);
    only the nominated-candidate relation (≤ 160 rows) and the
    20-row truth reach the final join. The global true-rank window
    runs over the term census, which is vocabulary-sized, not
    corpus-sized."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    words = d.select(
        (F.col("doc_id") % 16).alias("shard"),
        F.explode(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
        .alias("term"),
    )
    shard_counts = words.groupBy("shard", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql.window import Window as _W

    local_top = shard_counts.withColumn(
        "rn",
        F.row_number().over(_W.partitionBy("shard").orderBy(F.col("n").desc(), "term")),
    ).filter(F.col("rn") <= 10)
    cand = local_top.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_shards_voting")
    )
    global_counts = shard_counts.groupBy("term").agg(
        F.sum("n").cast("long").alias("n_total")
    )
    true_top = global_counts.withColumn(
        "true_rank",
        F.row_number().over(_W.orderBy(F.col("n_total").desc(), "term")),
    ).filter(F.col("true_rank") <= 20)
    return (
        true_top.join(F.broadcast(cand), "term", "left")
        .select(
            "true_rank",
            "term",
            "n_total",
            F.coalesce("n_shards_voting", F.lit(0).cast("long"))
            .alias("n_shards_voting"),
            F.when(F.col("n_shards_voting").isNotNull(), 1).otherwise(0)
            .alias("recovered"),
        )
    )


@register(
    "q357_observe_metrics",
    # The oracle recomputes the three observed in-flight metrics and
    # the downstream result census directly.
    oracle="""
WITH src AS (
  SELECT * FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07
),
agg AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents,
         CAST(MAX(l_orderkey) AS BIGINT) AS max_order
  FROM src
),
grp AS (
  SELECT COUNT(*) AS n_groups FROM (
    SELECT l_returnflag, l_linestatus FROM src GROUP BY 1, 2
  )
)
SELECT 'observed_rows' AS metric, CAST(n_rows AS BIGINT) AS value FROM agg
UNION ALL
SELECT 'observed_price_cents', price_cents FROM agg
UNION ALL
SELECT 'observed_max_order', max_order FROM agg
UNION ALL
SELECT 'result_groups', CAST(n_groups AS BIGINT) FROM grp
""",
    tags=("audit", "observe", "metrics", "api"),
)
def q357_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.observe()` / `Observation` — Spark's in-flight
    metrics API (the monitoring surface production pipelines hang
    data-quality counters on): named aggregate expressions piggyback
    on the SAME pass that computes the real result, with no second
    scan. Here the filtered lineitem slice is observed for row count,
    exact cent revenue, and distinct orders while a group census
    consumes it; the observed values and the census are emitted
    together and must equal the oracle's direct recomputation —
    proving the metrics see exactly the rows the query processed.
    The observation handle delivers driver-side scalars (that is its
    contract); only 4 metric rows are materialized."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").between(0.05, 0.07)
    )
    obs = Observation("q357")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("observed_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .alias("observed_price_cents"),
        F.max("l_orderkey").alias("observed_max_order"),
    )
    n_groups = (
        observed.groupBy("l_returnflag", "l_linestatus").count().count()
    )
    m = obs.get
    return spark.createDataFrame(
        [
            ("observed_rows", int(m["observed_rows"])),
            ("observed_price_cents", int(m["observed_price_cents"])),
            ("observed_max_order", int(m["observed_max_order"])),
            ("result_groups", int(n_groups)),
        ],
        "metric string, value long",
    )


@register(
    "q384_batch_checksum_sink",
    # The oracle re-derives the sink's exact manifest: same
    # '|'-joined row rendering, same md5-prefix 48-bit hash, same
    # commutative XOR fold — so the graded row proves the executor
    # write() partials and the driver commit() fold end to end.
    oracle=f"""
WITH r AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '|' ||
         CAST(l_linenumber AS VARCHAR) || '|' ||
         l_returnflag || '|' ||
         CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
           AS rendered
  FROM lineitem WHERE l_orderkey % 7 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       CAST(bit_xor({_hash48('rendered')}) AS BIGINT) AS checksum48,
       CAST(4 AS BIGINT) AS n_tasks
FROM r
""",
    tags=("audit", "checksum", "datasource", "batch_writer"),
)
def q384_batch_checksum_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH Python DataSource WRITER (`df.write.format(...)` through
    a pure-Python `DataSourceWriter`) — the graded half the custom-
    source matrix still owed: q338 grades the STREAMING writer's
    per-batch commit, this grades the batch commit protocol, where
    every executor task ships a (row_count, xor-checksum48) commit
    message and the driver's commit() folds them into one atomic
    manifest. The graded row is read FROM THE MANIFEST, not from the
    DataFrame — a dropped task message, a double-counted partition or
    a non-commutative fold all change it — and the oracle recomputes
    the identical md5-prefix XOR fold in SQL (q119's portable-hash
    construction). repartition(4) pins the task count so n_tasks is
    part of the contract. Only integer/string columns ride the
    manifest: their Python str() rendering equals SQL CAST AS STRING,
    which is what makes the cross-engine hash meaningful."""
    import hashlib as _hl
    import json as _json
    import os as _os
    import tempfile

    from cli_spark.sources.checksum_sink import register_checksum_sink

    register_checksum_sink(spark)
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    tag = _hl.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}|cksink".encode()
    ).hexdigest()[:12]
    out = _os.path.join(tempfile.gettempdir(), f"cli_spark_cksink_{tag}")
    rows.repartition(4).write.format("checksum").option("path", out).mode(
        "append"
    ).save()
    m = _json.load(open(_os.path.join(out, "manifest.json")))
    return spark.createDataFrame(
        [(m["row_count"], m["checksum48"], m["n_tasks"])],
        "row_count long, checksum48 long, n_tasks long",
    )


@register(
    "q405_erasure_cascade",
    oracle="""
WITH erase AS (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 97 = 0
),
eo AS (
  SELECT o.o_orderkey, e.c_nationkey
  FROM orders o JOIN erase e ON o.o_custkey = e.c_custkey
),
el AS (
  SELECT l.l_orderkey, o.c_nationkey
  FROM lineitem l JOIN eo o ON l.l_orderkey = o.o_orderkey
),
orphans AS (
  SELECT COUNT(*) AS n
  FROM orders o
  WHERE o.o_custkey IN (SELECT c_custkey FROM erase)
    AND o.o_orderkey NOT IN (SELECT o_orderkey FROM eo)
)
SELECT n.n_name,
       CAST(COUNT(DISTINCT e.c_custkey) AS BIGINT) AS n_customers_erased,
       CAST((SELECT COUNT(*) FROM eo x
             WHERE x.c_nationkey = n.n_nationkey) AS BIGINT)
         AS n_orders_erased,
       CAST((SELECT COUNT(*) FROM el x
             WHERE x.c_nationkey = n.n_nationkey) AS BIGINT)
         AS n_lineitems_erased,
       CAST((SELECT n FROM orphans) AS BIGINT) AS n_orphans
FROM erase e JOIN nation n ON e.c_nationkey = n.n_nationkey
GROUP BY n.n_name, n.n_nationkey
""",
    tags=("governance", "erasure", "cascade", "broadcast"),
)
def q405_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE CASCADE audit (GDPR Art. 17 / CCPA delete):
    given a deletion list of data subjects (here every 97th customer
    key — in production, the DSR queue), walk the foreign-key graph
    customer -> orders -> lineitem and census exactly what each
    erasure batch removes, per nation — the numbers a deletion run
    must report BEFORE it mutates anything, and the shape every
    compliance pipeline runs weekly. Plan economics at 100 TB: the
    erasure list is tiny relative to facts, so both cascade hops are
    BROADCAST semi-shaped joins — the fact tables are never
    shuffled, each is scanned once and probed against the broadcast
    list (contrast a naive DELETE ... WHERE IN that re-plans per
    table). n_orphans is a built-in conservation check (an order
    surviving with an erased customer key = referential leak; always
    0 by construction here, and graded so a cascade-logic regression
    flips it). Complements q342 (pseudonymization — the KEEP-data
    path) with the DELETE-data path."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    erase = cust.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey", "c_nationkey"
    )
    eo = orders.join(
        F.broadcast(erase), orders.o_custkey == erase.c_custkey
    ).select("o_orderkey", "c_nationkey")
    el = li.join(
        F.broadcast(eo.select("o_orderkey", "c_nationkey")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "c_nationkey")
    per_nation_cust = erase.groupBy("c_nationkey").agg(
        F.count_distinct("c_custkey").alias("n_customers_erased")
    )
    per_nation_orders = eo.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders_erased")
    )
    per_nation_li = el.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_lineitems_erased")
    )
    # conservation: an order belonging to an erased customer that the
    # cascade MISSED (present in orders-semi-erase, absent from eo)
    missed = (
        orders.join(F.broadcast(erase),
                    orders.o_custkey == erase.c_custkey, "leftsemi")
        .join(eo.select("o_orderkey"), "o_orderkey", "leftanti")
        .count()
    )
    n_orphans = F.lit(int(missed)).cast("long")
    return (
        per_nation_cust.join(per_nation_orders, "c_nationkey", "left")
        .join(per_nation_li, "c_nationkey", "left")
        .join(F.broadcast(nation),
              F.col("c_nationkey") == nation.n_nationkey)
        .select(
            "n_name",
            "n_customers_erased",
            F.coalesce("n_orders_erased", F.lit(0)).alias("n_orders_erased"),
            F.coalesce("n_lineitems_erased", F.lit(0))
            .alias("n_lineitems_erased"),
            n_orphans.alias("n_orphans"),
        )
    )
