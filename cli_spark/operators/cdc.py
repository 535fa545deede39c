"""Change-data-capture operators: snapshot diff between two versions
of a keyed table.

The nightly question at 100 TB is "what changed?" — answered without
row-by-row application logic by a key-partitioned full outer join of
the two snapshots comparing a single content hash per row:

* rows only in the new snapshot → inserts;
* rows only in the old → deletes;
* both sides present, hashes differ → updates;
* hashes equal → unchanged (never shipped downstream).

The content hash is md5 over a canonical '|'-joined rendering, so the
comparison shuffles 32-byte digests + keys, not payloads, and the
same diff computed by any engine agrees. Here the two "snapshots" are
deterministic slices of orders with an injected modification, so the
diff counts are fixed and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# old = orderkey % 10 < 9; new = orderkey % 10 > 0, with o_orderstatus
# rewritten for orderkey % 7 == 0 — so the diff has all three classes.
_HASH = (
    "md5(CAST(o_custkey AS {s}) || '|' || o_orderstatus || '|' || "
    "CAST(CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT) AS {s}))"
)


@register(
    "q147_snapshot_diff",
    oracle=f"""
WITH old AS (
  SELECT o_orderkey, {_HASH.format(s='VARCHAR')} AS h
  FROM orders WHERE o_orderkey % 10 < 9
),
new AS (
  SELECT o_orderkey,
         {_HASH.format(s='VARCHAR').replace("o_orderstatus",
             "CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END")} AS h
  FROM orders WHERE o_orderkey % 10 > 0
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.h <> n.h THEN 'update'
            ELSE 'unchanged' END AS change_type,
       COUNT(*) AS n_rows
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
GROUP BY 1
""",
    tags=("cdc", "diff", "full-outer"),
)
def q147_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff census (insert/delete/update/unchanged) between
    two deterministic versions of orders via a full outer join on the
    key comparing md5 content hashes. The join shuffles (key, 32-byte
    hash) pairs only; payload columns never leave the scan stage."""
    o = load_table(spark, sf_dir, "orders")
    h_old = F.expr(_HASH.format(s="STRING"))
    h_new = F.expr(
        _HASH.format(s="STRING").replace(
            "o_orderstatus",
            "CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END",
        )
    )
    old = o.filter(F.col("o_orderkey") % 10 < 9).select(
        F.col("o_orderkey").alias("k_old"), h_old.alias("h_old")
    )
    new = o.filter(F.col("o_orderkey") % 10 > 0).select(
        F.col("o_orderkey").alias("k_new"), h_new.alias("h_new")
    )
    change = (
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("k_new").isNull(), "delete")
        .when(F.col("h_old") != F.col("h_new"), "update")
        .otherwise("unchanged")
    )
    return (
        old.join(new, old["k_old"] == new["k_new"], "full_outer")
        .select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "q148_scd2_intervals",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC)
),
runs AS (
  SELECT *, CAST(SUM(chg) OVER (
    PARTITION BY user_id ORDER BY t_us ASC, event_id ASC ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS run_no
  FROM seq
)
SELECT user_id, run_no, min(event_type) AS event_type,
       strftime(make_timestamp(min(t_us)), '%Y-%m-%d %H:%M:%S') AS valid_from,
       COUNT(*) AS n_events
FROM runs GROUP BY user_id, run_no
""",
    tags=("cdc", "scd2", "window"),
)
def q148_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity intervals: collapse each user's event
    stream into maximal runs of one event_type (change-flag →
    running run number → per-run aggregate), the run-length encoding
    behind slowly-changing-dimension history tables. One shuffle on
    user_id carries both windows and the final per-run aggregation.
    Timestamps compare at microsecond truncation (matching the
    events ts rebuild) and cross the hash boundary as strings."""
    from pyspark.sql.window import Window

    from cli_spark.functions.determinism import ts_str

    e = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(t_us.asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id",
        "event_type",
        "event_id",
        t_us.alias("t_us"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("chg"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = seq.withColumn("run_no", F.sum("chg").over(w2).cast("long"))
    return runs.groupBy("user_id", "run_no").agg(
        F.min("event_type").alias("event_type"),
        ts_str(F.timestamp_micros(F.min("t_us"))).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
