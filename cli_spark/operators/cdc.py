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


# q280: deterministic change feed for the MERGE — class from an md5
# byte of the order key ('chg' salt): <48 DELETE, 48..127 UPDATE,
# >=224 INSERT (re-keyed +1e9 so inserts never collide with targets).
_CHG_BYTE = (
    "(instr('0123456789abcdef', substr(md5('chg' || CAST({k} AS {s})), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5('chg' || CAST({k} AS {s})), 2, 1)) - 1"
)


def _merge_hash48(s: str) -> str:
    key = (
        f"CAST(o_orderkey AS {s}) || '|' || o_orderstatus || '|' || "
        f"CAST(cents AS {s})"
    )
    digits = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({key}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"({digits})"


@register(
    "q280_merge_into",
    oracle=f"""
WITH target AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         {_CHG_BYTE.format(k="o_orderkey", s="VARCHAR")} AS b
  FROM orders
),
changes AS (
  SELECT o_orderkey, 'D' AS op, NULL AS new_status,
         CAST(NULL AS BIGINT) AS new_cents
  FROM target WHERE b < 48
  UNION ALL
  SELECT o_orderkey, 'U', 'U', cents + 500 FROM target WHERE b >= 48 AND b < 128
  UNION ALL
  SELECT o_orderkey + 1000000000, 'I', 'I', cents // 2 FROM target WHERE b >= 224
),
merged AS (
  SELECT COALESCE(c.o_orderkey, t.o_orderkey) AS o_orderkey,
         CASE WHEN c.op = 'U' THEN c.new_status
              WHEN c.op = 'I' THEN c.new_status
              ELSE t.o_orderstatus END AS o_orderstatus,
         CASE WHEN c.op = 'U' THEN c.new_cents
              WHEN c.op = 'I' THEN c.new_cents
              ELSE t.cents END AS cents,
         c.op
  FROM target t FULL OUTER JOIN changes c ON t.o_orderkey = c.o_orderkey
  WHERE c.op IS NULL OR c.op <> 'D'
)
SELECT (SELECT COUNT(*) FROM target) AS n_target,
       (SELECT COUNT(*) FROM changes WHERE op = 'D') AS n_deletes,
       (SELECT COUNT(*) FROM changes WHERE op = 'U') AS n_updates,
       (SELECT COUNT(*) FROM changes WHERE op = 'I') AS n_inserts,
       COUNT(*) AS n_final,
       CAST(bit_xor({_merge_hash48('VARCHAR')}) AS BIGINT) AS final_checksum
FROM merged
""",
    tags=("cdc", "merge", "lakehouse"),
)
def q280_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over plain parquet (the lakehouse upsert,
    no table format required): a deterministic change feed (delete /
    update / insert classes from an md5 byte of the key) is applied to
    the orders snapshot through ONE full outer join on the key —
    WHEN MATCHED AND op='D' THEN DELETE, WHEN MATCHED AND op='U' THEN
    UPDATE, WHEN NOT MATCHED THEN INSERT, ELSE keep. The result is
    proven by row-class censuses plus an order-independent 48-bit XOR
    content checksum over (key, status, cents) — the q119 portability
    construction — so a wrong merge on any single row flips the hash.

    Scale shape: the merge is exactly one shuffle (equi-join on the
    key); censuses ride the same pass. This is the batch complement
    of q160's streaming foreachBatch merge."""
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(_CHG_BYTE.format(k="o_orderkey", s="STRING")).alias("b"),
    )
    deletes = t.filter(F.col("b") < 48).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("long").alias("new_cents"),
    )
    updates = t.filter((F.col("b") >= 48) & (F.col("b") < 128)).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit("U").alias("new_status"),
        (F.col("cents") + 500).alias("new_cents"),
    )
    inserts = t.filter(F.col("b") >= 224).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("I").alias("new_status"),
        F.expr("cents div 2").alias("new_cents"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    target = t.select("o_orderkey", "o_orderstatus", "cents")
    merged = (
        target.alias("t")
        .join(changes.alias("c"), "o_orderkey", "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("c.op").isin("U", "I"), F.col("c.new_status"))
            .otherwise(F.col("t.o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(F.col("c.op").isin("U", "I"), F.col("c.new_cents"))
            .otherwise(F.col("t.cents"))
            .alias("cents"),
        )
    )
    counts = (
        changes.groupBy()
        .agg(
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_updates"),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_inserts"),
        )
    )
    n_target = target.groupBy().agg(F.count(F.lit(1)).alias("n_target"))
    final = merged.groupBy().agg(
        F.count(F.lit(1)).alias("n_final"),
        F.bit_xor(F.expr(_merge_hash48("STRING"))).cast("long").alias("final_checksum"),
    )
    return (
        n_target.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(final))
        .select("n_target", "n_deletes", "n_updates", "n_inserts",
                "n_final", "final_checksum")
    )
