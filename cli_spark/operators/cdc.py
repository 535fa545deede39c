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
