#!/usr/bin/env python
"""Round-16 plan evidence for queries whose RETURNED DataFrame is a
LocalTableScan (q460 ends in materialize_local, q385 in a local
3-row relation), so capture_plans.py can't show the structural
change. This script rebuilds the INTERNAL relations exactly as the
query code does — importing the tree it runs from — and explains
them:

  q460_level16: one lift level's `new` relation (pre-checkpoint) —
      the round-16 claim is 5 exchanges/level -> 2 (self-join +
      groupBy + join-back -> doc-RANGE window + group window).
  q385_sig: the stage-2 signature relation — the round-16 claim is
      the shingle projection moving BELOW the doc fanout exchange
      (it ran on the single-file scan's one task).

Usage:  PYTHONPATH=<tree> python scripts/capture_internal_plans_r16.py OUTDIR SUFFIX
Run once from the pinned before-worktree and once from the final
tree; the relation construction follows whichever tree is imported.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from cli_spark.session import get_spark  # noqa: E402
from cli_spark.tables import load_table  # noqa: E402


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def q460_level16(spark, sf_dir):
    """One lift level (8 -> 16), built the way the CURRENT tree's
    q460 builds it — detected by source inspection so the same script
    serves both trees."""
    import inspect

    from cli_spark.operators import round13

    src = inspect.getsource(round13.q460_repeated_kmer_census)
    d = load_table(spark, sf_dir, "documents")
    if "rangeBetween" in src:  # round-16 window form (with doc fanout)
        d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    pos = d.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("p"),
    ).select(
        "doc_id", "p",
        (F.col("doc_id") * 1024 + F.col("p")).alias("gid"),
        F.expr("substr(text, p, 8)").alias("s8"),
    )
    full8 = pos.filter(F.length("s8") == 8)
    if "rangeBetween" in src:
        wg8 = Window.partitionBy("s8")
        cur = (full8.select(
                "doc_id", "p", "gid",
                F.min("gid").over(wg8).alias("key"),
                F.count(F.lit(1)).over(wg8).alias("c"))
               .filter(F.col("c") >= 2)
               .select("doc_id", "p", "gid", "key", "c"))
        wd = Window.partitionBy("doc_id").orderBy("p").rangeBetween(8, 8)
        pairs = (cur.select("doc_id", "p", "gid", F.col("key").alias("k1"),
                            F.max("key").over(wd).alias("k2"))
                 .filter(F.col("k2").isNotNull()))
        wp = Window.partitionBy("k1", "k2")
        new = (pairs.select("doc_id", "p", "gid",
                            F.min("gid").over(wp).alias("key"),
                            F.count(F.lit(1)).over(wp).alias("c"))
               .filter(F.col("c") >= 2)
               .select("doc_id", "p", "gid", "key", "c"))
    else:  # round-15 join form
        k8 = full8.groupBy("s8").agg(
            F.min("gid").alias("key"), F.count(F.lit(1)).alias("c"))
        cur = (full8.join(k8.filter(F.col("c") >= 2), "s8")
               .select("doc_id", "p", "gid", "key", "c"))
        a = cur.select("doc_id", "p", "gid", F.col("key").alias("k1"))
        b = cur.select("doc_id", (F.col("p") - 8).alias("p"),
                       F.col("key").alias("k2"))
        pairs = a.join(b, ["doc_id", "p"])
        nk = pairs.groupBy("k1", "k2").agg(
            F.min("gid").alias("key"), F.count(F.lit(1)).alias("c"))
        new = (pairs.join(nk.filter(F.col("c") >= 2), ["k1", "k2"])
               .select("doc_id", "p", "gid", "key", "c"))
    # NOTE: in the real query `cur` is localCheckpoint'ed first; here
    # both levels stay lazy so the full lift lineage is visible.
    return new


def q385_sig(spark, sf_dir):
    import inspect

    from cli_spark.operators import pipeline
    from cli_spark.operators.dedup import shingles_df

    src = inspect.getsource(pipeline.q385_dedup_cascade_audit)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("key").orderBy("doc_id")
    keep1 = (docs.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("key"))
             .withColumn("r", F.row_number().over(w))
             .filter("r = 1").select("doc_id"))
    if "fanout=True" in src:
        sh = (shingles_df(spark, sf_dir, fanout=True)
              .join(keep1, "doc_id").select("doc_id", "shingles"))
    else:
        sh = (shingles_df(spark, sf_dir).join(keep1, "doc_id")
              .select("doc_id", "shingles")
              .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    hashed = sh.select(
        "doc_id", "shingles",
        F.transform(
            F.transform(F.col("shingles"), lambda s: F.md5(F.encode(s, "utf-8"))),
            lambda m: F.struct(
                F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("g1"),
                F.conv(F.substring(m, 17, 15), 16, 10).cast("long").alias("g2"),
            ),
        ).alias("hs"),
    )

    def _band(i):
        return lambda x: x["g1"] + F.lit(i) * x["g2"]

    return hashed.select(
        "doc_id", "shingles",
        *[F.array_min(F.transform(F.col("hs"), _band(i))).alias(f"h{i}")
          for i in range(4)],
    )


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-internal-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, builder in [("q460_level16", q460_level16), ("q385_sig", q385_sig)]:
        df = builder(spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print("captured", name, flush=True)


if __name__ == "__main__":
    main()
