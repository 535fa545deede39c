"""Dup-heavy candidate instrumentation for q440 (VERDICT r10 #2,
kept in per-round rotation per VERDICT r11 #7).

Measures, on a dup-heavy corpus (default: `.bench_dupheavy`, 10 exact
copies of every sf0.1 doc — build it with scripts/full round-11 notes
in PLANS.md):
  1. naive one-sided candidate volume (containment_candidates over the
     full corpus — the r10 shipped form's candidate relation);
  2. collapsed candidate volume (same probe over family reps — the
     r11 shipped form);
  3. qualifying ordered-pair output count (the true answer size);
  4. warm runtime (min of 2) of the shipped q440 at the dup-heavy
     tier, plus the base tier for the re-baseline decision.

Usage:
  python scripts/dupheavy_q440.py [build|naive|collapsed|time]
         [--dup DIR] [--base DIR]

`build` materializes the dup-heavy tier itself (idempotent: a _READY
marker skips regeneration): documents = 10 EXACT text copies of every
base doc with doc_id shifted by 1e8 per replica (copies must stay
byte-identical — the tier exists to prove the exact-family collapse
absorbs copy inflation, unlike `.bench_sf1`, whose replicas are
deliberately perturbed into distinct texts); every other table is
copied verbatim so load_table works.
"""
import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cli_spark.operators.dedup import (
    containment_candidates, q440_containment_join, shingles_df)


def build_tier(spark, base: str, dup: str, copies: int = 10) -> None:
    """Materialize the dup-heavy tier (idempotent via _READY)."""
    marker = os.path.join(dup, "_READY")
    if os.path.exists(marker):
        print(f"dup tier ready: {dup}")
        return
    os.makedirs(dup, exist_ok=True)
    stride = 100_000_000
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        src = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        if t == "documents":
            out = src
            for i in range(1, copies):
                out = out.unionByName(
                    src.withColumn(
                        "doc_id",
                        (F.col("doc_id") + F.lit(i * stride)).cast("long")))
        else:
            out = src
        out.write.mode("overwrite").parquet(os.path.join(dup, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write(f"copies={copies} stride={stride} src={base}\n")
    print(f"built dup tier: {dup}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="collapsed",
                    choices=("build", "naive", "collapsed", "time"))
    ap.add_argument("--dup", default=os.path.join(_REPO, ".bench_dupheavy"),
                    help="dup-heavy corpus dir (parquet tables)")
    ap.add_argument("--base",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"),
                    help="base-tier corpus dir for the time comparison")
    args = ap.parse_args()
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "build":
        build_tier(spark, args.base, args.dup)
        spark.stop()
        return
    if args.mode == "naive":
        t0 = time.time()
        _, cand = containment_candidates(spark, args.dup)
        n = cand.count()
        print(f"naive candidates: {n} ({time.time()-t0:.1f}s)")
    elif args.mode == "collapsed":
        sh_all = (shingles_df(spark, args.dup, fanout=True)
                  .filter(F.size("shingles") > 0)
                  .select("doc_id", "shingles",
                          F.size("shingles").alias("n")))
        fam = sh_all.withColumn(
            "fkey", F.md5(F.concat_ws(chr(31), "shingles")))
        reps = (fam.join(fam.groupBy("fkey").agg(
                    F.min("doc_id").alias("rep")), "fkey")
                .filter(F.col("doc_id") == F.col("rep"))
                .select("doc_id", "shingles", "n"))
        t0 = time.time()
        _, cand = containment_candidates(spark, args.dup, sh=reps)
        n = cand.count()
        print(f"collapsed candidates: {n} ({time.time()-t0:.1f}s)")
        t0 = time.time()
        out = q440_containment_join(spark, args.dup).count()
        print(f"qualifying ordered pairs: {out} ({time.time()-t0:.1f}s)")
    elif args.mode == "time":
        for sf in (args.dup, args.base):
            times = []
            for _ in range(2):
                t0 = time.time()
                q440_containment_join(spark, sf).count()
                times.append(time.time() - t0)
            print(f"q440 warm @ {sf}: min={min(times):.2f}s runs={times}")
    spark.stop()


if __name__ == "__main__":
    main()
