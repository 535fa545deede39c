"""Round-11 dup-heavy instrumentation for q440 (VERDICT r10 #2).

Measures, on `.bench_dupheavy` (10 exact copies of every sf0.1 doc):
  1. naive one-sided candidate volume (containment_candidates over the
     full corpus — the r10 shipped form's candidate relation);
  2. collapsed candidate volume (same probe over family reps — the
     r11 shipped form);
  3. qualifying ordered-pair output count (the true answer size);
  4. warm runtime (min of 2) of the shipped q440 at the dup-heavy
     tier, plus sf0.1 for the re-baseline decision.

Usage: python scripts_dupheavy_q440.py [naive|collapsed|time]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cli_spark.operators.dedup import (
    containment_candidates, q440_containment_join, shingles_df)

DUP = "/root/repo/.bench_dupheavy"


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "collapsed"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "naive":
        t0 = time.time()
        _, cand = containment_candidates(spark, DUP)
        n = cand.count()
        print(f"naive candidates: {n} ({time.time()-t0:.1f}s)")
    elif mode == "collapsed":
        sh_all = (shingles_df(spark, DUP, fanout=True)
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
        _, cand = containment_candidates(spark, DUP, sh=reps)
        n = cand.count()
        print(f"collapsed candidates: {n} ({time.time()-t0:.1f}s)")
        t0 = time.time()
        out = q440_containment_join(spark, DUP).count()
        print(f"qualifying ordered pairs: {out} ({time.time()-t0:.1f}s)")
    elif mode == "time":
        for sf in (DUP, "/root/testdata/sf0.1"):
            times = []
            for _ in range(2):
                t0 = time.time()
                q440_containment_join(spark, sf).count()
                times.append(time.time() - t0)
            print(f"q440 warm @ {sf}: min={min(times):.2f}s runs={times}")
    spark.stop()


if __name__ == "__main__":
    main()
