#!/usr/bin/env python
"""Benchmark harness — the driver's per-round BENCH_r{N}.json source.

Runs the headline query classes (matching BASELINE.md's measured rows)
at $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total warm sec>, "unit": "sec",
     "queries": {name: warm_sec, ...}, "sf": <sf>}

Method mirrors BASELINE.md: per query, one untimed warm-up run
(JIT/broadcast warm), then the minimum of two timed runs, collect()
to the driver. Session startup is excluded (fixed overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries — one per BASELINE.md row class. The summed metric
# stays defined over these 7 (comparable across rounds and against
# BASELINE.md's original measurement).
BENCH_QUERIES = [
    "q01_pricing_summary",      # TPC-H-Q1-style agg
    "q10_join_topk_revenue",    # Q3-style join + top-K
    "q17_star_join_q5",         # Q5-style 6-table star join
    "q30_topk_per_group",       # per-group top-3 window
    "q100_tumbling_window",     # events 1h tumbling agg
    "q70_exact_dup_stats",      # exact-dup count (md5)
    "q80_knn_bruteforce",       # brute-force cosine kNN top-10
]

# Reported-but-not-summed classes (round 2+): timed identically and
# emitted in "queries" so BASELINE.md's extended rows can be compared
# per class, without redefining the 7-class headline sum.
EXTRA_QUERIES = [
    "q73_minhash_lsh",          # MinHash+LSH near-dup (band join)
    "q91_tfidf_top_terms",      # TF-IDF per-doc top terms
    "q151_decontamination",     # 5-gram train/test overlap
    "q157_embedding_outliers",  # centroid distance outlier cut
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from cli_spark.plans.registry import all_queries
    from cli_spark.session import get_spark

    spark = get_spark(app_name="cli_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def timed(name: str) -> float:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm-up (untimed)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    times = {name: timed(name) for name in BENCH_QUERIES}
    headline_total = round(sum(times.values()), 4)
    times.update({name: timed(name) for name in EXTRA_QUERIES})

    out = {
        "metric": "headline query warm latency (sum over 7 query classes)",
        "value": headline_total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
