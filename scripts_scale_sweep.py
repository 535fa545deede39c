"""sf0.1 → sf1 scale sweep for a named subset of registry queries.

Usage: python scripts_scale_sweep.py [qname ...]
Times each query warm (min of 2) at sf0.1 and at the synthetic sf1
(cli_spark.bench_scale; cached under .bench_sf1) and prints one JSON
line per query with the sf1/sf0.1 ratio — linear scaling lands near
10 on local[32]; super-linear growth flags a plan that would not
survive the next 100×.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "q237_autocorr_lags",
    "q238_weighted_systematic_sample",
    "q239_poisson_bootstrap",
    "q244_pareto_revenue_curve",
    "q245_interpurchase_quantiles",
    "q247_semdedup_prune",
    "q249_kcore_2core",
    "q251_codeswitch_segments",
    "q252_zonemap_skipping",
    "q254_weighted_median_price",
    "q257_source_overlap_matrix",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_sf1"),
    )

    from cli_spark.bench_scale import ensure_scaled
    from cli_spark.plans.registry import all_queries
    from cli_spark.session import get_spark

    spark = get_spark(app_name="cli_spark-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_scaled(spark, sf01, sf1)
    qs = all_queries()

    def timed(name: str, at: str) -> float:
        qs[name](spark, at).collect()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, at).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {}
    for name in names:
        t01 = timed(name, sf01)
        t1 = timed(name, sf1)
        out[name] = {"sf0.1": t01, "sf1": t1,
                     "ratio": round(t1 / t01, 2) if t01 > 0 else None}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
