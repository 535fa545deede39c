"""sf0.1 → sf1 (and optionally sf3) scale sweep for a named subset
of registry queries.

Usage: python scripts_scale_sweep.py [--sf3] [qname ...]
Times each query warm (min of 2) at sf0.1 and at the synthetic sf1
(cli_spark.bench_scale; cached under .bench_sf1) and prints one JSON
line per query with the sf1/sf0.1 ratio — linear scaling lands near
10 on local[32]; super-linear growth flags a plan that would not
survive the next 100×.

With --sf3 a 30×-replica tier (cached under .bench_sf3) is added and
the sf3/sf1 ratio reported — linear ≈ 3. This is the VERDICT r6 #4
check: the classes whose sf1 ratios sat nearest linear (q267 9.2,
q276 7.0, q290 7.4) must hold at the next tier.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Default = the standing scale watchlist (round 7): the two classes
# redesigned after super-linear sf3 readings, the candidate-growth
# riders, and the heaviest new text ops — re-check these first each
# round (run with --sf3 for the 30× tier).
DEFAULT = [
    "q267_minhash_estimator_audit",
    "q290_lsh_parameter_sweep",
    "q276_part_affinity",
    "q312_rouge1_pair_audit",
    "q311_winnowing_fingerprints",
    "q315_winnowing_match",
    # round 10: the two candidate-volume riders join the standing
    # watchlist (both ride true shared-token pair volume by design —
    # re-confirm the sub-linear profile each round)
    "q392_prefix_filter_join",
    "q440_containment_join",
]


def main() -> None:
    args = sys.argv[1:]
    with_sf3 = "--sf3" in args
    names = [a for a in args if not a.startswith("--")] or DEFAULT
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
    sf3 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_sf3")
    if with_sf3:
        ensure_scaled(spark, sf01, sf3, replicas=30)
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
        if with_sf3:
            t3 = timed(name, sf3)
            out[name]["sf3"] = t3
            out[name]["ratio_sf3_sf1"] = (
                round(t3 / t1, 2) if t1 > 0 else None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
