#!/usr/bin/env python
"""A/B spot-timer for AQE size-based partition coalescing (round 16,
VERDICT r15 item 9 — the local[32] anti-scalers q181/q465/q151/q249).

Hypothesis: `spark.sql.adaptive.coalescePartitions.parallelismFirst`
(default true) coalesces post-shuffle partitions only down to the
session's default parallelism — 32 tiny partitions on local[32] for
relations a few MB wide — so small-relation stages pay 32 tasks of
scheduling for microseconds of work each, and an 8-core run beats the
32-core run. `false` coalesces by size toward
advisoryPartitionSizeInBytes instead (the documented recommendation).

Alternates arms per query (base, flipped, base, flipped) with the
bench method (warm-up + min over pairs) so epoch drift shows in the
base band.

    python scripts/exp_aqe_coalesce.py [advisory_bytes] q181_triangle_census ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli_spark.session import get_spark  # noqa: E402

KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def main() -> None:
    args = sys.argv[1:]
    advisory = None
    if args and args[0].isdigit():
        advisory = args[0]
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pairs = int(os.environ.get("AB_PAIRS", "3"))
    spark = get_spark("aqe-coalesce-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from cli_spark.plans.registry import all_queries

    qs = all_queries()
    adv_default = spark.conf.get(ADV, None)

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        return time.perf_counter() - t0

    for name in names:
        run_once(name)  # warm-up
        base, flip = [], []
        for _ in range(pairs):
            spark.conf.set(KEY, "true")
            if adv_default:
                spark.conf.set(ADV, adv_default)
            base.append(run_once(name))
            spark.conf.set(KEY, "false")
            if advisory:
                spark.conf.set(ADV, advisory)
            flip.append(run_once(name))
        spark.conf.set(KEY, "true")
        print(f"AB {name}: base min {min(base):.3f} (runs {['%.3f' % x for x in base]}) | "
              f"flipped min {min(flip):.3f} (runs {['%.3f' % x for x in flip]})",
              flush=True)


if __name__ == "__main__":
    main()
