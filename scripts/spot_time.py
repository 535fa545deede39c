#!/usr/bin/env python
"""Spot-time a list of registered queries with the bench methodology
(one untimed warm-up, then min of N timed runs, collect()), without
running the whole bench. Usage:

    python scripts/spot_time.py q311_winnowing_fingerprints q315_winnowing_match

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPOT_RUNS (default 3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPOT_RUNS", "3"))
    spark = get_spark("spot_time")
    qs = E.queries()
    E.entry(spark).collect()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, sf_dir).collect()
        best = None
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"SPOT {name} {best:.4f}", flush=True)


if __name__ == "__main__":
    main()
