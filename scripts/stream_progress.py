#!/usr/bin/env python
"""Per-batch StreamingQueryProgress breakdown for one registered
streaming query (run it once, dump durationMs aggregates). Usage:

    python scripts/stream_progress.py q453_dropdup_within_watermark
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from cli_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402


class Collect(StreamingQueryListener):
    progress: list = []

    def onQueryStarted(self, e):
        pass

    def onQueryProgress(self, e):
        p = e.progress
        Collect.progress.append(
            {"batchId": p.batchId, "numInputRows": p.numInputRows,
             "durationMs": dict(p.durationMs)})

    def onQueryIdle(self, e):
        pass

    def onQueryTerminated(self, e):
        pass


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream_progress")
    spark.streams.addListener(Collect())
    fn = E.queries()[name]
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    time.sleep(1.0)  # let the listener drain
    keys: dict[str, float] = {}
    n = 0
    for p in Collect.progress:
        if p["numInputRows"] == 0 and p["batchId"] == 0:
            continue
        n += 1
        for k, v in p["durationMs"].items():
            keys[k] = keys.get(k, 0.0) + v
    print(json.dumps({"query": name, "wall_s": round(wall, 3),
                      "batches_seen": n,
                      "sum_ms": {k: round(v, 1) for k, v in
                                 sorted(keys.items(), key=lambda kv: -kv[1])}}))


if __name__ == "__main__":
    main()
