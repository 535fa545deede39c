"""Per-micro-batch overhead breakdown for the TRUE-stream queries.

Attaches a StreamingQueryListener and runs each named query once,
printing total wall, number of batches, and the summed durationMs
components (addBatch = the foreachBatch job, latestOffset/getBatch =
replay source, walCommit/commitOffsets = offset/commit log fsyncs,
queryPlanning, triggerExecution) so optimization targets the real
per-batch cost, not a guess. Usage:

    python scripts/measure_stream_overhead.py q491_streaming_logbucket_quantiles [...]
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from cli_spark.plans.registry import all_queries
from cli_spark.session import get_spark


class _Capture(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(json.loads(p.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    cap = _Capture()
    spark.streams.addListener(cap)
    qs = all_queries()
    for name in names:
        for rep in range(2):  # warm + measured
            cap.progress.clear()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            wall = time.perf_counter() - t0
        batches = [p for p in cap.progress if p.get("numInputRows", 0) > 0
                   or p.get("batchId") is not None]
        sums = defaultdict(float)
        nb = 0
        rows = 0
        for p in batches:
            dm = p.get("durationMs") or {}
            if p.get("numInputRows", 0) > 0:
                nb += 1
            rows += p.get("numInputRows", 0)
            for k, v in dm.items():
                sums[k] += v
        print(f"\n=== {name}: wall {wall:.2f}s, {nb} non-empty batches "
              f"({len(batches)} progress events), {rows} rows")
        for k in sorted(sums, key=lambda k: -sums[k]):
            print(f"    {k:>22}: {sums[k]/1000.0:8.3f} s")
        stream_total = sums.get("triggerExecution", 0) / 1000.0
        print(f"    stream triggerExecution total: {stream_total:.2f}s; "
              f"non-stream remainder of wall: {wall - stream_total:.2f}s")


if __name__ == "__main__":
    main()
