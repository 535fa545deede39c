#!/usr/bin/env python
"""A/B: per-micro-batch offset/commit-log cost with the checkpoint on
ext4 /tmp vs tmpfs /dev/shm. Minimal foreachBatch stream over the
replay source (~20 batches, trivial partial), progress durations summed.
Usage: python scripts/exp_ckpt_placement.py
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from cli_spark.session import get_spark
from cli_spark.sources.replay_datasource import register_replay_source


class Collect(StreamingQueryListener):
    progress = []

    def onQueryStarted(self, e):
        pass

    def onQueryProgress(self, e):
        p = e.progress
        Collect.progress.append(dict(p.durationMs))

    def onQueryIdle(self, e):
        pass

    def onQueryTerminated(self, e):
        pass


def run_once(spark, part, ckpt_base, label):
    Collect.progress = []
    ck = tempfile.mkdtemp(prefix="expck_", dir=ckpt_base)
    try:
        stream = (
            spark.readStream.format("replay")
            .option("path", part)
            .option("batchRows", 5000)
            .load()
        )

        acc = []

        def sink(bdf, bid):
            acc.append(bdf.groupBy("event_type").count().collect())

        t0 = time.perf_counter()
        q = (stream.writeStream.option("checkpointLocation", ck)
             .foreachBatch(sink).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        wall = time.perf_counter() - t0
        keys = {}
        for p in Collect.progress:
            for k, v in p.items():
                keys[k] = keys.get(k, 0.0) + v
        print(json.dumps({"label": label, "wall_s": round(wall, 3),
                          "batches": len(Collect.progress),
                          "sum_ms": {k: round(v, 1) for k, v in
                                     sorted(keys.items(), key=lambda kv: -kv[1])}}),
              flush=True)
        return wall
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def main():
    spark = get_spark("exp_ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(Collect())
    # replay file: events table written once (on ext4; source prep is
    # identical in both arms)
    from cli_spark.tables import load_table
    import glob
    tmp = tempfile.mkdtemp(prefix="expck_replay_")
    try:
        e = load_table(spark, "/root/testdata/sf0.1", "events")
        (e.select("event_id", "event_type", "ts").repartition(1)
         .write.mode("overwrite").parquet(tmp))
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        register_replay_source(spark)
        # warm-up arm (discard), then alternate 2x each
        run_once(spark, part, "/tmp", "warmup")
        for i in range(2):
            run_once(spark, part, "/tmp", f"ext4_{i}")
            run_once(spark, part, "/dev/shm", f"tmpfs_{i}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
