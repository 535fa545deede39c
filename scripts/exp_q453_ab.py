#!/usr/bin/env python
"""Alternated A/B of q453 under state-store / commit-protocol confs
(round 16, VERDICT r15 item 2). Arms:

  base     — tree as-is (HDFSBackedStateStoreProvider)
  rocksdb  — RocksDBStateStoreProvider + changelog checkpointing
  rocksdb_nochangelog — RocksDBStateStoreProvider, default snapshots

Runs are alternated (base, arm, base, arm, ...) so box-epoch drift
shows up as movement in the base band, not a false arm delta.

    python scripts/exp_q453_ab.py rocksdb [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli_spark.session import get_spark  # noqa: E402

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

ARMS = {
    "rocksdb": {PROVIDER_KEY: ROCKSDB, CHANGELOG_KEY: "true"},
    "rocksdb_nochangelog": {PROVIDER_KEY: ROCKSDB, CHANGELOG_KEY: "false"},
}


def main() -> None:
    arm_name = sys.argv[1] if len(sys.argv) > 1 else "rocksdb"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    arm = ARMS[arm_name]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("q453-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from cli_spark.plans.registry import all_queries

    fn = all_queries()["q453_dropdup_within_watermark"]
    base_default = spark.conf.get(PROVIDER_KEY, None)

    def run(tag: str, confs: dict) -> float:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # restore
        if PROVIDER_KEY in confs:
            if base_default:
                spark.conf.set(PROVIDER_KEY, base_default)
            else:
                spark.conf.unset(PROVIDER_KEY)
        if CHANGELOG_KEY in confs:
            spark.conf.unset(CHANGELOG_KEY)
        print(f"{tag}: {dt:.2f}s  rows={len(rows)}", flush=True)
        return dt

    run("warmup(base)", {})
    for i in range(n_pairs):
        run(f"base[{i}]", {})
        run(f"{arm_name}[{i}]", arm)


if __name__ == "__main__":
    main()
