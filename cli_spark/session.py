"""SparkSession factory.

Centralizes every config the engine depends on so that tests, the
driver entry point, and bench.py all run identical sessions.

Scale notes (the design target is a 1000-executor cluster over ~100 TB,
even though tests run on local[N]):

* ``spark.sql.adaptive.enabled`` — AQE re-plans at shuffle boundaries
  (skew-join splitting, partition coalescing, runtime broadcast demotion).
* ``spark.sql.shuffle.partitions`` — sized for the local test harness;
  on a real cluster this is overridden (or left to AQE's coalescing
  with a high initial value).
* ``spark.sql.legacy.parquet.nanosAsLong`` — the driver's ``events``
  table stores TIMESTAMP(NANOS) which Spark 4 rejects by default
  (PARQUET_TYPE_ILLEGAL, reproduced in SURVEY.md §1.3); with this flag
  the column arrives as int64 nanos and tables.py rebuilds it.
* ``spark.sql.session.timeZone=UTC`` — the DuckDB correctness oracle
  runs in UTC; timestamp semantics must match exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def configure(builder: SparkSession.Builder, shuffle_partitions: int = 32) -> SparkSession.Builder:
    """Apply the engine's required configs to any builder.

    Used both by :func:`get_spark` and by the driver, which constructs
    its own session: ``__spark_entry__.entry`` re-applies the runtime
    (non-static) configs defensively.
    """
    return (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.ui.explainMode", "formatted")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )


def get_spark(app_name: str = "cli_spark", master: str | None = None,
              shuffle_partitions: int = 32) -> SparkSession:
    """Build (or fetch) the engine session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same code
    path serves pytest (small N) and bench (32 vCPUs). On a cluster the
    master comes from spark-submit and this argument is ignored.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{DEFAULT_CPUS}]"
    builder = builder.master(master)
    builder = configure(builder, shuffle_partitions=shuffle_partitions)
    return builder.getOrCreate()


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Re-apply runtime-settable confs on an externally built session.

    The driver owns its SparkSession; static confs (memory, master)
    cannot change post-start, but the semantics-critical ones below are
    runtime-settable and MUST hold for correctness:
    timezone (oracle parity) and nanos handling (events table reads).
    """
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        # Python DataSource pushFilters (hgt bbox partition pruning)
        ("spark.sql.python.filterPushdown.enabled", "true"),
        # the driver's own session defaults to 200 shuffle partitions —
        # far too many for sf0.01 work (observed: 200-task stages)
        ("spark.sql.shuffle.partitions", "32"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session factory already set it
    return spark


def stream_partitions() -> int:
    """Shuffle-partition count for stateful streaming micro-batches.

    A stateful operator creates one state-store instance per shuffle
    partition, and EVERY micro-batch pays per-partition fixed cost:
    a task, a state-store load + commit (delta file + CRC + rename
    under the HDFS-backed provider), and scheduler overhead. The right
    number tracks per-batch volume, not the box's core count: the
    replay fixtures deliver ~5k-row micro-batches, where 32 partitions
    is ~40× more per-batch fixed cost than data (round-15 measurement:
    q453 spent most of its ~1 s/batch on fixed per-partition work).
    Production streams size this to state volume / throughput via
    SPARK_GRAFT_STREAM_PARTITIONS (e.g. hundreds on a cluster); the
    local default 8 keeps the driver's bench method unchanged while
    matching the fixture's batch grain. Results are partitioning-
    invariant — state is keyed, the watermark is global."""
    return int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))


class scoped_shuffle_partitions:
    """Set spark.sql.shuffle.partitions for a streaming run and restore
    it on exit (the stateful operator pins its state partition count at
    checkpoint creation, so the conf only needs to hold across
    .start()..stop())."""

    def __init__(self, spark: SparkSession, n: int) -> None:
        self.spark, self.n = spark, n

    def __enter__(self) -> None:
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


# Direct-write checkpoint file manager for the bounded replay streams
# (round-16 optimization, guide §1.4/§6 commit-protocol cost): the
# default rename-based manager pays create-temp + rename (+ checksum
# companion) for EVERY offset-log, commit-log and state-delta file —
# at ~20-40 micro-batches per replay run that protocol is ~20% of the
# whole query (measured: q476 10.7 -> 8.2 s warm with the direct
# manager; walCommit+commitOffsets 1.9 s/run in
# StreamingQueryProgress). Rename-atomicity buys crash-recoverability
# of a checkpoint these queries create fresh in a tempdir and discard
# on return, so the durable-run trade does not apply; a production
# deployment keeps whatever manager its checkpoint STORE needs
# (rename-based on HDFS, store-specific managers on object stores
# without atomic rename) via SPARK_GRAFT_CKPT_MANAGER.
_CKPT_MANAGER_KEY = "spark.sql.streaming.checkpointFileManagerClass"
_DIRECT_CKPT_MANAGER = (
    "org.apache.spark.sql.execution.streaming.checkpointing."
    "FileSystemBasedCheckpointFileManager"
)


def replay_ckpt_manager() -> str:
    return os.environ.get("SPARK_GRAFT_CKPT_MANAGER", _DIRECT_CKPT_MANAGER)


class scoped_replay_ckpt_manager:
    """Apply the replay-stream checkpoint file manager for the
    duration of one stream run and restore the session default on
    exit (the manager class is read at query start)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def __enter__(self) -> None:
        self.old = self.spark.conf.get(_CKPT_MANAGER_KEY, None)
        self.spark.conf.set(_CKPT_MANAGER_KEY, replay_ckpt_manager())

    def __exit__(self, *exc) -> None:
        if self.old is None:
            self.spark.conf.unset(_CKPT_MANAGER_KEY)
        else:
            self.spark.conf.set(_CKPT_MANAGER_KEY, self.old)


def materialize_local(df):
    """Collect a SMALL (few-row) result and rebuild it as a local
    DataFrame with the identical schema. Used by queries that persist
    heavy intermediates: the collect drives the full computation with
    AQE intact (a `localCheckpoint(eager=True)` materialization would
    run the plan through the non-adaptive RDD path — measured 3× on
    q290's fused sweep), after which the caller can unpersist its
    caches before returning (the ADVICE r10 persist-leak rule)."""
    rows = df.collect()
    return df.sparkSession.createDataFrame(rows, df.schema)
