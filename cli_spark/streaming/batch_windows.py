"""Event-time window operators over `events` — tumbling, sliding and
session windows, plus a *true* Structured Streaming run of the
tumbling aggregation wired into the graded surface.

The same `F.window` / `F.session_window` expressions serve batch and
streaming (SURVEY.md §2 note: the driver calls queries as batch, so
each streaming op also exists in batch form; q103 additionally runs
the real `readStream` micro-batch path and returns its memory-sink
result). True-streaming semantics (watermarks, late-data drops,
stateful processing) are covered by tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.functions.determinism import (
    MONEY_SCALE,
    dsum,
    quantize,
    sql_dsum,
    ts_str,
)
from cli_spark.plans.registry import register
from cli_spark.tables import events_stream, load_table


def _drain_memory_sink(spark: SparkSession, agg: DataFrame, prefix: str) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a
    memory sink, materialize the result, and DROP the sink's temp view
    so repeated invocations in one session don't accumulate
    fully-materialized tables in driver memory.

    CONTRACT: callers must pass an AGGREGATED stream (windowed/keyed
    rollup) whose output cardinality is bounded by group count — the
    memory sink materializes the full result on the driver, so a
    per-event (non-aggregated) stream through this helper would be a
    driver OOM at scale. Per-event streams use a file/foreachBatch
    sink instead (see training.py::q160's keyed-table merge).

    The contract is ENFORCED, not trusted: the analyzed plan must
    contain an Aggregate node (all current callers are windowed/keyed
    rollups) or the helper refuses to start the query."""
    analyzed = agg._jdf.queryExecution().analyzed().toString()
    if "Aggregate" not in analyzed:
        raise ValueError(
            "_drain_memory_sink requires an AGGREGATED stream (its "
            "memory sink materializes the full result on the driver); "
            "route per-event streams through a file or foreachBatch "
            "sink instead. Analyzed plan has no Aggregate node:\n"
            + analyzed
        )
    sink_name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    sink = spark.table(sink_name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(sink_name)
    return out


@register(
    "q100_tumbling_window",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "window", "headline"),
)
def q100_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows (batch form of the
    streaming aggregation — the same F.window expression works under
    readStream, see q103).

    The distinct-user count is computed as a TWO-LEVEL aggregation
    (groupBy (window, user_id) then groupBy window) instead of
    countDistinct: a single countDistinct mixed with plain aggregates
    makes Catalyst plan an Expand that duplicates every input row
    per aggregate family before the shuffle. The two-level form
    shuffles each (hour, user) combination once — map-side combine
    collapses a user's repeat events within an hour pre-shuffle — and
    the second aggregation runs on the already-tiny per-user relation.
    At 100 TB that halves shuffle volume on the widest stage.
    count("user_id") at level 2 counts non-null user groups, matching
    COUNT(DISTINCT user_id) null semantics exactly."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(quantize(F.col("value"))).alias("qs"),
        )
    )
    return (
        per_user.groupBy("window")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("user_id").alias("n_users"),
            (F.sum("qs").cast("double") / F.lit(float(10 ** MONEY_SCALE))).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "n_users",
            "value_sum",
        )
    )


@register(
    "q101_sliding_window",
    oracle=f"""
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - i.i * (INTERVAL '15 minutes') AS ws,
         user_id, value
  FROM events
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM expanded
GROUP BY ws
""",
    tags=("streaming", "window"),
)
def q101_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 15-minute slide — every event
    lands in exactly 4 windows. Spark expands via the window operator;
    the oracle mirrors with an explicit ×4 cross join on 15-minute
    buckets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "value_sum",
        )
    )


@register(
    "q102_session_windows",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) IS NULL
              OR epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                 > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
tagged AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered
)
SELECT user_id,
       strftime(make_timestamp(min(t_us)), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(max(t_us)) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM tagged
GROUP BY user_id, session_seq
""",
    tags=("streaming", "session"),
)
def q102_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (F.session_window). Session end = last event + gap, matching the
    classic lag-gap-cumsum sessionization SQL the oracle runs.
    Spark MERGES an event at exactly gap distance (sessions join when
    next_ts <= prev_ts + gap; verified empirically on Spark 4.1 and
    pinned by tests/test_parity.py::test_session_gap_exactly_30min_
    half_open), so the oracle compares microsecond-truncated gaps
    with STRICT > — only a gap strictly beyond 30:00 starts a new
    session. Same convention as q124."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            ts_str(F.col("session_window.start")).alias("session_start"),
            ts_str(F.col("session_window.end")).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


@register(
    "q103_streaming_tumbling_true",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream"),
)
def q103_streaming_tumbling_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming: readStream over the events parquet,
    watermarked tumbling aggregation, availableNow trigger into a
    memory sink (complete mode), result returned as the sink table.

    The watermark is wider than the data's time span, so no row is
    late — the streaming result must exactly equal the batch oracle.
    Late-data-dropping behaviour is exercised in tests/test_streaming.py.
    """
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "365 days")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    return _drain_memory_sink(spark, agg, "stream_result")


@register(
    "q124_streaming_session_true",
    oracle=f"""
WITH seq AS (
  SELECT user_id, value, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
               OR epoch_us(CAST(ts AS TIMESTAMP))
                  - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC)
),
mark AS (
  SELECT *, SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY t_us ASC, event_id ASC ROWS UNBOUNDED PRECEDING
  ) AS sess_no
  FROM seq
)
SELECT user_id,
       strftime(make_timestamp(min(t_us)), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM mark GROUP BY user_id, sess_no
""",
    tags=("streaming", "true_stream", "session"),
)
def q124_streaming_session_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming session windows: readStream over the events
    parquet, per-user 30-minute-gap session aggregation, availableNow
    into a memory sink (complete mode). The oracle is the classic
    batch sessionization (lag-gap → running session number) on
    MICROSECOND-truncated timestamps with a STRICT > gap test,
    matching Spark's session merge rule (an event at exactly gap
    distance continues the session; see q102).

    Streaming session state merges out-of-order events per key — at
    scale the shuffle is on user_id and state size is bounded by
    open sessions per key, with the watermark reaping closed ones."""
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "365 days")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            ts_str(F.col("session_window.start")).alias("session_start"),
            "n_events",
            "value_sum",
        )
    )
    return _drain_memory_sink(spark, agg, "stream_sess")


@register(
    "q179_streaming_dedup_true",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
    tags=("streaming", "true_stream", "dedup"),
)
def q179_streaming_dedup_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming deduplication: readStream over the events
    parquet, dropDuplicates on (user_id, event_type) — the stateful
    streaming dedup operator, whose state store holds one entry per
    distinct key pair — then a per-type census in complete mode. The
    result must equal batch COUNT(DISTINCT user_id) exactly.

    At scale the dedup state shuffles on the dedup key and is bounded
    by distinct-key cardinality, not stream volume; production streams
    bound it further with dropDuplicatesWithinWatermark (covered in
    tests/test_streaming.py, where late/expired behaviour is
    assertable)."""
    stream = events_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return _drain_memory_sink(spark, agg, "stream_dedup")


@register(
    "q214_streaming_enrichment_true",
    oracle=f"""
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS value_sum
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("streaming", "stream-static", "join"),
)
def q214_streaming_enrichment_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming stream-static enrichment: readStream
    over the events parquet, equi-joined against the STATIC customer
    dimension (the canonical "enrich the stream with the dim table"
    pattern — Spark re-plans the static side per micro-batch, so dim
    updates between batches are picked up), then a per-segment
    aggregation drained through the availableNow memory sink.

    The static side is broadcast (dim-sized); the streaming state is
    one row per market segment. This is the graded complement of
    tests/test_streaming.py's stream-static semantics test — the
    batch oracle must match exactly because every event joins (the
    generator draws user_id from the customer key range) and no
    watermark can drop rows from a complete-mode aggregation."""
    stream = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
    )
    return _drain_memory_sink(spark, agg, "stream_enrich")


@register(
    "q246_streaming_sliding_true",
    oracle=f"""
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - i.i * (INTERVAL '15 minutes') AS ws,
         value
  FROM events
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM expanded
GROUP BY ws
""",
    tags=("streaming", "true_stream", "window"),
)
def q246_streaming_sliding_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming run of the SLIDING window aggregation
    (1-hour windows every 15 minutes — q101's streaming sibling, the
    same F.window expression under readStream): watermarked, drained
    through the availableNow memory sink in complete mode. Every event
    belongs to exactly 4 windows; the streaming state is one row per
    open window, and the watermark (wider than the data span) never
    drops a row, so the result must equal the ×4-expansion batch
    oracle exactly."""
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "365 days")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "value_sum",
        )
    )
    return _drain_memory_sink(spark, agg, "stream_sliding")


@register(
    "q264_streaming_join_true",
    oracle=f"""
SELECT p.user_id,
       COUNT(*) AS n_pairs,
       {sql_dsum('e.value')} AS error_value_sum
FROM events p
JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL '30 minutes'
 AND e.ts <= p.ts
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
GROUP BY p.user_id
""",
    tags=("streaming", "true_stream", "stream-stream"),
)
def q264_streaming_join_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-STREAM interval join: two independent readStream
    instances over the events parquet (purchases, errors), inner-
    joined per user on an event-time interval (errors in the 30
    minutes before each purchase), drained through a foreachBatch
    parquet sink — the q160 pattern, because a raw join's output is
    per-pair (unbounded) and so must land in a distributed sink, not
    a driver-resident memory table. Both sides carry watermarks (the
    state-cleanup contract a production stream-stream join needs);
    under availableNow every match emits within the run, so the
    per-user pair census over the sink equals the batch interval-join
    oracle exactly."""
    import shutil
    import tempfile

    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "365 days")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    errors = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .withWatermark("ts", "365 days")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
    )
    joined = purchases.join(
        errors,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("e_ts") <= F.col("p_ts")),
    )
    out_root = tempfile.mkdtemp(prefix="q264_pairs_")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_root}/pairs")

    query = (
        joined.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    try:
        pairs = spark.read.parquet(f"{out_root}/pairs")
        result = (
            pairs.groupBy(F.col("p_user").alias("user_id"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                dsum(F.col("e_value")).alias("error_value_sum"),
            )
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q271_streaming_multibatch_true",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream", "multibatch"),
)
def q271_streaming_multibatch_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE MULTI-micro-batch streaming: the events table replayed
    through the custom `replay` Python DataSource in 500-row batches
    (the single-file testdata otherwise arrives in ONE batch and
    cross-batch state accumulation never executes — q103's documented
    limitation), aggregated under complete mode so per-window state
    must accumulate correctly ACROSS batches. The result is read
    after the source reports exhaustion; complete-mode aggregation is
    batch-slicing-invariant, so it must equal the batch oracle
    exactly whatever the batch boundaries."""
    import time
    import uuid as _uuid

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", 500)
        .load()
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    name = "replay_graded_" + _uuid.uuid4().hex[:8]
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, time.time()
        while idle < 3 and time.time() - t0 < 180:
            time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


def _run_restart_recovery(
    spark: SparkSession, sf_dir: str, fmt: str = "replay",
    extra_options: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Shared engine for q310/q352: run the replayed windowed
    aggregation with a checkpoint, STOP the query mid-stream, restart
    it from the same checkpoint, drain to exhaustion, and return
    (result, evidence). Evidence records where phase 1 stopped and
    the offset phase 2 resumed from, so tests can assert the restart
    really was a mid-stream recovery rather than a fresh start.
    ``fmt`` selects the source: "replay" (driver-side simple reader)
    or "replay_part" (q330's partitioned DataSourceStreamReader —
    recovery then re-plans executor-side partitions for the
    uncommitted range)."""
    import json
    import shutil
    import tempfile
    import time
    import uuid as _uuid

    from cli_spark.sources.replay_datasource import register_replay_source
    from cli_spark.sources.replay_partitioned import register_replay_partitioned

    import pyarrow.parquet as pq

    register_replay_source(spark)
    register_replay_partitioned(spark)
    ckpt = tempfile.mkdtemp(prefix="cli_spark_ckpt_")
    # ~10 micro-batches at ANY scale factor (parquet footer read is
    # driver-side metadata only), so the kill always lands mid-stream
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)

    def build() -> DataFrame:
        reader = (
            spark.readStream.format(fmt)
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
        )
        for k, v in (extra_options or {}).items():
            reader = reader.option(k, v)
        stream = reader.load()
        return (
            stream.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum(F.col("value")).alias("value_sum"),
            )
            .select(
                ts_str(F.col("window.start")).alias("window_start"),
                "event_type",
                "n_events",
                "value_sum",
            )
        )

    evidence: dict = {}
    try:
        # ---- phase 1: run a few micro-batches, then kill the query
        name1 = "restart_p1_" + _uuid.uuid4().hex[:8]
        q1 = (
            build().writeStream.format("memory")
            .queryName(name1)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        t0 = time.time()
        while time.time() - t0 < 60:
            p = q1.lastProgress
            if p is not None and p["batchId"] >= 1 and p["numInputRows"] > 0:
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination()
        p1 = spark.table(name1)
        p1_rows, p1_schema = p1.collect(), p1.schema
        part = sum(r["n_events"] for r in p1_rows)
        evidence["phase1_events"] = int(part)
        evidence["batch_rows"] = batch_rows
        spark.catalog.dropTempView(name1)

        # ---- phase 2: restart from the SAME checkpoint, drain fully
        name2 = "restart_p2_" + _uuid.uuid4().hex[:8]
        q2 = (
            build().writeStream.format("memory")
            .queryName(name2)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 3 and time.time() - t0 < 180:
                time.sleep(0.3)
                p = q2.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            q2.stop()
            q2.awaitTermination()
        for p in q2.recentProgress:
            src = (p.get("sources") or [{}])[0]
            so = src.get("startOffset")
            if so is not None:
                if isinstance(so, str):
                    # Python stream sources report the offset dict's
                    # repr (single quotes), not JSON
                    try:
                        so = json.loads(so)
                    except ValueError:
                        import ast

                        so = ast.literal_eval(so)
                evidence["phase2_start_row"] = int(so.get("row", 0))
                break
        sink = spark.table(name2)
        rows = sink.collect()
        if rows:
            out = spark.createDataFrame(rows, sink.schema)
        else:
            # phase 1 won the race and consumed every batch before the
            # stop landed; with no new data, complete mode re-emits
            # nothing — phase 1's full-state snapshot IS the answer
            evidence["phase1_completed_stream"] = True
            out = spark.createDataFrame(p1_rows, p1_schema)
        spark.catalog.dropTempView(name2)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return out, evidence


@register(
    "q310_streaming_restart_recovery",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream", "checkpoint", "recovery"),
)
def q310_streaming_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming CHECKPOINT RECOVERY, graded (VERDICT r6 #8): the
    replayed event stream's windowed aggregation is started with a
    checkpoint directory, STOPPED after the first committed
    micro-batches (a simulated driver crash — the stop point is
    intentionally timing-dependent), then RESTARTED from the same
    checkpoint and drained to exhaustion. The restarted query resumes
    from the recorded replay offset with its state-store contents
    intact, so the final complete-mode result must equal the
    uninterrupted batch aggregation EXACTLY — any lost state
    undercounts, any replayed-and-recounted batch overcounts, so a
    bit-exact oracle match IS the exactly-once evidence. Offset
    resumption (not a silent from-zero rerun) is asserted separately
    in tests/test_streaming.py via the recovery evidence dict."""
    out, _evidence = _run_restart_recovery(spark, sf_dir)
    return out


@register(
    "q352_partitioned_restart_recovery",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream", "checkpoint", "recovery",
          "datasource", "partitioned"),
)
def q352_partitioned_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint recovery × PARTITIONED streaming source (VERDICT r7
    #8): q310's kill/restart protocol run through q330's full
    DataSourceStreamReader — the source whose micro-batches split
    into executor-side row-group-reading partitions. A restart
    recovers the committed row offset from the checkpoint's offset
    log and the source must RE-PLAN partitions for only the
    uncommitted range: per-partition slices are derived from the
    recovered offsets each batch, so resumption is exact even though
    no individual partition is itself checkpointed (the
    contiguous-slice planning contract, asserted in
    tests/test_streaming.py). Bit-exact oracle match of the drained
    complete-mode aggregate is the exactly-once evidence — a
    partition re-read after the crash overcounts, a skipped
    uncommitted range undercounts."""
    out, _evidence = _run_restart_recovery(
        spark, sf_dir, fmt="replay_part", extra_options={"numPartitions": 4}
    )
    return out


@register(
    "q354_streaming_chained_windows",
    # Emission cut pinned empirically against Spark 4.1.2 (q279's
    # method): with an event-time-ORDERED replay (no drops at any
    # delay) and a 0-second watermark, the final no-data micro-batch
    # advances the watermark to the global max event time and both
    # stateful levels flush windows with end <= watermark
    # (non-strict). Hence: hour windows whose end <= max(ts) are
    # emitted; the hour containing max(ts) is not (unless max lies
    # exactly on an hour boundary, in which case the preceding hour's
    # 10-minute windows all finalize too — consistent on both sides).
    oracle=f"""
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events, mx
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx.m
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "true_stream", "chained", "multi_stateful"),
)
def q354_streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming aggregations in ONE query (Spark
    3.4+ multiple-stateful-operator support, ungraded anywhere else
    in the registry): a 10-minute windowed pre-aggregation feeds an
    hourly rollup via `window_time()` — the production two-level
    pattern that keeps per-trigger state small (10-min partials) while
    serving a coarser SLA rollup, without running two queries or
    re-reading the stream. Both levels run in append mode with one
    event-time watermark; the replay source delivers rows in EVENT
    TIME order (new `orderBy` option), which makes the 0-second
    watermark drop-free, so the graded result is exactly the batch
    hourly census cut at the last finalized hour — any state lost
    between the chained operators, or a mis-propagated watermark,
    breaks the hash."""
    import time
    import uuid as _uuid

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", batch_rows)
        .option("orderBy", "ts,event_id")
        .load()
    )
    lvl1 = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(quantize(F.col("value")).cast("decimal(38,0)")).alias("qs"),
        )
    )
    lvl2 = (
        lvl1.groupBy(F.window(F.window_time("window"), "1 hour"))
        .agg(
            F.sum("c").alias("n_events"),
            (F.sum("qs").cast("double") / F.lit(float(10 ** MONEY_SCALE)))
            .alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "value_sum",
        )
    )
    name = "chained_" + _uuid.uuid4().hex[:8]
    query = (
        lvl2.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, time.time()
        while idle < 3 and time.time() - t0 < 180:
            time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


@register(
    "q279_streaming_watermark_drop",
    # The oracle SIMULATES Spark's batched watermark protocol exactly,
    # as pinned empirically against Spark 4.1.2 (see docstring):
    #   wm_reported(N) = runmax(batch max event time through N-1) - delay
    #   drop in batch N : window_end <= wm_reported(N-1)   [non-strict]
    #   emit (ever)     : window_end <= global_max - delay [non-strict]
    # Batch slicing is deterministic: rows replay ordered by
    # (md5(event_id), event_id) in ceil-sized batches mirrored below.
    oracle=f"""
WITH n AS (SELECT COUNT(*) AS cnt FROM events),
bsz AS (
  SELECT GREATEST(500, CAST(ceil(cnt / 40.0) AS BIGINT)) AS rows_per_batch FROM n
),
ordered AS (
  SELECT event_type, value,
         epoch_us(ts) AS ts_us,
         (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         (epoch_us(ts) // 3600000000) * 3600000000 + 3600000000 AS win_end_us,
         row_number() OVER (ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
           AS rn
  FROM events
),
batched AS (
  SELECT o.*, (o.rn - 1) // b.rows_per_batch AS batch
  FROM ordered o CROSS JOIN bsz b
),
batch_max AS (
  SELECT batch, MAX(ts_us) AS bmax FROM batched GROUP BY batch
),
thresholds AS (
  SELECT batch,
         MAX(bmax) OVER (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - 7200000000 AS drop_thr
  FROM batch_max
),
kept AS (
  SELECT r.win_start_us, r.event_type, r.value
  FROM batched r JOIN thresholds t ON r.batch = t.batch
  WHERE t.drop_thr IS NULL OR r.win_end_us > t.drop_thr
),
final_wm AS (SELECT MAX(ts_us) - 7200000000 AS wm FROM ordered)
SELECT strftime(to_timestamp(k.win_start_us // 1000000), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       k.event_type,
       COUNT(*) AS n_events,
       {sql_dsum('k.value')} AS value_sum
FROM kept k CROSS JOIN final_wm f
WHERE k.win_start_us + 3600000000 <= f.wm
GROUP BY k.win_start_us, k.event_type
""",
    tags=("streaming", "true_stream", "watermark", "late_data"),
)
def q279_streaming_watermark_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming watermark semantics, GRADED: events are
    re-ordered by (md5(event_id), event_id) — an adversarial arrival
    order where event time is uncorrelated with arrival — replayed in
    deterministic micro-batches through the `replay` DataSource, and
    aggregated per (1 h window, event_type) under a 2-hour watermark
    in APPEND mode. Late rows really are dropped and finalized windows
    really are evicted, across ~40 real micro-batches.

    The oracle replays Spark's watermark protocol in SQL, pinned by
    experiment against Spark 4.1.2 (three boundary probes, this
    session): the reported watermark of batch N is the running max
    event time through batch N-1 minus the delay; the LATE-ROW FILTER
    of batch N uses the watermark reported with batch N-1 (one batch
    of extra lag — a row arriving in the batch right after its
    window's eviction threshold was reached is still merged); both
    the drop and the final-emission comparisons are non-strict on
    window end. Because the drop threshold lags eviction by exactly
    one batch, an evicted window can never re-form — the append sink
    holds at most one row per group, which is what makes this
    exactly-graded.

    Scale shape: the scrambled replay fixture is a one-off test
    harness (repartition(1) + in-partition sort — no driver
    collect); the streaming plan itself is the production shape:
    watermarked source → windowed hash aggregation with RocksDB-able
    keyed state, bounded by live-window count, not stream length."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from cli_spark.sources.replay_datasource import register_replay_source

    e = load_table(spark, sf_dir, "events")
    n = e.count()
    bsz = max(500, -(-n // 40))  # ceil
    tmp = tempfile.mkdtemp(prefix="q279_replay_")
    try:
        (
            e.select(
                "event_id",
                "ts",
                "event_type",
                "value",
                F.md5(F.col("event_id").cast("string")).alias("_k"),
            )
            .repartition(1)
            .sortWithinPartitions("_k", "event_id")
            .drop("_k")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        register_replay_source(spark)
        stream = (
            spark.readStream.format("replay")
            .option("path", part)
            .option("batchRows", bsz)
            .load()
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum(F.col("value")).alias("value_sum"),
            )
            .select(
                ts_str(F.col("window.start")).alias("window_start"),
                "event_type",
                "n_events",
                "value_sum",
            )
        )
        name = "wmdrop_" + uuid.uuid4().hex[:8]
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        sink = spark.table(name)
        out = spark.createDataFrame(sink.collect(), sink.schema)
        spark.catalog.dropTempView(name)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "q285_streaming_dedup_multibatch",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, md5(substr(text, 1, 100)) AS h FROM documents
),
kept AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY h ORDER BY doc_id ASC) AS rn
  FROM keyed
)
SELECT lang,
       COUNT(*) AS n_unique,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM kept WHERE rn = 1
GROUP BY lang
""",
    tags=("streaming", "true_stream", "dedup", "multibatch"),
)
def q285_streaming_dedup_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE cross-batch streaming dedup: documents replay through the
    `replay` DataSource in ~20 micro-batches and a stateful
    `dropDuplicates` on the 100-char-prefix hash (the boilerplate
    key — exact-text dups are zero in this corpus, prefix dups are
    real) emits each key's FIRST-seen row; duplicates arriving in
    LATER batches are suppressed by keyed state, which is the part a
    single-batch run never exercises (q179's documented limitation).
    Emitted rows flow through a distributed foreachBatch parquet sink
    (per-row output is unbounded at scale — the memory-sink contract
    forbids it), and the per-language census of survivors is graded
    exactly: replay order is doc_id order, so first-seen ≡ min doc_id
    per key, which the oracle states as a keep-first window.

    ORDERING DEPENDENCY (ADVICE r6): when duplicates of a key CO-OCCUR
    in one micro-batch, `dropDuplicates` keeps whichever row its tasks
    encounter first — "first ≡ min doc_id" then holds only because the
    replay source emits a SINGLE ordered partition and Spark's shuffle
    reads preserve per-mapper order, so the state store always meets
    the lower doc_id first. A multi-partition source voids that
    guarantee; the production form would pre-collapse each batch to
    its min-doc_id row per key (deterministic reduce) before the
    stateful dedup. The single-partition replay contract is asserted
    by this query's bit-exact oracle match across ~20 batches."""
    import shutil
    import tempfile
    import time

    from cli_spark.sources.replay_datasource import register_replay_source

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    bsz = max(50, -(-n // 20))
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("batchRows", bsz)
        .load()
    )
    deduped = stream.select(
        "doc_id", "lang", F.md5(F.expr("substring(text, 1, 100)")).alias("h")
    ).dropDuplicates(["h"])
    out_root = tempfile.mkdtemp(prefix="q285_dedup_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(f"{out_root}/kept")

        query = (
            deduped.writeStream.foreachBatch(sink)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        kept = spark.read.parquet(f"{out_root}/kept")
        result = kept.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("doc_id").alias("doc_id_sum"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q294_stateful_running_totals_graded",
    # Batch size mirrored from the Spark side (max(500, ceil(n/25)));
    # events.parquet row order IS event_id order (verified at every
    # sf), so the oracle reconstructs each event's micro-batch from
    # its row number and counts the distinct batches per user — the
    # cross-batch state evidence — while totals are plain censuses.
    oracle="""
WITH n AS (SELECT COUNT(*) AS cnt FROM events),
bsz AS (
  SELECT GREATEST(500, CAST(ceil(cnt / 25.0) AS BIGINT)) AS rows_per_batch FROM n
),
batched AS (
  SELECT e.user_id, e.value,
         (e.event_id) // b.rows_per_batch AS batch
  FROM events e CROSS JOIN bsz b
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents,
       COUNT(DISTINCT batch) AS n_update_batches
FROM batched GROUP BY user_id
""",
    tags=("streaming", "true_stream", "stateful", "multibatch"),
)
def q294_stateful_running_totals_graded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED custom stateful operator (applyInPandasWithState): the
    events table replays in ~25 micro-batches and a GroupState keyed
    per user accumulates (event count, exact integer cents, update
    count) ACROSS batches, emitting the running value each time the
    key appears (update mode). The run is proven stateful, not
    re-aggregated: the driver keeps each user's LAST emission, whose
    update count must equal the number of distinct micro-batches that
    carried that user — reconstructed independently by the oracle
    from row numbers — while count/cents equal the batch census.
    State is integer cents, so cross-batch accumulation is exact and
    order-free.

    Scale shape: keys hash-shard across executors via the groupBy;
    state is one small row per user in the state store (RocksDB in
    production); per-batch output rides a distributed foreachBatch
    parquet sink."""
    import shutil
    import tempfile
    import time
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cli_spark.sources.replay_datasource import register_replay_source

    e = load_table(spark, sf_dir, "events")
    n = e.count()
    bsz = max(500, -(-n // 25))
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", bsz)
        .load()
    )

    def _update(key, batches: Iterator[pd.DataFrame], state: GroupState):
        cnt, cents, ub = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            cnt += len(pdf)
            cents += int(
                (pdf["value"].astype(float) * 100.0 + 0.5).apply(
                    lambda x: int(x // 1)
                ).sum()
            )
        ub += 1
        state.update((cnt, cents, ub))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "value_cents": [cents],
                "n_update_batches": [ub],
            }
        )

    totals = stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, value_cents long, "
        "n_update_batches long",
        stateStructType="cnt long, cents long, ub long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out_root = tempfile.mkdtemp(prefix="q294_state_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("_b", F.lit(batch_id)).write.mode("append").parquet(
                f"{out_root}/upd"
            )

        query = (
            totals.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        upd = spark.read.parquet(f"{out_root}/upd")
        from pyspark.sql.window import Window as _Win

        last = (
            upd.withColumn(
                "rn",
                F.row_number().over(
                    _Win.partitionBy("user_id").orderBy(F.col("_b").desc())
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "n_events", "value_cents", "n_update_batches")
        )
        out = spark.createDataFrame(last.collect(), last.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q306_streaming_topk_complete",
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 10
""",
    tags=("streaming", "true_stream", "topk", "multibatch"),
)
def q306_streaming_topk_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming top-K maintenance: the leaderboard query under
    complete output mode — per-user aggregation state accumulates
    across ~20 replay micro-batches and the sink re-ranks the top-10
    most active users after every batch (sort + limit are legal under
    complete mode precisely because the full aggregated state is
    re-emitted). The final sink content must equal the batch top-10
    exactly — complete-mode aggregation is batch-slicing-invariant
    and the rank has full tie-breaks. The memory sink holds K rows,
    not the keyed state, so the driver footprint is K regardless of
    user cardinality."""
    import time

    from cli_spark.sources.replay_datasource import register_replay_source

    e = load_table(spark, sf_dir, "events")
    n = e.count()
    bsz = max(500, -(-n // 20))
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", bsz)
        .load()
    )
    ranked = (
        stream.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )
    name = "topk_" + uuid.uuid4().hex[:8]
    query = (
        ranked.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, time.time()
        while idle < 5 and time.time() - t0 < 240:
            time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


@register(
    "q318_streaming_outer_join_true",
    # Matched pairs equal the batch interval join (no drops: arrival
    # is near event-time order and the 2 h delay dominates disorder);
    # null-side emission follows Spark's outer-join state eviction,
    # pinned empirically on Spark 4.1.2: an unmatched left row emits
    # exactly when the FINAL global watermark — the MIN of the two
    # sources' max event times minus the delay, reached via the
    # trailing no-data micro-batches — passes STRICTLY above its
    # latest possible match time (p_ts). Purchases at-or-above the
    # final watermark stay in state and never emit; the oracle
    # reproduces that exact cut.
    oracle=f"""
WITH pur AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT user_id AS e_user, ts AS e_ts, value AS e_value
  FROM events WHERE event_type = 'error'
),
inner_j AS (
  SELECT p.p_id, p.p_user, e.e_value
  FROM pur p JOIN err e
    ON e.e_user = p.p_user
   AND e.e_ts >= p.p_ts - INTERVAL 30 MINUTE
   AND e.e_ts <= p.p_ts
),
wm AS (
  SELECT LEAST((SELECT MAX(p_ts) FROM pur), (SELECT MAX(e_ts) FROM err))
         - INTERVAL 2 HOUR AS w
),
matched AS (
  SELECT p_user AS u, COUNT(*) AS n_pairs, {sql_dsum('e_value')} AS err_value_sum
  FROM inner_j GROUP BY p_user
),
unmatched AS (
  SELECT p.p_user AS u, COUNT(*) AS n_unmatched
  FROM pur p
  LEFT JOIN (SELECT DISTINCT p_id FROM inner_j) m ON p.p_id = m.p_id
  WHERE m.p_id IS NULL AND p.p_ts < (SELECT w FROM wm)
  GROUP BY p.p_user
)
SELECT COALESCE(a.u, b.u) AS user_id,
       COALESCE(a.n_pairs, 0) AS n_pairs,
       COALESCE(b.n_unmatched, 0) AS n_unmatched,
       COALESCE(a.err_value_sum, 0.0) AS err_value_sum
FROM matched a FULL OUTER JOIN unmatched b ON a.u = b.u
""",
    tags=("streaming", "true_stream", "outer_join", "watermark"),
)
def q318_streaming_outer_join_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-STREAM LEFT OUTER interval join — the hardest
    stateful join semantic: matches emit as both sides arrive across
    micro-batches, and an unmatched purchase emits its null row ONLY
    once the global watermark (min across both input streams) proves
    no future error can still match it. Both sides replay the events
    file through the `replay` DataSource in ~10 batches under a
    2-hour watermark; per-row join output is unbounded at scale, so
    it lands in a distributed foreachBatch parquet sink (the q264
    contract), and the graded result is the per-user census of
    matched pairs and watermark-released null rows. Purchases above
    the final watermark are still in the join state when the stream
    ends — exactly as in production, where they'd emit on the next
    day's data — and the oracle reproduces that strict cut."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)

    def src() -> DataFrame:
        return (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
        )

    pur = (
        src().filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    err = (
        src().filter(F.col("event_type") == "error")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
    )
    joined = pur.join(
        err,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("e_ts") <= F.col("p_ts")),
        "leftOuter",
    )
    out_root = tempfile.mkdtemp(prefix="q318_outer_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(f"{out_root}/rows")

        query = (
            joined.writeStream.foreachBatch(sink)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        rows = spark.read.parquet(f"{out_root}/rows")
        matched = (
            rows.filter(F.col("e_user").isNotNull())
            .groupBy(F.col("p_user").alias("u"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                dsum(F.col("e_value")).alias("err_value_sum"),
            )
        )
        unmatched = (
            rows.filter(F.col("e_user").isNull())
            .groupBy(F.col("p_user").alias("u"))
            .agg(F.count(F.lit(1)).alias("n_unmatched"))
        )
        result = (
            matched.join(unmatched, "u", "full_outer")
            .select(
                F.col("u").alias("user_id"),
                F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                F.coalesce("n_unmatched", F.lit(0)).alias("n_unmatched"),
                F.coalesce("err_value_sum", F.lit(0.0)).alias("err_value_sum"),
            )
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q330_streaming_partitioned_source",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream", "datasource", "partitioned"),
)
def q330_streaming_partitioned_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming through the PARTITIONED Python DataSource
    (sources/replay_partitioned.py): each micro-batch's row range is
    split into 4 executor-side partitions that open the parquet file
    themselves and read only their overlapping row groups — the
    production streaming-source shape (driver plans offsets, fleet
    reads bytes), upgrading the simple replay source's documented
    driver-side-IO limitation to the full DataSourceStreamReader
    API. Windowed complete-mode aggregation across ~10 batches must
    equal the batch oracle exactly; correctness is batch-slicing- AND
    partition-slicing-invariant, so any row lost or duplicated at a
    partition boundary breaks the hash."""
    import time
    import uuid as _uuid

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_partitioned import register_replay_partitioned

    register_replay_partitioned(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    stream = (
        spark.readStream.format("replay_part")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", batch_rows)
        .option("numPartitions", 4)
        .load()
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    name = "replay_part_" + _uuid.uuid4().hex[:8]
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, time.time()
        while idle < 3 and time.time() - t0 < 180:
            time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


@register(
    "q331_streaming_idempotent_sink",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "true_stream", "exactly_once", "sink"),
)
def q331_streaming_idempotent_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once SINK semantics under failure — the other half of
    q310's recovery story: q310 proved the STATE recovers; here the
    sink is per-event foreachBatch parquet, and the crash-restart
    re-executes its in-flight micro-batch, so a naive append sink
    would double-write those rows. The sink is made idempotent the
    standard way (batch-id keyed dynamic partition overwrite: a
    replayed batch OVERWRITES its own partition instead of appending),
    and the graded census over everything on disk must equal the
    batch oracle exactly — any duplicated or lost batch breaks the
    hash. This is the pattern every production foreachBatch sink uses
    when the target store lacks transactions.

    Scale shape: per-batch writes are distributed parquet appends to
    one partition directory; the final census is an ordinary scan-agg
    over the sink. The kill point is timing-dependent by design; the
    final state is not."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    ckpt = tempfile.mkdtemp(prefix="cli_spark_idem_ckpt_")
    out_root = tempfile.mkdtemp(prefix="cli_spark_idem_out_")

    def build() -> DataFrame:
        stream = (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
        )
        return stream.select("event_id", "ts", "value")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_bid", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bid")
            .parquet(out_root + "/rows")
        )

    try:
        # phase 1: run a few batches, then kill mid-stream
        q1 = (
            build().writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        t0 = time.time()
        while time.time() - t0 < 60:
            p = q1.lastProgress
            if p is not None and p["batchId"] >= 1 and p["numInputRows"] > 0:
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination()

        # phase 2: restart from the checkpoint; the in-flight batch
        # re-executes and OVERWRITES its own partition (idempotent)
        q2 = (
            build().writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 3 and time.time() - t0 < 180:
                time.sleep(0.3)
                p = q2.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            q2.stop()
            q2.awaitTermination()
        rows = spark.read.parquet(out_root + "/rows")
        result = (
            rows.groupBy(F.window("ts", "1 hour"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum(F.col("value")).alias("value_sum"),
            )
            .select(
                ts_str(F.col("window.start")).alias("window_start"),
                "n_events",
                "value_sum",
            )
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q337_backfill_live_merge",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "true_stream", "backfill", "lambda"),
)
def q337_backfill_live_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill + live-tail cutover — the lambda-architecture merge
    every pipeline runs when streaming starts against a table with
    history: the BATCH side owns the first 60% of events (by the
    replay order), the STREAM side replays from 5 batches BEFORE the
    cutover (a deliberate overlap window — in production you always
    overlap rather than risk a gap), per-event rows land in a
    distributed parquet sink, and the union dedupes the overlap by
    event_id before the census. The graded result must equal the
    full-history batch aggregation exactly: a gap undercounts, an
    un-deduped overlap double-counts.

    Scale shape: the batch side is one bounded scan; the stream side
    is the replay contract; overlap dedup is an exact-key
    dropDuplicates on the unioned row-level relation (keyed shuffle);
    the census is the q100 two-level distinct shape."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    cutover = (n_rows * 6) // 10
    overlap_start = max(0, cutover - batch_rows // 2)

    # batch side: rows [0, cutover) in file order. The slice is cut by
    # an event_id THRESHOLD located with the q194 two-phase bucketed
    # rank (range-bucket census + per-bucket keyed window) — never a
    # global row_number over the fact rows (ADVICE r7): the only
    # windows are over the ≤1024-row bucket census and within buckets.
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as _W

    bounds = ev.agg(
        F.min("event_id").alias("_lo"), F.max("event_id").alias("_hi")
    )
    bkt = (
        ev.select("event_id")
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            (
                (F.col("event_id") - F.col("_lo")) * 1024
                / (F.col("_hi") - F.col("_lo") + 1)
            ).cast("long").alias("_bucket"),
        )
    )
    census = bkt.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_c"))
    cum = census.select(
        "_bucket",
        (
            F.sum("_c").over(
                _W.orderBy("_bucket").rowsBetween(_W.unboundedPreceding, -1)
            )
        ).alias("_before"),
    ).fillna(0, subset=["_before"])
    granked = (
        bkt.join(F.broadcast(cum), "_bucket")
        .withColumn(
            "_grank",
            F.row_number().over(_W.partitionBy("_bucket").orderBy("event_id"))
            - 1 + F.col("_before"),
        )
    )
    probes = {
        int(r["_grank"]): int(r["event_id"])
        for r in granked.filter(
            F.col("_grank").isin(cutover, overlap_start)
        ).collect()  # two scalar threshold probes, never fact rows
    }
    cut_id, overlap_id = probes[cutover], probes[overlap_start]
    batch_part = ev.filter(F.col("event_id") < cut_id).select(
        "event_id", "ts", "user_id", "value"
    )

    # stream side: replay from BEFORE the cutover (overlap on purpose)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", batch_rows)
        .option("startRow", overlap_start)
        .load()
        .select("event_id", "ts", "user_id", "value")
    )
    out_root = tempfile.mkdtemp(prefix="q337_tail_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(f"{out_root}/rows")

        query = (
            stream.writeStream.foreachBatch(sink)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 3 and time.time() - t0 < 180:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        tail = spark.read.parquet(f"{out_root}/rows")
        # The merge is gap-free iff the file's replay order equals
        # event_id order (first `cutover` file rows = smallest
        # `cutover` ids). Assert it instead of assuming it (ADVICE
        # r7): the tail replays from file row `overlap_start`, so its
        # min event_id must be the id at rank overlap_start.
        tail_min = tail.agg(F.min("event_id")).collect()[0][0]
        if tail_min != overlap_id:
            raise ValueError(
                f"replay order != event_id order: tail starts at id "
                f"{tail_min}, rank-{overlap_start} id is {overlap_id}"
            )
        merged = batch_part.unionByName(tail).dropDuplicates(["event_id"])
        per_user = merged.groupBy(F.window("ts", "1 hour"), "user_id").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(quantize(F.col("value"))).alias("qs"),
        )
        result = (
            per_user.groupBy("window")
            .agg(
                F.sum("c").alias("n_events"),
                F.count("user_id").alias("n_users"),
                (F.sum("qs").cast("double") / F.lit(float(10 ** MONEY_SCALE)))
                .alias("value_sum"),
            )
            .select(
                ts_str(F.col("window.start")).alias("window_start"),
                "n_events",
                "n_users",
                "value_sum",
            )
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q338_streaming_checksum_sink",
    # The oracle recomputes the sink's 48-bit xor-fold (q119's hash48
    # machinery over event_id rendered as a string) plus the batch
    # count implied by the ceil-slicing construction.
    oracle="""
WITH n AS (SELECT COUNT(*) AS cnt FROM events),
h AS (
  SELECT CAST(bit_xor((
    """ + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (11 - i)}"
        for i in range(12)
    ) + """
  )) AS BIGINT) AS checksum48 FROM events
)
SELECT CAST(ceil(n.cnt / ceil(n.cnt / 10.0)) AS BIGINT) AS n_batches,
       CAST(n.cnt AS BIGINT) AS total_rows,
       h.checksum48
FROM n CROSS JOIN h
""",
    tags=("streaming", "true_stream", "datasource", "sink"),
)
def q338_streaming_checksum_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Python DataSource WRITER (Spark 4
    `DataSourceStreamWriter`) — the last cell of the custom-source
    API matrix (batch read, simple + partitioned stream read, batch
    write, STREAM write): events replay in ~10 micro-batches into the
    checksum stream sink, whose executor tasks fold (count, 48-bit
    xor) commit messages and whose per-batch commit writes ONE
    manifest file named by batch id via atomic rename — a replayed
    batch overwrites its own manifest, so the sink is idempotent
    under crash-replay at the API level (the q331 pattern, moved
    into the DataSource contract). The graded readout folds the
    batch manifests: batch count, total rows, and the
    order/partition/batch-slicing-independent xor checksum must
    equal the oracle's recomputation over the events table."""
    import json as _json
    import os as _os
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.checksum_sink import register_checksum_sink
    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    register_checksum_sink(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    out_root = tempfile.mkdtemp(prefix="q338_cks_")
    ckpt = tempfile.mkdtemp(prefix="q338_ckpt_")
    try:
        stream = (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
            .select(F.col("event_id").cast("string").alias("k"))
        )
        query = (
            stream.writeStream.format("checksum")
            .option("path", out_root)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 3 and time.time() - t0 < 180:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        total, acc, n_batches = 0, 0, 0
        for f in sorted(_os.listdir(out_root)):
            if not f.startswith("batch_"):
                continue
            j = _json.load(open(_os.path.join(out_root, f)))
            n_batches += 1
            total += j["row_count"]
            acc ^= j["checksum48"]
        return spark.createDataFrame(
            [(n_batches, total, acc)],
            "n_batches long, total_rows long, checksum48 long",
        )
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@register(
    "q370_streaming_full_outer_join",
    # Both null sides follow Spark 4.1.2's symmetric state eviction,
    # pinned empirically (q318's method, extended to the right side):
    # an unmatched LEFT row (purchase) emits when the final global
    # watermark — min of the two sources' max event times minus the
    # 2 h delay — passes STRICTLY above its latest possible match
    # time (p_ts); an unmatched RIGHT row (error) when it passes
    # strictly above e_ts + 30 min (the latest purchase it could
    # still join). Rows at-or-above the cut stay in state unemitted.
    oracle=f"""
WITH pur AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT event_id AS e_id, user_id AS e_user, ts AS e_ts, value AS e_value
  FROM events WHERE event_type = 'error'
),
inner_j AS (
  SELECT p.p_id, p.p_user, e.e_id, e.e_user, e.e_value
  FROM pur p JOIN err e
    ON e.e_user = p.p_user
   AND e.e_ts >= p.p_ts - INTERVAL 30 MINUTE
   AND e.e_ts <= p.p_ts
),
wm AS (
  SELECT LEAST((SELECT MAX(p_ts) FROM pur), (SELECT MAX(e_ts) FROM err))
         - INTERVAL 2 HOUR AS w
),
matched AS (
  SELECT p_user AS u, COUNT(*) AS n_pairs, {sql_dsum('e_value')} AS err_value_sum
  FROM inner_j GROUP BY p_user
),
un_l AS (
  SELECT p.p_user AS u, COUNT(*) AS n_unmatched_purchases
  FROM pur p
  LEFT JOIN (SELECT DISTINCT p_id FROM inner_j) m ON p.p_id = m.p_id
  WHERE m.p_id IS NULL AND p.p_ts < (SELECT w FROM wm)
  GROUP BY p.p_user
),
un_r AS (
  SELECT e.e_user AS u, COUNT(*) AS n_unmatched_errors
  FROM err e
  LEFT JOIN (SELECT DISTINCT e_id FROM inner_j) m ON e.e_id = m.e_id
  WHERE m.e_id IS NULL AND e.e_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
  GROUP BY e.e_user
)
SELECT COALESCE(a.u, l.u, r.u) AS user_id,
       COALESCE(a.n_pairs, 0) AS n_pairs,
       COALESCE(l.n_unmatched_purchases, 0) AS n_unmatched_purchases,
       COALESCE(r.n_unmatched_errors, 0) AS n_unmatched_errors,
       COALESCE(a.err_value_sum, 0.0) AS err_value_sum
FROM matched a
FULL OUTER JOIN un_l l ON a.u = l.u
FULL OUTER JOIN un_r r ON COALESCE(a.u, l.u) = r.u
""",
    tags=("streaming", "true_stream", "full_outer_join", "watermark"),
)
def q370_streaming_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream FULL OUTER interval join (Spark 3.1+), the
    completion of the outer-join matrix q318 opened: BOTH sides hold
    symmetric state, matches emit as partners arrive across
    micro-batches, and each side's unmatched rows emit null-partner
    rows only when the global watermark proves no future partner can
    arrive — purchases once the watermark passes their own timestamp,
    errors once it passes the end of their 30-minute forward match
    window. Per-row output is unbounded at 100 TB, so it lands in a
    distributed foreachBatch parquet sink and the graded result is
    the per-user census of pairs and both null-side families. Rows
    still inside the final watermark stay in state unemitted — the
    production steady-state — and the oracle reproduces both strict
    eviction cuts exactly."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)

    def src() -> DataFrame:
        return (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
        )

    pur = (
        src().filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    err = (
        src().filter(F.col("event_type") == "error")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
    )
    joined = pur.join(
        err,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("e_ts") <= F.col("p_ts")),
        "fullOuter",
    )
    out_root = tempfile.mkdtemp(prefix="q370_fullouter_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(f"{out_root}/rows")

        query = (
            joined.writeStream.foreachBatch(sink)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        rows = spark.read.parquet(f"{out_root}/rows")
        matched = (
            rows.filter(F.col("p_id").isNotNull() & F.col("e_id").isNotNull())
            .groupBy(F.col("p_user").alias("u"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                dsum(F.col("e_value")).alias("err_value_sum"),
            )
        )
        un_l = (
            rows.filter(F.col("e_id").isNull())
            .groupBy(F.col("p_user").alias("u"))
            .agg(F.count(F.lit(1)).alias("n_unmatched_purchases"))
        )
        un_r = (
            rows.filter(F.col("p_id").isNull())
            .groupBy(F.col("e_user").alias("u"))
            .agg(F.count(F.lit(1)).alias("n_unmatched_errors"))
        )
        result = (
            matched.join(un_l, "u", "full_outer")
            .join(un_r, "u", "full_outer")
            .select(
                F.col("u").alias("user_id"),
                F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                F.coalesce("n_unmatched_purchases", F.lit(0))
                .alias("n_unmatched_purchases"),
                F.coalesce("n_unmatched_errors", F.lit(0))
                .alias("n_unmatched_errors"),
                F.coalesce("err_value_sum", F.lit(0.0)).alias("err_value_sum"),
            )
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q371_statestore_reader",
    # The graded rows come from the CHECKPOINT STATE, not the sink:
    # after the stream drains, spark.read.format("statestore") opens
    # the last committed snapshot and its per-key aggregate buffers
    # must equal the batch group-by of the full table.
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * {10 ** MONEY_SCALE}) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY event_type
""",
    tags=("streaming", "statestore", "observability", "spark4"),
)
def q371_statestore_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State Data Source (Spark 4.0 `statestore` format): the
    operational window into a streaming query's checkpoint — the tool
    for debugging hot keys, auditing state size, and seeding state
    migrations at 100 TB, where checkpoint state (not the sink) is
    the system of record. A multi-batch replay stream runs a per-type
    count + exact-cents sum aggregate against a checkpoint; after it
    drains, the checkpoint's LAST COMMITTED state snapshot is read
    back with `spark.read.format("statestore")` and the per-key
    HDFS-backed aggregation buffers (`value.count`, `value.sum`) are
    graded — bit-exactly — against the batch aggregate of the whole
    table. Any lost update, replayed batch, or partial-buffer flush
    in the state machinery breaks the hash; `state-metadata` is also
    asserted (operator name, partition count) so the checkpoint shape
    itself is part of the contract."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 5) // 6)
    ckpt = tempfile.mkdtemp(prefix="q371_ckpt_")
    name = "ss_" + uuid.uuid4().hex[:8]
    try:
        stream = (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
        )
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * (10 ** MONEY_SCALE)).cast("long"))
            .alias("value_cents"),
        )
        query = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        spark.catalog.dropTempView(name)
        md = spark.read.format("state-metadata").load(ckpt).collect()
        if len(md) != 1 or md[0]["operatorName"] != "stateStoreSave":
            raise ValueError(f"unexpected state metadata: {md}")
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").cast("long").alias("n_events"),
                F.col("value.sum").cast("long").alias("value_cents"),
            )
        )
        out = spark.createDataFrame(state.collect(), state.schema)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "q383_streaming_pivot_foreachbatch",
    # Pivot is an unsupported operation ON a stream; the oracle is
    # the batch per-hour conditional-aggregation matrix the partial
    # merge must reconstruct exactly.
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_n,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_n,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_n,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_n,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_n,
       CAST(SUM(CAST(round(value * {10 ** MONEY_SCALE}) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "true_stream", "pivot", "foreachbatch"),
)
def q383_streaming_pivot_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PIVOT via the foreachBatch escape hatch — `pivot()`
    is an unsupported operation on a streaming DataFrame (its column
    set depends on data Spark hasn't seen), so the production pattern
    is: each micro-batch appends UN-pivoted partial aggregates
    (hour, event_type, count, cents) — a tiny, mergeable relation —
    and the pivot runs as a BATCH query over the accumulated
    partials, where the column set is closed. The graded result is
    the per-hour event-type matrix; splitting any hour across
    micro-batches tests that the partials actually merge (SUM of
    COUNTs), and the oracle is the direct batch pivot. This is the
    general recipe for every streaming-unsupported operator (pivot,
    global sort, percentile): stream the mergeable sufficient
    statistic, finish the non-mergeable shape in batch."""
    import shutil
    import tempfile
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 7) // 8)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", batch_rows)
        .load()
    )
    out_root = tempfile.mkdtemp(prefix="q383_pivot_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            partial = batch_df.groupBy(
                F.date_trunc("hour", "ts").alias("h"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("value") * (10 ** MONEY_SCALE)).cast("long")
                ).alias("cents"),
            )
            partial.write.mode("append").parquet(f"{out_root}/partials")

        query = (
            stream.writeStream.foreachBatch(sink)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, time.time()
            while idle < 5 and time.time() - t0 < 240:
                time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        partials = spark.read.parquet(f"{out_root}/partials")
        types = ["click", "error", "purchase", "signup", "view"]
        pivoted = (
            partials.groupBy("h")
            .pivot("event_type", types)
            .sum("n")
            .na.fill(0, types)
        )
        cents = partials.groupBy("h").agg(F.sum("cents").alias("total_cents"))
        result = pivoted.join(cents, "h").select(
            ts_str(F.col("h")).alias("window_start"),
            F.col("click").cast("long").alias("click_n"),
            F.col("error").cast("long").alias("error_n"),
            F.col("purchase").cast("long").alias("purchase_n"),
            F.col("signup").cast("long").alias("signup_n"),
            F.col("view").cast("long").alias("view_n"),
            F.col("total_cents").cast("long").alias("total_cents"),
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q386_streaming_scd2_enrichment",
    # Oracle closed-forms the version lookup: version = 10-day slot
    # since 2024-01-01, tier = (user_id + version) % 3 — the same
    # derivation that built the dimension, reached WITHOUT the join.
    oracle=f"""
WITH enr AS (
  SELECT (user_id + (epoch_us(ts) - 1704067200000000) // 864000000000) % 3
           AS tier,
         value
  FROM events
  WHERE epoch_us(ts) >= 1704067200000000
    AND (epoch_us(ts) - 1704067200000000) // 864000000000 < 36
)
SELECT CAST(tier AS BIGINT) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM enr GROUP BY tier
""",
    tags=("streaming", "true_stream", "scd2", "stream_static", "asof"),
)
def q386_streaming_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static AS-OF enrichment against an SCD2 dimension — the
    production upgrade of q214's static join: the dimension has
    VERSIONED rows with validity intervals (36 ten-day user-tier
    versions from 2024-01-01, tier = (user_id + version) % 3), and
    each streamed event must pick the version valid AT ITS EVENT
    TIME: an equi-join on user_id with the interval predicate as
    residual, re-evaluated per micro-batch — Spark re-broadcasts the
    dimension every batch, so a dimension update between batches is
    picked up, which is exactly why stream-static (not a snapshot
    join at job start) is the SCD2-correct pattern. Graded: per-tier
    census of the drained stream; the oracle closed-forms the version
    arithmetic and reaches the same numbers without any join."""
    import time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    BASE_US = 1704067200000000  # 2024-01-01 00:00:00 UTC
    SLOT_US = 864000000000      # 10 days
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct()
    )
    dim = (
        users.crossJoin(
            spark.range(36).select(F.col("id").alias("version"))
        )
        .select(
            "user_id",
            "version",
            (F.lit(BASE_US) + F.col("version") * F.lit(SLOT_US)).alias("from_us"),
            (F.lit(BASE_US) + (F.col("version") + 1) * F.lit(SLOT_US)).alias("to_us"),
            ((F.col("user_id") + F.col("version")) % 3).alias("tier"),
        )
    )
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 7) // 8)
    stream = (
        spark.readStream.format("replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batchRows", batch_rows)
        .load()
        .withColumn("t_us", F.unix_micros("ts"))
    )
    enriched = stream.join(
        dim,
        (stream.user_id == dim.user_id)
        & (F.col("t_us") >= F.col("from_us"))
        & (F.col("t_us") < F.col("to_us")),
        "inner",
    ).select("tier", "value")
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("value_sum"),
    )
    name = "scd2_" + uuid.uuid4().hex[:8]
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        import time as _t
        idle, t0 = 0, _t.time()
        while idle < 5 and _t.time() - t0 < 240:
            _t.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out.select(
        F.col("tier").cast("long").alias("tier"), "n_events", "value_sum"
    )


@register(
    "q387_session_window_dynamic_gap",
    # Dynamic-gap sessionization = union of per-event intervals
    # [ts, ts + gap): a new session opens when ts exceeds the running
    # max of all previous interval ends; session end = max end.
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'purchase' THEN 3600000000
              ELSE 1800000000 END AS gap_us,
         value
  FROM events
),
marked AS (
  SELECT *,
         CASE WHEN t_us > COALESCE(MAX(t_us + gap_us) OVER (
                PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
),
sess AS (
  SELECT *, CAST(SUM(new_sess) OVER (
    PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
  FROM marked
)
SELECT user_id, sess_no,
       strftime(make_timestamp(MIN(t_us)), '%Y-%m-%d %H:%M:%S')
         AS session_start,
       strftime(make_timestamp(MAX(t_us + gap_us)), '%Y-%m-%d %H:%M:%S')
         AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM sess
GROUP BY user_id, sess_no
""",
    tags=("streaming", "session_window", "dynamic_gap"),
)
def q387_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION WINDOWS WITH A DYNAMIC GAP (Spark 3.2+
    `session_window(ts, gap_expression)`): the session timeout is a
    per-EVENT expression — purchases hold a session open for 60
    minutes, everything else 30 — the production shape for behavioral
    sessionization where high-intent actions extend engagement
    windows (a fixed gap must pick one number and mis-sessionizes the
    other class). Semantics: each event spans [ts, ts+gap); sessions
    are the connected unions of overlapping spans, so session END is
    the max span end, not last-event-time + constant. The oracle
    replays exactly that union rule as a running-max gaps-and-islands
    pass; q102's fixed-gap sessions are the degenerate case. Same
    expression works under `readStream` with a watermark (q124's
    harness) — graded here in batch form for the exact census, one
    shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    # gap must be CalendarIntervalType: a string-typed column works
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")) \
        .otherwise(F.lit("30 minutes"))
    sw = e.groupBy(
        F.session_window(F.col("ts"), gap).alias("w"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("value_sum"),
    )
    from pyspark.sql.window import Window as _Wdg

    win = _Wdg.partitionBy("user_id").orderBy(F.col("w.start").asc())
    return sw.select(
        "user_id",
        F.row_number().over(win).cast("long").alias("sess_no"),
        ts_str(F.col("w.start")).alias("session_start"),
        ts_str(F.col("w.end")).alias("session_end"),
        "n_events",
        "value_sum",
    )


@register(
    "q391_rocksdb_statestore",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "true_stream", "rocksdb", "statestore"),
)
def q391_rocksdb_statestore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming aggregation on the ROCKSDB STATE STORE
    (`RocksDBStateStoreProvider`) — the production state backend for
    large stateful jobs: HDFSBackedStateStoreProvider holds every
    version of state in executor HEAP (state size is memory-bounded
    and GC-hostile at 100 TB), while RocksDB keeps state off-heap on
    local SSD with incremental changelog checkpointing, which is why
    every large-scale deployment (and transformWithState) requires
    it. Graded, not just unit-tested: the events table is re-laid as
    six event-time-range files and streamed with
    `maxFilesPerTrigger=1` (the FILE stream source's rate limit), so
    the hourly census accumulates across >= 6 micro-batches of
    RocksDB get/put/commit cycles — a wrong provider wiring, a lost
    RocksDB commit, or a version rollback breaks the bit-exact match
    with the batch oracle. The run asserts RocksDB custom metrics in
    the final progress (proof the provider actually served the
    stateful operator) and restores the session's provider conf."""
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="q391_rocksdb_")
    key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        # six event-time-ordered range files -> six micro-batches
        e.repartitionByRange(6, "ts", "event_id").write.parquet(tmp + "/in")
        schema = spark.read.parquet(tmp + "/in").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp + "/in")
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        ).select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
        prev = spark.conf.get(key, None)
        spark.conf.set(key, rocksdb)
        try:
            name = f"q391_{uuid.uuid4().hex[:8]}"
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", tmp + "/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            committed = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(committed) < 2:
                raise RuntimeError(
                    f"q391 expected multi-batch RocksDB run, got "
                    f"{len(committed)} data batches"
                )
            metrics = (q.lastProgress or {}).get("stateOperators", [{}])[0] \
                .get("customMetrics", {})
            if not any("rocksdb" in k.lower() for k in metrics):
                raise RuntimeError(
                    "q391: no RocksDB custom metrics in progress — "
                    "state did not run on RocksDBStateStoreProvider"
                )
            sink = spark.table(name)
            rows = sink.collect()
            out = spark.createDataFrame(rows, sink.schema)
            spark.catalog.dropTempView(name)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "q395_streaming_file_sink",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum
FROM events
GROUP BY event_type
""",
    tags=("streaming", "true_stream", "file_sink", "exactly_once"),
)
def q395_streaming_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming FILE SINK with its `_spark_metadata`
    commit log — the exactly-once contract for writing a stream AS
    FILES (the lakehouse landing pattern; q331/q338 graded custom
    foreachBatch/DataSource sinks, this grades Spark's own). The
    sink records every committed file per batch in
    `_spark_metadata/`; a batch reader of the directory must use
    that log as the file index, NOT a directory listing — that is
    what makes task-crash orphan files invisible. Proved here, not
    assumed: after the drain an ORPHAN parquet file (a duplicated
    real output file, as a failed-then-retried task would leave) is
    planted in the output directory, and the graded read-back census
    still matches the batch oracle bit-exactly — a listing-based
    read would double-count the orphan's rows and break the hash.
    Multi-batch (replay source, ~10 micro-batches), append mode."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    tmp = tempfile.mkdtemp(prefix="q395_filesink_")
    out_dir = tmp + "/out"
    try:
        stream = (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
            .select("event_id", "event_type", "value")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", tmp + "/ck")
            .outputMode("append")
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            import time as _time

            idle, t0 = 0, _time.time()
            while idle < 5 and _time.time() - t0 < 240:
                _time.sleep(0.3)
                p = q.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            q.stop()
            q.awaitTermination()
        if not os.path.isdir(out_dir + "/_spark_metadata"):
            raise RuntimeError("q395: file sink wrote no _spark_metadata log")
        # plant an orphan: copy a committed part file under an
        # uncommitted name — exactly what a crashed-then-retried task
        # leaves behind. The metadata-log file index must ignore it.
        parts = sorted(_glob.glob(out_dir + "/part-*.parquet"))
        if not parts:
            raise RuntimeError("q395: file sink produced no part files")
        shutil.copy(parts[0], out_dir + "/part-99999-orphan.c000.snappy.parquet")
        back = spark.read.parquet(out_dir)
        res = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
        out = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _stream_join_sides(spark: SparkSession, sf_dir: str):
    """Purchase / error replay-source sides shared by the
    stream-stream join-type matrix (q318 outer, q370 full outer,
    q396 semi, q397 anti): both streams replay the same events file
    in ~10 micro-batches with a 2-hour watermark."""
    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)

    def src() -> DataFrame:
        return (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
        )

    pur = (
        src().filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    err = (
        src().filter(F.col("event_type") == "error")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
    )
    cond = (
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("e_ts") <= F.col("p_ts"))
    )
    return pur, err, cond


def _drain_foreach_parquet(spark: SparkSession, joined: DataFrame,
                           out_root: str) -> DataFrame:
    """Run a streaming frame into an append parquet foreachBatch sink
    until the replay sources go idle; return the written rows."""
    import time as _time

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_root}/rows")

    query = (
        joined.writeStream.foreachBatch(sink)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, _time.time()
        while idle < 5 and _time.time() - t0 < 240:
            _time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    return spark.read.parquet(f"{out_root}/rows")


@register(
    "q396_streaming_semi_join",
    oracle=f"""
WITH pur AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT user_id AS e_user, ts AS e_ts
  FROM events WHERE event_type = 'error'
),
survivors AS (
  SELECT DISTINCT p.p_id, p.p_user, p.p_value
  FROM pur p JOIN err e
    ON e.e_user = p.p_user
   AND e.e_ts >= p.p_ts - INTERVAL 30 MINUTE
   AND e.e_ts <= p.p_ts
)
SELECT p_user AS user_id,
       COUNT(*) AS n_flagged,
       {sql_dsum('p_value')} AS flagged_value_sum
FROM survivors GROUP BY p_user
""",
    tags=("streaming", "true_stream", "semi_join", "watermark"),
)
def q396_streaming_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT SEMI join (Spark 3.4+): emit each
    purchase AT MOST ONCE as soon as SOME error from the same user
    lands in its 30-minute lookback window — the streaming
    existence-test (fraud-style flagging: "purchase preceded by an
    error"), distinct from inner (q318's shape would re-emit per
    match) and from outer (no null rows). State semantics: the left
    row is held until matched (then marked, never re-emitted) or
    evicted by the watermark; right rows are held only within the
    interval bound. Output is left-columns-only by definition —
    the grade censuses flagged purchases per user, which catches
    both failure modes: a per-match duplicate emission overcounts
    vs the DISTINCT oracle, a dropped match undercounts."""
    import shutil
    import tempfile

    pur, err, cond = _stream_join_sides(spark, sf_dir)
    joined = pur.join(err, cond, "leftSemi")
    out_root = tempfile.mkdtemp(prefix="q396_semi_")
    try:
        rows = _drain_foreach_parquet(spark, joined, out_root)
        res = rows.groupBy(F.col("p_user").alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_flagged"),
            dsum(F.col("p_value")).alias("flagged_value_sum"),
        )
        out = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q397_streaming_anti_join",
    # Anti rows follow the same strict left-side eviction cut pinned
    # for q318/q370's unmatched-left family: a purchase with no match
    # emits once the final global watermark — min of both sources'
    # max event times minus the 2 h delay — passes STRICTLY above its
    # latest possible match time (p_ts itself, since the error window
    # ends at the purchase). Rows at-or-above the cut stay in state.
    oracle=f"""
WITH pur AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT user_id AS e_user, ts AS e_ts
  FROM events WHERE event_type = 'error'
),
matched AS (
  SELECT DISTINCT p.p_id
  FROM pur p JOIN err e
    ON e.e_user = p.p_user
   AND e.e_ts >= p.p_ts - INTERVAL 30 MINUTE
   AND e.e_ts <= p.p_ts
),
wm AS (
  SELECT LEAST((SELECT MAX(p_ts) FROM pur),
               (SELECT MAX(e_ts) FROM err)) - INTERVAL 2 HOUR AS w
)
SELECT p.p_user AS user_id,
       COUNT(*) AS n_clean,
       {sql_dsum('p.p_value')} AS clean_value_sum
FROM pur p
LEFT JOIN matched m ON p.p_id = m.p_id
WHERE m.p_id IS NULL AND p.p_ts < (SELECT w FROM wm)
GROUP BY p.p_user
""",
    tags=("streaming", "true_stream", "anti_join", "watermark"),
)
def q397_streaming_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT ANTI join (Spark 3.4+), completing the
    streaming join-type matrix (inner q318-shape / left+full outer
    q318+q370 / semi q396 / anti here): emit each purchase exactly
    once when the WATERMARK PROVES no error from that user can ever
    arrive in its 30-minute lookback — the streaming non-existence
    test ("purchase with a clean error history"), which is
    fundamentally watermark-gated: unlike semi, a match can only be
    disproven by time passing, never by data arriving. Spark has NO
    native streaming left-anti (`leftAnti` with a streaming right
    side raises AnalysisException, verified on 4.1.2), so the engine
    composes it the only semantics-preserving way: the watermarked
    LEFT OUTER interval join filtered to its null-partner rows —
    outer emits an unmatched left row exactly once, exactly when the
    watermark proves no partner can arrive, which IS the anti
    contract. Purchases still inside the final watermark remain in
    state unemitted (the production steady-state), and the oracle
    reproduces the strict eviction cut exactly — an early emission
    (before the watermark proof) would be a false positive on any
    fixture where the match arrives late."""
    import shutil
    import tempfile

    pur, err, cond = _stream_join_sides(spark, sf_dir)
    joined = pur.join(err, cond, "leftOuter").filter(F.col("e_id").isNull())
    out_root = tempfile.mkdtemp(prefix="q397_anti_")
    try:
        rows = _drain_foreach_parquet(spark, joined, out_root)
        res = rows.groupBy(F.col("p_user").alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_clean"),
            dsum(F.col("p_value")).alias("clean_value_sum"),
        )
        out = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q409_streaming_join_then_agg",
    # Emission cut follows q354's empirical pin: with an event-time-
    # ORDERED replay and 0-second watermarks on both join sides, the
    # final no-data batch advances the query watermark to
    # min(max purchase ts, max error ts) and the downstream hourly
    # aggregation flushes windows with end <= watermark (non-strict).
    oracle=f"""
WITH pur AS (
  SELECT user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT user_id AS e_user, ts AS e_ts, value AS e_value
  FROM events WHERE event_type = 'error'
),
pairs AS (
  SELECT p.p_ts, e.e_value
  FROM pur p JOIN err e
    ON e.e_user = p.p_user
   AND e.e_ts >= p.p_ts - INTERVAL 30 MINUTE
   AND e.e_ts <= p.p_ts
),
wm AS (
  SELECT LEAST((SELECT MAX(p_ts) FROM pur),
               (SELECT MAX(e_ts) FROM err)) AS w
)
SELECT strftime(date_trunc('hour', p_ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       COUNT(*) AS n_pairs,
       {sql_dsum('e_value')} AS err_value_sum
FROM pairs, wm
WHERE date_trunc('hour', p_ts) + INTERVAL 1 HOUR <= wm.w
GROUP BY date_trunc('hour', p_ts)
""",
    tags=("streaming", "true_stream", "multi_stateful", "join_then_agg"),
)
def q409_streaming_join_then_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM JOIN CHAINED INTO A WINDOWED AGGREGATION — the
    second multiple-stateful-operator pair (q354 chained agg->agg;
    this chains join->agg, the production "enrich then roll up"
    shape: match purchases to their error context as both streams
    arrive, and serve an hourly SLA census off the matched pairs,
    in ONE query with ONE state lifecycle instead of a join job, an
    intermediate topic, and an agg job). Both sides carry the same
    event-time watermark; matched pairs flow to the hourly window
    keyed on the PURCHASE time, and a window finalizes only when the
    watermark — propagated THROUGH the join — passes its end. A
    mis-propagated watermark (the classic multi-stateful bug Spark
    3.4 fixed) either flushes windows early (missing late-batch
    matches) or never flushes them; both break the bit-exact match
    with the drained-to-exhaustion oracle."""
    import time as _time
    import uuid as _uuid

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)

    def src() -> DataFrame:
        return (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .option("orderBy", "ts,event_id")
            .load()
        )

    pur = (
        src().filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "0 seconds")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    err = (
        src().filter(F.col("event_type") == "error")
        .withWatermark("ts", "0 seconds")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
    )
    joined = pur.join(
        err,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("e_ts") <= F.col("p_ts")),
        "inner",
    )
    hourly = (
        joined.groupBy(F.window("p_ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(F.col("e_value")).alias("err_value_sum"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_pairs",
            "err_value_sum",
        )
    )
    name = "joinagg_" + _uuid.uuid4().hex[:8]
    query = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        idle, t0 = 0, _time.time()
        while idle < 3 and _time.time() - t0 < 180:
            _time.sleep(0.3)
            p = query.lastProgress
            if p is None:
                continue
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    finally:
        query.stop()
        query.awaitTermination()
    sink = spark.table(name)
    out = spark.createDataFrame(sink.collect(), sink.schema)
    spark.catalog.dropTempView(name)
    return out


@register(
    "q411_streaming_fanout_sinks",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS value_sum,
       CAST(0 AS BIGINT) AS sink_divergence
FROM events
GROUP BY event_type
""",
    tags=("streaming", "true_stream", "foreachbatch", "fanout"),
)
def q411_streaming_fanout_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAN-OUT TO TWO SINKS from one foreachBatch — the production
    "write the lake AND the serving store" pattern, with the
    documented footgun pinned: `batch_df` is LAZY inside
    foreachBatch, so writing it twice re-executes the micro-batch
    lineage per sink (twice the IO; with a non-deterministic
    transform, DIVERGENT sinks). The correct form persists the batch
    frame, writes both sinks from the cached copy, then unpersists —
    exactly what this query does per micro-batch. Graded on three
    properties at once: sink A's census matches the batch oracle
    (no loss), and sink_divergence — the count of (event_type)
    census cells where A and B disagree, computed by full-outer
    joining the two sinks' censuses — must be exactly 0 (the
    consistency contract fan-out exists to provide)."""
    import shutil
    import tempfile
    import time as _time

    import pyarrow.parquet as pq

    from cli_spark.sources.replay_datasource import register_replay_source

    register_replay_source(spark)
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    batch_rows = max(1, (n_rows + 9) // 10)
    out_root = tempfile.mkdtemp(prefix="q411_fanout_")
    try:
        stream = (
            spark.readStream.format("replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batchRows", batch_rows)
            .load()
            .select("event_id", "event_type", "value")
        )

        def fanout(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.write.mode("append").parquet(out_root + "/a")
                batch_df.write.mode("append").parquet(out_root + "/b")
            finally:
                batch_df.unpersist()

        query = (
            stream.writeStream.foreachBatch(fanout)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, _time.time()
            while idle < 5 and _time.time() - t0 < 240:
                _time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()

        def census(path: str, prefix: str) -> DataFrame:
            return spark.read.parquet(path).groupBy("event_type").agg(
                F.count(F.lit(1)).alias(f"{prefix}_n"),
                dsum(F.col("value")).alias(f"{prefix}_sum"),
            )

        a = census(out_root + "/a", "a")
        b = census(out_root + "/b", "b")
        joined = a.join(b, "event_type", "full_outer")
        diverged = joined.filter(
            ~(F.col("a_n").eqNullSafe(F.col("b_n"))
              & F.col("a_sum").eqNullSafe(F.col("b_sum")))
        ).count()
        res = joined.select(
            "event_type",
            F.col("a_n").alias("n_events"),
            F.col("a_sum").alias("value_sum"),
            F.lit(int(diverged)).cast("long").alias("sink_divergence"),
        )
        out = spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return out


@register(
    "q414_statestore_join_reader",
    # State retention mirrors the emission cuts pinned in q318/q370:
    # a LEFT (purchase) row leaves join state when the final global
    # watermark — min of both sides' max event times minus the 2 h
    # delay — passes STRICTLY above p_ts; a RIGHT (error) row when it
    # passes strictly above e_ts + 30 min. Rows at-or-above the cut
    # are still buffered when the query stops, and THOSE are what the
    # statestore reader must see.
    oracle=f"""
WITH pur AS (
  SELECT ts AS p_ts FROM events WHERE event_type = 'purchase'
),
err AS (
  SELECT ts AS e_ts FROM events WHERE event_type = 'error'
),
wm AS (
  SELECT LEAST((SELECT MAX(p_ts) FROM pur),
               (SELECT MAX(e_ts) FROM err)) - INTERVAL 2 HOUR AS w
)
SELECT 'left' AS side,
       CAST((SELECT COUNT(*) FROM pur, wm WHERE p_ts >= wm.w) AS BIGINT)
         AS n_state_rows
UNION ALL
SELECT 'right',
       CAST((SELECT COUNT(*) FROM err, wm
             WHERE e_ts + INTERVAL 30 MINUTE >= wm.w) AS BIGINT)
""",
    tags=("streaming", "statestore", "join_state", "reader"),
)
def q414_statestore_join_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE READER over a STREAM-STREAM JOIN checkpoint (the
    `joinSide` option of the Spark 4 statestore source — q371 read
    an AGGREGATION's state; join state is the harder operational
    target because BOTH sides buffer rows and the watermark, not the
    data, decides retention): after a purchase x error interval join
    drains, each side's state store must hold EXACTLY the rows the
    final watermark has not yet released — the production
    steady-state inventory an operator inspects when join state
    balloons (the #1 stream-stream incident: a stalled source pins
    the watermark and the other side buffers forever). The graded
    census reads both sides' buffered-row counts from the checkpoint
    and they must equal the watermark-cut oracle exactly — a row
    evicted early would have broken q318/q370's output grades; a row
    retained past its cut shows up ONLY here, which is why the state
    reader is graded separately from the join output."""
    import shutil
    import tempfile
    import time as _time

    pur, err, cond = _stream_join_sides(spark, sf_dir)
    joined = pur.join(err, cond, "inner")
    ckpt = tempfile.mkdtemp(prefix="q414_ckpt_")
    out_root = tempfile.mkdtemp(prefix="q414_out_")
    try:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(f"{out_root}/rows")

        query = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            idle, t0 = 0, _time.time()
            while idle < 5 and _time.time() - t0 < 240:
                _time.sleep(0.3)
                p = query.lastProgress
                if p is None:
                    continue
                idle = idle + 1 if p["numInputRows"] == 0 else 0
        finally:
            query.stop()
            query.awaitTermination()
        left = (
            spark.read.format("statestore")
            .option("path", ckpt).option("joinSide", "left").load()
        )
        right = (
            spark.read.format("statestore")
            .option("path", ckpt).option("joinSide", "right").load()
        )
        rows = [("left", left.count()), ("right", right.count())]
        out = spark.createDataFrame(rows, "side string, n_state_rows long")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
    return out
