"""Focused tests for cli_spark.streaming.drain — the round-15
optimization that replaced the sketch queries' per-batch parquet
append + read-back with driver-side accumulation of the (bounded,
sketch-grain) partials. Asserts the helper's contract directly:
every batch's partial rows survive, the schema is the partial plan's
schema, batch ids tag rows correctly across >= 2 real micro-batches,
and the footer row count matches a Spark count of the same file."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cli_spark.sources.replay_datasource import register_replay_source
from cli_spark.streaming.drain import drain_partials, replay_row_count


@pytest.fixture()
def replay_part(spark):
    tmp = tempfile.mkdtemp(prefix="drain_test_")
    df = spark.range(0, 97).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
    )
    df.repartition(1).sortWithinPartitions("id").write.mode(
        "overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    yield part
    shutil.rmtree(tmp, ignore_errors=True)


def test_drain_partials_accumulates_every_batch(spark, replay_part):
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", replay_part)
        .option("batchRows", 25)  # 97 rows -> 4 micro-batches
        .load()
    )

    def partial_of(batch_df, batch_id):
        return (
            batch_df.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )

    parts = drain_partials(spark, stream, partial_of)
    rows = parts.collect()
    batch_ids = sorted({r["batch_id"] for r in rows})
    assert len(batch_ids) >= 2, "must see multiple real micro-batches"
    # ADDITION merge of the drained partials == the all-rows census
    merged = {
        r["grp"]: r["s"]
        for r in parts.groupBy("grp").agg(
            F.sum("c").cast("long").alias("s")).collect()
    }
    exact = {i: len([x for x in range(97) if x % 7 == i]) for i in range(7)}
    assert merged == exact
    assert [f.name for f in parts.schema.fields] == ["grp", "c", "batch_id"]
    assert {f.dataType.simpleString() for f in parts.schema.fields} == {"bigint"}


def test_replay_row_count_matches_spark_count(spark, replay_part):
    assert replay_row_count(replay_part) == 97
    assert spark.read.parquet(replay_part).count() == 97


def test_drain_partials_keeps_empty_partials(spark, replay_part):
    """A batch whose partial is EMPTY (the q479 Misra-Gries case)
    contributes no rows but must not break accumulation or schema."""
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", replay_part)
        .option("batchRows", 40)
        .load()
    )

    def partial_of(batch_df, batch_id):
        # drop everything from odd batches — an always-empty partial
        return (
            batch_df.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .filter(F.lit(batch_id % 2 == 0))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )

    parts = drain_partials(spark, stream, partial_of)
    ids = {r["batch_id"] for r in parts.collect()}
    assert ids and all(i % 2 == 0 for i in ids)


def test_drain_partials_rejects_fact_grain_streams(spark, replay_part, monkeypatch):
    """The sketch-grain contract is enforced in code (round-16,
    VERDICT r15 item 2): a partial that ships the batch's FACT rows
    (here: every input row, with the ceiling lowered so the fixture
    trips it) must raise instead of silently accumulating on the
    driver."""
    import cli_spark.streaming.drain as drain_mod

    monkeypatch.setattr(drain_mod, "MAX_PARTIAL_ROWS_PER_BATCH", 10)
    register_replay_source(spark)
    stream = (
        spark.readStream.format("replay")
        .option("path", replay_part)
        .option("batchRows", 25)
        .load()
    )

    def fact_grain(batch_df, batch_id):
        return batch_df.withColumn("batch_id", F.lit(batch_id).cast("long"))

    from pyspark.errors import StreamingQueryException

    with pytest.raises((ValueError, StreamingQueryException), match="sketch-grain"):
        drain_mod.drain_partials(spark, stream, fact_grain)
