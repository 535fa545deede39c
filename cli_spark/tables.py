"""Canonical loaders for the driver's parquet tables.

One loader per table so every query in the registry reads through the
same normalization (the only non-trivial one is ``events``). Schemas
are fixed by the driver (FIXTURES.md §A) — never inferred beyond the
parquet footer, and the ``events.ts`` rebuild is done with *integer*
nanos→micros division: int64 nanosecond values (~1.7e18) exceed
double's 53-bit mantissa, so a float division would corrupt low-order
digits before truncation. ``ts div 1000`` matches DuckDB's native
nanos→micros truncation bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables — always broadcast-join these against facts.
# At 100 TB the facts (lineitem/orders/events) scale; these stay tiny.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def normalize_timestamps(df: DataFrame, table: str | None = None) -> DataFrame:
    """Normalize driver timestamp encodings to session-TZ TIMESTAMP.

    The driver's parquet has shipped two encodings across rounds:
    TIMESTAMP(NANOS) (read as int64 under nanosAsLong — rounds 1–3)
    and TIMESTAMP_NTZ(MICROS) (round 4+). Both are rebuilt to
    TimestampType so every downstream query sees one type. With the
    session pinned to UTC (session.py) the NTZ→TZ cast is a pure
    reinterpretation — wall-clock values, and hence DuckDB-oracle
    parity, are unchanged.

    The bigint rebuild is scoped to ``events.ts`` — only that column
    is known to carry int64 nanos; a name-based heuristic over every
    table would silently corrupt a future genuine bigint ``ts``.
    """
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if table == "events" and f.name == "ts" and t == "bigint":
            # int64 nanos → micros with INTEGER division: nanos
            # (~1.7e18) exceed double's 53-bit mantissa, so a float
            # path would corrupt low-order digits. `div` matches
            # DuckDB's nanos→micros truncation bit-for-bit.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif t == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, applying per-table normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return normalize_timestamps(spark.read.parquet(path), table=name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same timestamp
    normalization as :func:`load_table` (streams can't infer schemas,
    so the batch footer schema seeds the reader).

    The driver testdata ships `events.parquet` as a single FILE (so
    the stream reads the parent dir with a pathGlobFilter — Spark's
    file stream source wants a directory); Spark-written datasets
    (e.g. the synthetic sf1 scale-up) have it as a DIRECTORY of part
    files, which streams directly."""
    path = os.path.join(sf_dir, "events.parquet")
    batch_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(batch_schema)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return normalize_timestamps(stream, table="events")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
