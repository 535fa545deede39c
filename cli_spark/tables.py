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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, applying per-table normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        # ts arrives as int64 nanos under nanosAsLong (session.py).
        # Integer division — see module docstring.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
