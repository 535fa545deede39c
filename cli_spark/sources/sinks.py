"""Sources & sinks beyond the default parquet scan (SURVEY.md §2
"Scans / sources / sinks"): CSV / JSON / text scans, partitioned
parquet sink, and the JDBC bulk-load path re-expressing the
reference's database import [A10/A12].

No database runs in this container, so the JDBC writer is exercised
through its plan-construction path and gated on a connection being
supplied; the parquet/CSV/JSON round-trips are fully tested
(tests/test_sinks.py). The partitioned sink is the 100 TB layout
tool: partition columns become directory pruning keys for every
downstream scan (dynamic partition pruning does the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str],
                              mode: str = "overwrite") -> None:
    """Partitioned parquet sink — the canonical big-data layout
    (one directory level per partition column; scans prune on them)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV scan with an explicit schema (never inferSchema in
    production — schema inference is an extra full pass at 100 TB)."""
    return spark.read.option("header", "true").schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema (same rationale)."""
    return spark.read.schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw text scan: one row per line, single `value` column."""
    return spark.read.text(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format Spark reads
    natively (vectorized reader, predicate pushdown, like parquet)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              mode: str = "overwrite") -> None:
    """XML sink (built-in `format("xml")` since Spark 4) — the
    interchange format legacy feeds still ship; one element per row."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(spark: SparkSession, path: str, schema: str,
             row_tag: str = "row") -> DataFrame:
    """XML scan with an explicit schema (same no-inference rationale
    as CSV/JSON: inference is an extra full pass at 100 TB)."""
    return (
        spark.read.format("xml").option("rowTag", row_tag)
        .schema(schema).load(path)
    )


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batchsize: int = 10_000, **properties: str) -> None:
    """JDBC bulk insert [A10] — the reference's `gmalt-hgtload` sink.

    Batched inserts per partition; `numPartitions` on the reader side
    and `df.repartition(n)` on the writer side bound connection
    fan-out. For true Postgres bulk speed, COPY-protocol loading via a
    per-partition psycopg2 connection inside mapInPandas beats row
    INSERTs ~10×; that variant needs a live server and lives behind
    this same signature when one exists.
    """
    props = {"batchsize": str(batchsize), **properties}
    df.write.mode(mode).options(**props).jdbc(url, table)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 1, **properties: str) -> DataFrame:
    """JDBC source. With a numeric `partition_column` + bounds the scan
    splits into `num_partitions` range-predicated queries that run in
    parallel across executors — the only way a JDBC read scales past
    one connection. Tested round-trip against the embedded Derby
    engine bundled with Spark (tests/test_sinks.py)."""
    reader = spark.read.options(**properties)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would silently become the literal option value
            # "None" and fail deep in the JDBC reader with a parse error
            raise ValueError(
                "read_jdbc: partition_column requires both lower_bound "
                "and upper_bound (got "
                f"lower_bound={lower_bound!r}, upper_bound={upper_bound!r})"
            )
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.jdbc(url, table)
