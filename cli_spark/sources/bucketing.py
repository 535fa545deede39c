"""Bucketed-table layout — shuffle-free co-located joins.

At 100 TB the dominant cost of `orders ⋈ lineitem` is shuffling both
fact tables on the join key for every query that joins them. Bucketing
pays that shuffle ONCE at write time: `bucketBy(N, key)` hash-splits
each table into N files per partition using Spark's own hash, and
`sortBy(key)` pre-sorts within buckets. Every later equi-join (or
aggregation) on the key then reads matching buckets pairwise — the
physical plan has **no Exchange** on the bucketed sides (asserted in
tests/test_sinks.py).

Rules that make it work (all encoded here):
* both sides bucketed by the SAME column set and bucket count;
* `spark.sql.sources.bucketing.enabled` on (default);
* read back via the table catalog (`spark.table`) — bucketing metadata
  lives in the metastore, a plain `.parquet(path)` read discards it;
* bucket count chosen so one bucket × columns fits an executor core
  (at 100 TB with 1000 executors: thousands of buckets, not 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist `df` as a bucketed+sorted table (external, at `path`)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def cobucket_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans as a
    SortMergeJoin with zero Exchange (bucket-local merge)."""
    return spark.table(left_table).join(spark.table(right_table), key)
