"""Contract tests for the pushpq filter-pushdown Python DataSource
(cli_spark/sources/pushdown_parquet.py, graded end-to-end by q402):
pushFilters claims only single-column >=/= filters on data columns,
partitions() prunes row groups on column statistics, and read()
applies every claimed filter exactly (Spark does not re-evaluate)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    GreaterThanOrEqual,
    IsNotNull,
    StringContains,
)

from cli_spark.sources.pushdown_parquet import (
    PushdownParquetReader,
    register_pushdown_source,
)


@pytest.fixture(scope="module")
def sorted_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pushpq") / "ev.parquet")
    n = 1000
    tbl = pa.table({
        "event_type": pa.array(["t" + str(i % 3) for i in range(n)]),
        "value": pa.array([float(i) for i in range(n)]),
    })
    pq.write_table(tbl, path, row_group_size=100)  # 10 row groups
    return path


def test_push_filters_claims_supported_returns_rest(sorted_file):
    r = PushdownParquetReader({"path": sorted_file})
    ge = GreaterThanOrEqual(attribute=("value",), value=500.0)
    notnull = IsNotNull(attribute=("event_type",))
    contains = StringContains(attribute=("event_type",), value="t1")
    rest = list(r.pushFilters([ge, notnull, contains]))
    # >= claimed; IsNotNull / StringContains handed back to Spark
    assert rest == [notnull, contains]
    assert r._pushed == [("value", "ge", 500.0)]


def test_partitions_prune_row_groups_on_stats(sorted_file):
    r = PushdownParquetReader({"path": sorted_file})
    list(r.pushFilters([GreaterThanOrEqual(attribute=("value",),
                                           value=500.0)]))
    parts = r.partitions()
    # values 0..999 in 10 groups of 100: groups 0-4 have max < 500
    assert len(parts) == 5
    assert all(p.n_total == 10 and p.n_planned == 5 for p in parts)


def test_read_applies_claimed_filter_exactly(sorted_file):
    r = PushdownParquetReader({"path": sorted_file})
    list(r.pushFilters([GreaterThanOrEqual(attribute=("value",),
                                           value=555.0)]))
    parts = r.partitions()  # group 5 (500-599) partially matches
    rows = []
    for p in parts:
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    vals = sorted(row["value"] for row in rows)
    assert vals[0] == 555.0 and vals[-1] == 999.0 and len(vals) == 445


def test_end_to_end_census_matches_plain_scan(spark, sorted_file):
    register_pushdown_source(spark)
    key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        got = (
            spark.read.format("pushpq").option("path", sorted_file).load()
            .filter(F.col("value") >= 500.0)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )
        exp = (
            spark.read.parquet(sorted_file)
            .filter(F.col("value") >= 500.0)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )
        g = {r["event_type"]: (r["n"], r["s"]) for r in got.collect()}
        e = {r["event_type"]: (r["n"], r["s"]) for r in exp.collect()}
        assert g == e
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
