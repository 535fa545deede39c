"""Source/sink round-trips: partitioned parquet (layout + pruning),
CSV, JSON-lines, text."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_spark.sources import sinks
from cli_spark.tables import load_table


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    sinks.write_partitioned_parquet(o, out, ["o_orderstatus", "o_year"])

    back = spark.read.parquet(out)
    assert back.count() == o.count()

    # partition pruning: a filter on the partition col must reach the scan
    pruned = back.filter((F.col("o_orderstatus") == "O") & (F.col("o_year") == 1997))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expected = o.filter((F.col("o_orderstatus") == "O") & (F.col("o_year") == 1997)).count()
    assert pruned.count() == expected


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    n = load_table(spark, sf_dir, "nation")
    n.write.option("header", "true").mode("overwrite").csv(out)
    back = sinks.read_csv(
        spark, out, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(back.collect()) == sorted(n.collect())


def test_json_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_json")
    r = load_table(spark, sf_dir, "region")
    r.write.mode("overwrite").json(out)
    back = sinks.read_json(spark, out, "r_regionkey int, r_name string")
    assert sorted(back.select("r_regionkey", "r_name").collect()) == sorted(r.collect())


def test_text_scan(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = sinks.read_text(spark, str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == ["alpha", "beta", "gamma"]


def test_bucketed_cobucket_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-bucketed orders ⋈ lineitem must plan with zero Exchange on
    either side — the write-once-shuffle-never join layout."""
    from cli_spark.sources import bucketing

    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "orderkey")
    l = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    bucketing.write_bucketed(o, "t_orders_b", str(tmp_path / "ob"), "orderkey")
    bucketing.write_bucketed(l, "t_lineitem_b", str(tmp_path / "lb"), "orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale the planner would broadcast (and rightly skip
        # bucketing); at 100 TB both sides are fact tables — force the
        # SMJ path the layout exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.cobucket_join(spark, "t_orders_b", "t_lineitem_b", "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness: same result as the plain (shuffling) join
        expected = o.join(l, "orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lineitem_orc")
    l = load_table(spark, sf_dir, "lineitem")
    sinks.write_orc(l, out)
    back = sinks.read_orc(spark, out)
    assert back.count() == l.count()
    filtered = back.filter(F.col("l_quantity") > 25).select("l_orderkey", "l_quantity")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    assert filtered.count() == l.filter(F.col("l_quantity") > 25).count()


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a filter on a joined dimension must prune partitions of a
    partitioned fact at *runtime* (the plan carries a
    dynamicpruning subquery on the partition column) — the mechanism
    that turns star joins over date-partitioned 100 TB facts into
    few-partition scans."""
    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    sinks.write_partitioned_parquet(o, out, ["o_year"])
    fact = spark.read.parquet(out)
    # the dim must come from storage — a literal dim would be
    # constant-folded into a STATIC partition filter (no DPP needed)
    dim_path = str(tmp_path / "dim_years")
    spark.createDataFrame(
        [(1995, "other"), (1996, "target"), (1997, "other")], "dim_year int, tag string"
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "target")

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    try:
        # at this scale the broadcast-reuse heuristic would veto DPP;
        # allow the standalone-subquery form so the mechanism is visible
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
        joined = fact.join(dim, fact["o_year"] == dim["dim_year"]).select("o_orderkey", "o_year", "tag")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        expected = o.filter(F.col("o_year") == 1996).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)


def test_jdbc_round_trip_embedded_derby(spark, sf_dir):
    """A10/A12 round-trip against a REAL database engine: the embedded
    Derby bundled with Spark's jars (no server process — the JVM hosts
    the DB in-memory). overwrite mode exercises Spark's JDBC DDL path
    (CREATE TABLE from the DataFrame schema [A12]); the batched INSERT
    path [A10] loads the rows; the partitioned read splits the scan
    into range-predicated parallel queries."""
    url = "jdbc:derby:memory:cli_spark_test;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    sinks.write_jdbc(src, url, "nation_copy", mode="overwrite", **props)

    back = sinks.read_jdbc(
        spark, url, "nation_copy",
        partition_column="n_nationkey", lower_bound=0, upper_bound=24,
        num_partitions=4, **props,
    )
    assert back.rdd.getNumPartitions() == 4  # parallel range scan
    assert back.count() == src.count() == 25
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0

    # append mode [A10 incremental load]: rows double, no DDL re-run
    sinks.write_jdbc(src, url, "nation_copy", mode="append", **props)
    assert sinks.read_jdbc(spark, url, "nation_copy", **props).count() == 50


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """XML source/sink (built-in format("xml") since Spark 4): write
    the nation dim as one element per row, read back with an explicit
    schema, values identical."""
    out = str(tmp_path / "nation_xml")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sinks.write_xml(n, out, row_tag="nation")
    back = sinks.read_xml(
        spark, out, "n_nationkey int, n_name string, n_regionkey int",
        row_tag="nation",
    )
    src = n.select(
        F.col("n_nationkey").cast("int"), "n_name", F.col("n_regionkey").cast("int")
    )
    assert back.count() == 25
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_read_jdbc_rejects_partition_column_without_bounds(spark):
    """ADVICE r5: partition_column without both bounds must raise a
    clear ValueError instead of passing the literal string 'None' as
    a JDBC option and failing with a parse error at runtime."""
    import pytest

    from cli_spark.sources.sinks import read_jdbc

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:derby:memory:x", "t",
                  partition_column="id", lower_bound=None, upper_bound=None)


def test_checksum_python_datasource_writer(spark, tmp_path):
    """Spark 4 Python DataSource WRITER: the checksum sink's manifest
    is partitioning- and order-independent (xor fold), matches an
    independently computed reference, and abort leaves nothing."""
    import json

    from cli_spark.sources.checksum_sink import (
        _row_hash48,
        register_checksum_sink,
    )
    from cli_spark.tables import load_table

    register_checksum_sink(spark)
    d = load_table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    out1 = str(tmp_path / "m1")
    d.repartition(7).write.format("checksum").option("path", out1).mode(
        "append"
    ).save()
    out2 = str(tmp_path / "m2")
    d.orderBy(F.col("n_name").desc()).coalesce(1).write.format("checksum").option(
        "path", out2
    ).mode("append").save()
    m1 = json.load(open(f"{out1}/manifest.json"))
    m2 = json.load(open(f"{out2}/manifest.json"))
    assert m1["row_count"] == 25 and m2["row_count"] == 25
    assert m1["checksum48"] == m2["checksum48"]  # order/partition invariant
    assert m1["n_tasks"] == 7 and m2["n_tasks"] == 1
    # independent reference fold
    rows = d.collect()
    ref = 0
    for r in rows:
        ref ^= _row_hash48([r["n_nationkey"], r["n_name"]])
    assert m1["checksum48"] == ref


def test_checksum_stream_writer_commit_is_idempotent(tmp_path):
    """A crash-replayed micro-batch re-commits under the SAME batch id
    — the manifest must be overwritten (atomic rename), never
    duplicated, and a different batch id lands in its own file."""
    from pyspark.sql.types import StructType, StructField, StringType
    from cli_spark.sources.checksum_sink import (
        ChecksumCommit,
        ChecksumStreamWriter,
    )

    schema = StructType([StructField("k", StringType())])
    w = ChecksumStreamWriter({"path": str(tmp_path)}, schema)
    msgs = [ChecksumCommit(3, 0xABC), ChecksumCommit(2, 0xDEF)]
    w.commit(msgs, 7)
    w.commit(msgs, 7)          # replay of the same batch
    w.commit([ChecksumCommit(1, 0x1)], 8)
    import json
    import os

    files = sorted(f for f in os.listdir(tmp_path) if f.startswith("batch_"))
    assert files == ["batch_7.json", "batch_8.json"]
    j7 = json.load(open(tmp_path / "batch_7.json"))
    assert j7["row_count"] == 5 and j7["checksum48"] == (0xABC ^ 0xDEF)
    assert j7["n_tasks"] == 2
    # no tmp leftovers
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
