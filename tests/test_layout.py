"""Layout/pruning operator invariants beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_spark.plans.registry import registry


def test_bloom_never_false_negative(spark, sf_dir):
    """The defining Bloom property: every true member passes the
    filter. (False positives are allowed and audited; a single false
    negative makes the pruning unsound.)"""
    row = registry()["q115_bloom_filter_probe"].fn(spark, sf_dir).collect()[0]
    assert row["false_negatives"] == 0
    assert row["bloom_candidates"] >= row["true_members"]


def test_zorder_buckets_are_locally_tight(spark, sf_dir):
    """Z-bucket locality: within one z-bucket both dimensions' spans
    must be bounded by the bucket's bit budget (a 16384-wide z-range
    constrains each interleaved dim to a 128-wide span — 7 low bits
    per dimension)."""
    rows = registry()["q113_zorder_locality"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_cust"] - r["min_cust"] <= 127
        assert r["max_day"] - r["min_day"] <= 127


def test_registry_rotation_invariants():
    """Guards for the driver-window rotation machinery: names unique
    and well-formed, every oracle a non-empty SQL string, the rotation
    sets reference real queries, and the graded head (first 50 of the
    driver ordering) contains every _ROUND_CHANGED entry — a typo in
    either set would silently un-grade a changed query."""
    from cli_spark.plans.registry import (
        _DRIVER_GRADED,
        _ROUND_CHANGED,
        _ordered_specs,
        registry,
    )

    reg = registry()
    names = [s.name for s in _ordered_specs()]
    assert len(names) == len(set(names)) == len(reg)
    for n, spec in reg.items():
        assert n.startswith("q"), n
        assert spec.oracle is None or (
            isinstance(spec.oracle, str) and spec.oracle.strip()
        ), n
    assert set(_ROUND_CHANGED) <= set(reg), set(_ROUND_CHANGED) - set(reg)
    assert set(_DRIVER_GRADED) <= set(reg), set(_DRIVER_GRADED) - set(reg)
    head = set(names[:50])
    missing = [n for n in _ROUND_CHANGED if n not in head]
    assert not missing, f"changed queries outside the graded head: {missing}"


def test_normalize_timestamps_bigint_rebuild_scoped_to_events(spark):
    """The int64-nanos→micros ts rebuild applies ONLY to the events
    table: a different table with a genuine bigint `ts` column must
    pass through untouched (the name-based heuristic would silently
    corrupt it), while the NTZ→TZ cast stays generic."""
    from cli_spark.tables import normalize_timestamps

    df = spark.createDataFrame([(1, 1700000000000000000)], "id long, ts long")
    out = normalize_timestamps(df, table="other")
    assert dict(out.dtypes)["ts"] == "bigint"  # untouched
    assert out.collect()[0]["ts"] == 1700000000000000000

    ev = normalize_timestamps(df, table="events")
    assert dict(ev.dtypes)["ts"] == "timestamp"  # rebuilt for events


def test_bucketed_smb_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Storage bucketing eliminates the join shuffle entirely: two
    tables written bucketBy(4, key) + sortBy(key) join with NO
    Exchange and NO explicit Sort on the probe path — the co-located,
    co-sorted join a 100 TB star schema relies on (bucket the fact
    table once, every subsequent join on that key is shuffle-free).
    Broadcast is disabled to force the merge path; the assert is that
    bucketing, not broadcast, removed the exchanges."""
    from cli_spark.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    (o.write.format("parquet").bucketBy(4, "o_custkey").sortBy("o_custkey")
       .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (c.write.format("parquet").bucketBy(4, "c_custkey").sortBy("c_custkey")
       .option("path", str(tmp_path / "b_customer")).saveAsTable("b_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # sanity: result matches the plain (shuffled) join
        n_bucketed = joined.count()
        n_plain = o.join(c, F.col("o_custkey") == F.col("c_custkey")).count()
        assert n_bucketed == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the
    join key, joined to a FILTERED dim, must plan a dynamicpruning
    subquery on the partition column — at 100 TB this is what turns
    a full fact scan into reading only the partitions the dim filter
    selects."""
    from cli_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    fact_path = str(tmp_path / "li_by_supp")
    li.write.partitionBy("l_suppkey").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") > 5000
    ).select("s_suppkey")
    joined = fact.join(dim, fact.l_suppkey == dim.s_suppkey)
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized, optimized
