"""Physical-plan regression tests — the 100 TB properties the bench
numbers depend on, asserted structurally so a future edit can't
silently regress them:

* filters and column pruning reach the parquet scan;
* dimension joins broadcast (no shuffle of the fact side for dims);
* top-K compiles to TakeOrderedAndProject (no global sort);
* aggregations are two-phase (map-side partial before the shuffle);
* no row-at-a-time Python UDF appears in any oracle-graded plan
  (BatchEvalPython = the slow path; only q59 demonstrates it).
"""

from __future__ import annotations

import pytest

from cli_spark.plans.registry import registry

_SPECS = registry()


def plan_of(spark, sf_dir, name: str) -> str:
    df = _SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(spark, sf_dir, name: str) -> str:
    df = _SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    plan = formatted_plan(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read as exactly 7 columns
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_q01_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # map-side combine present


def test_q17_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q17_star_join_q5")
    # 5 joins total; at least the 4 dimension sides must broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q16_theta_join_broadcasts_small_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q16_theta_band_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    for name in ["q44_global_sort_limit", "q10_join_topk_revenue", "q80_knn_bruteforce"]:
        assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, name), name


def test_semi_anti_plan_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "q13_semi_join")
    assert "LeftAnti" in plan_of(spark, sf_dir, "q14_anti_join")


def test_no_python_udf_in_oracle_graded_plans(spark, sf_dir):
    """Row-at-a-time Python UDFs (BatchEvalPython) must not appear in
    any oracle-graded query except q59 (the deliberate slow-path demo).
    Arrow-based nodes (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    are the sanctioned Python escapes."""
    offenders = []
    for name, spec in _SPECS.items():
        if spec.oracle is None or name == "q59_registered_scalar_udf":
            continue
        # strip UDTF nodes first — BatchEvalPythonUDTF is the (sanctioned)
        # table-function node, not the row-at-a-time scalar path
        plan = plan_of(spark, sf_dir, name).replace("BatchEvalPythonUDTF", "")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_whole_stage_codegen_present(spark, sf_dir):
    """Codegen stage markers (`*(n)`) only appear once AQE finalizes —
    execute first, then inspect the final physical plan."""
    for name in ["q01_pricing_summary", "q30_topk_per_group", "q90_term_counts"]:
        df = _SPECS[name].fn(spark, sf_dir)
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "*(" in final, name  # WholeStageCodegen stage prefix


def test_q97_chunking_is_narrow(spark, sf_dir):
    """Chunking is explode-only — no shuffle at any scale."""
    assert "Exchange" not in plan_of(spark, sf_dir, "q97_doc_chunking")


def test_q96_q98_prune_text_column(spark, sf_dir):
    """Split/mix read keys and stats, never the document payload —
    column pruning must drop `text` at the scan."""
    for name in ["q96_deterministic_split", "q98_weighted_mix"]:
        plan = formatted_plan(spark, sf_dir, name)
        read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "text" not in read_schema, name


def test_q19_salted_agg_is_two_phase(spark, sf_dir):
    """Salted aggregation: two groupBys (partial+final each) — ≥4
    HashAggregate nodes; salt column present in the first shuffle."""
    plan = plan_of(spark, sf_dir, "q19_salted_skew_agg")
    assert plan.count("HashAggregate") >= 4
    assert "salt" in plan
