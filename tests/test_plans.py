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


# The all-registry UDF gate, chunked (VERDICT r12 #5): one monolithic
# sweep constructed all 456 queries in a single test — and TRUE-
# streaming queries EXECUTE their ~40-micro-batch job during
# construction, making that one gate a ~15-minute monolith. Those are
# excluded here (their returned DataFrame is a materialized
# createDataFrame, so its plan could never show the streaming job's
# nodes anyway) and covered by the static source scan below; the rest
# sweep in deterministic chunks so a failure names its neighborhood
# and pytest shows progress.
_UDF_GATE_CHUNK = 64
_UDF_GATE_NAMES = sorted(
    name for name, spec in _SPECS.items()
    if spec.oracle is not None
    and name != "q59_registered_scalar_udf"
    and "true_stream" not in spec.tags
)
_UDF_GATE_CHUNKS = [
    _UDF_GATE_NAMES[i:i + _UDF_GATE_CHUNK]
    for i in range(0, len(_UDF_GATE_NAMES), _UDF_GATE_CHUNK)
]


@pytest.mark.parametrize(
    "chunk", _UDF_GATE_CHUNKS,
    ids=[c[0].split("_")[0] + "-" + c[-1].split("_")[0]
         for c in _UDF_GATE_CHUNKS])
def test_no_python_udf_in_oracle_graded_plans(spark, sf_dir, chunk):
    """Row-at-a-time Python UDFs (BatchEvalPython) must not appear in
    any oracle-graded query except q59 (the deliberate slow-path demo).
    Arrow-based nodes (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    are the sanctioned Python escapes."""
    offenders = []
    for name in chunk:
        # strip UDTF nodes first — BatchEvalPythonUDTF is the (sanctioned)
        # table-function node, not the row-at-a-time scalar path
        plan = plan_of(spark, sf_dir, name).replace("BatchEvalPythonUDTF", "")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_no_python_udf_in_true_stream_sources():
    """Static cover for the true_stream queries excluded from the plan
    sweep above: the modules defining them must not register
    row-at-a-time Python UDFs (F.udf / @udf) anywhere — the streaming
    job's plan is unobservable post-hoc, so the gate is at the source
    level."""
    import inspect

    modules = {
        inspect.getmodule(spec.fn)
        for name, spec in _SPECS.items()
        if "true_stream" in spec.tags
    }
    assert modules, "no true_stream queries found — tag scheme changed?"
    for mod in modules:
        src = inspect.getsource(mod)
        assert "F.udf(" not in src and "@udf" not in src, mod.__name__


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


def test_tpch_pack2_semi_anti_are_hash_joins(spark, sf_dir):
    """q131 (EXISTS) and q144 (double correlation) must compile their
    semi/anti arms to equi hash/SMJ joins with condition residuals —
    a BroadcastNestedLoopJoin here would rescan the fact at scale."""
    for name in ["q131_tpch_q4_order_priority", "q144_tpch_q21_waiting_suppliers"]:
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "LeftSemi" in plan, name
    assert "LeftAnti" in plan_of(spark, sf_dir, "q144_tpch_q21_waiting_suppliers")


def test_q139_fact_shuffles_once_with_partial_agg(spark, sf_dir):
    """Q20-shape: raw fact rows cross the wire exactly once — through
    the (l_partkey, l_suppkey) groupBy exchange, WITH map-side partial
    aggregation before it. The window's exchange may only carry the
    already-aggregated pair relation (it sits above the final
    HashAggregate), never raw lineitem rows."""
    plan = plan_of(spark, sf_dir, "q139_tpch_q20_share_suppliers")
    lines = plan.splitlines()
    pair_ex = [i for i, l in enumerate(lines)
               if "Exchange hashpartitioning(l_partkey" in l and "l_suppkey" in l]
    assert len(pair_ex) == 1, "fact must shuffle exactly once"
    # map-side combine feeds that exchange
    assert any("partial_sum" in l for l in lines[pair_ex[0]:]), "no partial agg"
    # the window exchange (l_partkey alone) sits ABOVE the final agg:
    win_ex = [i for i, l in enumerate(lines)
              if "Exchange hashpartitioning(l_partkey" in l and "l_suppkey" not in l]
    assert all(i < pair_ex[0] for i in win_ex)


def test_q137_topk_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan_of(
        spark, sf_dir, "q137_tpch_q18_large_volume"
    )


def test_q134_single_broadcast_join_no_fact_shuffle(spark, sf_dir):
    """Q14-shape: part broadcasts; the month-filtered fact aggregates
    globally — zero hash-partition exchanges of lineitem."""
    plan = plan_of(spark, sf_dir, "q134_tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_q138_pushdown_reaches_scan(spark, sf_dir):
    """Q19-shape: Catalyst must derive the disjunction's common
    implications and push quantity bounds to the lineitem scan."""
    plan = formatted_plan(spark, sf_dir, "q138_tpch_q19_or_bands")
    assert "PushedFilters" in plan
    assert "Or(" in plan  # the OR predicate itself reaches the scan


def test_q108_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """Binned range join must plan as a key-partitioned equi-join
    (hash/broadcast-hash/sort-merge on the bin id) with the range
    predicate as a residual filter — never a nested loop."""
    plan = plan_of(spark, sf_dir, "q108_binned_range_join")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_q105_sample_filter_is_narrow(spark, sf_dir):
    """Deterministic hash sampling is a pure filter: no Exchange at
    all in the plan (sample membership never shuffles data)."""
    plan = plan_of(spark, sf_dir, "q105_hash_sample")
    assert "Exchange" not in plan


def test_q116_lateral_decorrelates(spark, sf_dir):
    """LATERAL per-group top-K must decorrelate to a window rank +
    hash/broadcast join — never a per-outer-row nested loop."""
    plan = plan_of(spark, sf_dir, "q116_lateral_topk")
    assert "row_number()" in plan and "Window" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_q115_bloom_probe_never_shuffles_fact(spark, sf_dir):
    """Bloom probing must stay scan-side: every join against the
    ≤32-row bloom (and the truth-audit key set) broadcasts, so the
    FACT side (orders) never hash-shuffles. The build side's
    groupBy('word') legitimately exchanges ≤32 rows per map task —
    that tiny build exchange is the only hashpartitioning allowed."""
    plan = plan_of(spark, sf_dir, "q115_bloom_filter_probe")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word" in line and "o_" not in line, line
    assert plan.count("BroadcastHashJoin") >= 4


def test_q156_query_side_broadcasts(spark, sf_dir):
    """Hard-negative mining must broadcast the tiny query sample
    against the corpus (non-equi condition → BroadcastNestedLoop),
    never a shuffled cartesian."""
    plan = plan_of(spark, sf_dir, "q156_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q157_centroids_broadcast(spark, sf_dir):
    """The labels×64-row centroid relation joins back to the exploded
    dims as a broadcast — vectors must not shuffle for the distance
    pass."""
    plan = plan_of(spark, sf_dir, "q157_embedding_outliers")
    assert "BroadcastHashJoin" in plan


def test_q158_kmeans_centroids_broadcast(spark, sf_dir):
    """Every Lloyd assignment joins the k×64 centroid relation as a
    broadcast: 3 assignments (2 iterations + final stats) → >= 3
    broadcast joins, and the vector side never cartesian-joins.
    Inspected on the LAZY membership plan — the materialized form
    q158 executes is this plan behind a localCheckpoint, which
    truncates the visible lineage."""
    from cli_spark.operators.training import _kmeans_membership_plan

    df = _kmeans_membership_plan(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q162_gopher_rules_zero_shuffle(spark, sf_dir):
    """All five quality gates are per-row projections — the plan must
    contain no Exchange at all (one map stage fused into the scan)."""
    plan = plan_of(spark, sf_dir, "q162_gopher_rules")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_q163_span_census_no_nested_loop(spark, sf_dir):
    """The span census join must be an equi hash/SMJ join on the span
    key — never a nested loop — and both aggregations two-phase."""
    plan = plan_of(spark, sf_dir, "q163_repeated_spans")
    assert "NestedLoop" not in plan
    assert "partial_" in plan


def test_q164_zipf_vocab_window_after_collapse(spark, sf_dir):
    """Term counting is map-side combined (partial agg before the term
    shuffle); the global rank window runs only on the collapsed
    vocabulary, and the corpus total joins in as a broadcast."""
    plan = plan_of(spark, sf_dir, "q164_zipf_stats")
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q152_source_cap_prunes_text(spark, sf_dir):
    """The retention rank reads ids and stats only — the text payload
    column must not reach the scan."""
    plan = formatted_plan(spark, sf_dir, "q152_source_cap")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and all("text" not in l for l in read_schema)


def test_q166_q168_single_user_shuffle_no_join(spark, sf_dir):
    """LOCF fill and interval-merge are ONE hashpartitioning exchange
    on user_id and zero joins: every window/groupBy stage reuses the
    same partitioning, and the O(n²) overlap self-join never appears."""
    for name in ("q166_locf_forward_fill", "q168_interval_coverage"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "user_id" in next(
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l
        ), name
        assert "Join" not in plan and "Cartesian" not in plan, name


def test_q173_medians_broadcast_back(spark, sf_dir):
    """The 5-row median/MAD relations must re-join the deviations as
    broadcasts — never a sort-merge shuffle of the fact stream."""
    plan = plan_of(spark, sf_dir, "q173_mad_outliers")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_q175_sketch_broadcasts_to_probe(spark, sf_dir):
    """The 1024-row CMS counter table and the top-20 probe keys both
    broadcast; estimating probe keys must not reshuffle the corpus."""
    plan = plan_of(spark, sf_dir, "q175_count_min_sketch")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_q177_skyline_has_no_join(spark, sf_dir):
    """2-D skyline must be agg + running-min window — the dominance
    anti-join formulation (row-pair work) is forbidden."""
    plan = plan_of(spark, sf_dir, "q177_skyline_frontier")
    assert "Join" not in plan and "Cartesian" not in plan
    assert "Window" in plan
    # the window runs AFTER reduction to one row per size: its input
    # exchange is the tiny per-size relation, not the part scan
    assert plan.count("Exchange") <= 2


def test_round2_window_ops_single_shuffle(spark, sf_dir):
    """q185/q187/q188 each do exactly ONE hashpartitioning exchange
    (doc_id / custkey / user_id) and zero joins — all window passes
    and stacked aggregations reuse the same partitioning."""
    for name in (
        "q185_word_run_census",
        "q187_window_funcs2",
        "q188_linear_interpolation",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Join" not in plan and "Cartesian" not in plan, name


def test_q100_no_expand_two_level_agg(spark, sf_dir):
    """q100 computes its distinct-user count as a two-level
    aggregation. A countDistinct mixed with plain aggregates would
    plan an Expand that duplicates every input row before the widest
    shuffle — this gate fails if that plan shape ever returns."""
    plan = plan_of(spark, sf_dir, "q100_tumbling_window")
    assert "Expand" not in plan, plan
    # both aggregation levels are two-phase (partial before shuffle)
    assert plan.count("HashAggregate") >= 4


def test_q73_single_md5_per_shingle_and_no_index_capture(spark, sf_dir):
    """q73's band hashes derive from ONE md5 per shingle (nested
    transform). Two regressions are gated: (a) reverting to per-band
    seeded digests (md5 appearing once per band expression), and
    (b) the multi-parameter-lambda trap where the band seed silently
    binds to transform's ARRAY INDEX argument (plan would show the
    index lambda variable in a multiply)."""
    # a cached signature relation from an earlier q73 build in this
    # session would substitute an InMemoryRelation whose serialized
    # child plan repeats the md5 text — clear for a deterministic count
    spark.catalog.clearCache()
    df = _SPECS["q73_minhash_lsh"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # CollapseProject inlines the shared hashed-array projection into
    # each band expression, so md5 appears once per band in the TEXT —
    # but the four copies are semantically identical subtrees, which
    # whole-stage codegen's subexpression elimination evaluates once.
    # The regression signature of per-band seeded digests is a seed
    # CONCAT feeding md5 (four genuinely different digests per
    # shingle, which CSE cannot merge):
    assert "concat(" not in plan.lower().replace("concat_ws", ""), plan
    assert plan.count("md5(") <= 4  # one (CSE-deduped) copy per band
    # the band multiply must use a LITERAL coefficient, never a second
    # lambda variable (the index): lambdafunction(...) with two lambda
    # args feeding a Multiply is the bug signature
    import re

    for m in re.finditer(r"lambdafunction\(\((?:[^()]|\([^()]*\))*\*[^)]*\)", plan):
        assert "lambda y_" not in m.group(0), m.group(0)


def test_q194_no_global_window_over_facts(spark, sf_dir):
    """q194's global ids must come from the two-phase offset pattern:
    the fact rows go through a lang-PARTITIONED window plus a
    broadcast of the tiny offsets relation. A single-partition window
    over the fact relation (row_number() OVER (ORDER BY ...) applied
    directly) is the scale killer this gate protects against."""
    plan = plan_of(spark, sf_dir, "q194_global_row_ids")
    assert "BroadcastHashJoin" in plan
    # the fact-side window partitions by lang (hash exchange), so the
    # only SinglePartition exchange feeds the ~#groups offsets window
    assert "hashpartitioning(lang" in plan
    import re
    singles = plan.count("Exchange SinglePartition")
    assert singles <= 1, plan  # offsets relation only, never the facts


def test_q164_top50_is_take_ordered_not_global_window(spark, sf_dir):
    """q164's top-50 cut must compile to TakeOrderedAndProject —
    ranking a vocab-sized relation through a single-partition window
    is the scale regression this gate protects against."""
    plan = plan_of(spark, sf_dir, "q164_zipf_stats")
    assert "TakeOrderedAndProject" in plan


def test_q74_simhash_banded_no_cartesian(spark, sf_dir):
    """q74's candidate join must be the pigeonhole equi-join on
    (half_id, half_val) — a hash/sort-merge shuffle join — never the
    all-pairs BroadcastNestedLoopJoin over N² fingerprint pairs that
    the banding exists to avoid."""
    plan = plan_of(spark, sf_dir, "q74_simhash_hamming")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the equi keys must actually reach a real join operator
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_q309_simhash64_blocks_no_cartesian(spark, sf_dir):
    """q309's candidate join must be the Manku block-probe equi-join
    on (block_id, block_val) — never an all-pairs nested-loop over
    fingerprints — and the 64-bit fingerprint build must be ONE wide
    aggregation (no 64-way bit explode feeding a shuffle)."""
    plan = plan_of(spark, sf_dir, "q309_simhash64_blocks")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_q199_segment_dedup_no_join_no_global_window(spark, sf_dir):
    """q199's only shuffles are the segment-partitioned first-wins
    window and the per-doc rebuild agg: no join of any kind, and no
    single-partition exchange (a global window over segments would be
    the scale killer)."""
    plan = plan_of(spark, sf_dir, "q199_paragraph_dedup")
    assert "Join" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(seg" in plan  # dedup window keyed on segment


def test_q200_decontamination_is_bucketed_equi_join(spark, sf_dir):
    """q200 must compare eval vs train only within signature buckets —
    an equi-join on sig, never the eval×train nested loop it
    replaces."""
    plan = plan_of(spark, sf_dir, "q200_embedding_decontamination")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_q201_scrub_no_cartesian_and_doc_partitioned_windows(spark, sf_dir):
    """q201's census join keys on the span string and the island merge
    windows partition by doc_id — never a cartesian pair join, never a
    global (unpartitioned) window."""
    plan = plan_of(spark, sf_dir, "q201_exact_substring_scrub")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "Window " in line and "windowspecdefinition" in line:
            assert "doc_id" in line  # every window is per-doc


def test_q202_dsir_no_cartesian_two_phase_census(spark, sf_dir):
    """q202's weight table comes from full-outer-joined censuses (both
    map-side combined); the score join is a plain equi-join on the
    bigram. No nested loop anywhere."""
    plan = plan_of(spark, sf_dir, "q202_dsir_importance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # census map-side combine


def test_q204_ann_side_is_equi_join(spark, sf_dir):
    """q204's ANN candidate generation must stay the q83 bucket
    equi-join (hash join on the signature), not a filtered cartesian;
    the exact side is the one deliberate broadcast cross join (5
    probe rows)."""
    plan = plan_of(spark, sf_dir, "q204_ann_recall_audit")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # only the exact-side probe cross-join may be a BNLJ
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q205_profile_is_one_scan(spark, sf_dir):
    """The column profiler reads `orders` exactly once — one wide
    aggregate (multi-DISTINCT via a single Expand), then an unpivot.
    N columns must never cost N scans."""
    plan = plan_of(spark, sf_dir, "q205_column_profile")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the single multi-distinct expansion


def test_q206_bpe_census_collapses_before_topk(spark, sf_dir):
    """q206's pair census is map-side combined and the top-30 rides a
    tiny collapsed relation: the only BNLJ is the broadcast 1-row
    total; partial_count proves the combine."""
    plan = plan_of(spark, sf_dir, "q206_bpe_pair_census")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q213_pipeline_fuses_gates_into_scan(spark, sf_dir):
    """The composite curation pipeline must keep its quality gates in
    the scan stage (a Filter over the parquet scan, before any
    exchange) and run the whole five-stage DAG with only key
    shuffles — never a cartesian or a Python UDF."""
    plan = plan_of(spark, sf_dir, "q213_curation_pipeline")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the two ranking windows (dedup, cap) + final agg: exchanges stay
    # in the single digits — a stage-per-job pipeline would rescan
    assert plan.count("Exchange") <= 6


def test_q212_truth_side_is_sample_bounded(spark, sf_dir):
    """q212's quadratic ground-truth join must be fed by the
    broadcast-limited sample (a GlobalLimit/TakeOrdered appears under
    the join), not by the full corpus."""
    plan = plan_of(spark, sf_dir, "q212_lsh_recall_audit")
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan


def test_q230_sweep_has_no_join(spark, sf_dir):
    """The concurrency sweep must stay the ±1 delta formulation —
    two projections + union + windows, never a day×interval join."""
    plan = plan_of(spark, sf_dir, "q230_concurrent_intervals")
    assert "Join" not in plan


def test_q225_topk_terms_take_ordered(spark, sf_dir):
    """The inverted index picks its top-df terms via
    TakeOrderedAndProject and broadcasts them to the postings side."""
    plan = plan_of(spark, sf_dir, "q225_inverted_index")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q228_dims_broadcast(spark, sf_dir):
    """Hierarchical shares joins the fact to three broadcast dims and
    re-aggregates the leaf — one fact exchange, no SMJ on dims."""
    plan = plan_of(spark, sf_dir, "q228_hierarchical_shares")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q229_single_user_shuffle(spark, sf_dir):
    """Sessionization and the path windows share the user_id
    partitioning: exactly one exchange reads raw events (plus the
    tiny census/top-K exchanges)."""
    plan = plan_of(spark, sf_dir, "q229_session_paths")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_q235_ewma_single_window_single_shuffle(spark, sf_dir):
    """q235's 8 lag taps must share ONE window spec over one user_id
    exchange — 8 separate Window nodes (or sorts) would be the
    regression."""
    plan = plan_of(spark, sf_dir, "q235_ewma_dyadic")
    assert plan.count("Window") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q238_systematic_sample_two_phase(spark, sf_dir):
    """q238's global cumulative weight must use the two-phase bucket
    shape: the only SinglePartition exchange feeds the 16-row offsets
    window, the corpus-side running sum is bucket-partitioned, and
    the offsets come back via broadcast."""
    plan = plan_of(spark, sf_dir, "q238_weighted_systematic_sample")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "hashpartitioning(bucket" in plan, plan


def test_q239_bootstrap_no_join_partial_agg(spark, sf_dir):
    """q239's 32× replica expansion must collapse by partial
    aggregation before the exchange (explode + two-phase hash agg),
    with no join anywhere in the plan."""
    plan = plan_of(spark, sf_dir, "q239_poisson_bootstrap")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q243_covariance_no_explode_no_join_one_shuffle(spark, sf_dir):
    """q243's Gram block must come from projection columns inside the
    scan stage: no per-coordinate explode of the embedding array
    (stack() after the per-label agg is the only Generate, over
    |labels| rows), no join, exactly one shuffle."""
    plan = plan_of(spark, sf_dir, "q243_covariance_blocks")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the one Generate is the final stack() unpivot AFTER aggregation,
    # so it must sit above the final HashAggregate in the plan text
    gen = plan.index("Generate")
    agg = plan.index("HashAggregate")
    assert gen < agg, plan  # executed-plan text prints top-down


def test_q244_pareto_dims_broadcast_windows_on_census(spark, sf_dir):
    """q244: all three dimension joins broadcast (no fact shuffle for
    dims), and no SinglePartition exchange — the cumulative windows
    run region-partitioned over the banded census."""
    plan = plan_of(spark, sf_dir, "q244_pareto_revenue_curve")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_q245_quantiles_from_census_not_sort(spark, sf_dir):
    """q245's quantiles must be located on the (segment, gap) census —
    no global sort of the gaps and no single-partition exchange; the
    per-customer lag partitions on o_custkey."""
    plan = plan_of(spark, sf_dir, "q245_interpurchase_quantiles")
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(o_custkey" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_q247_semdedup_pairs_are_grouped_gemm(spark, sf_dir):
    """q247's pair stage must be the cluster-grouped Gram GEMM
    (FlatMapGroupsInPandas — the sanctioned Arrow escape), never an
    all-pairs join: no BroadcastNestedLoopJoin / CartesianProduct,
    and no row-at-a-time BatchEvalPython."""
    plan = plan_of(spark, sf_dir, "q247_semdedup_prune")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_join_strategy_hints_control_physical_plan(spark, sf_dir):
    """The engine exposes all three equi-join physical strategies via
    hints — the knob a 100 TB deployment turns when the optimizer's
    default is wrong for a specific join (e.g. forcing shuffle-hash
    for a skew-free big-big join to skip both sorts, or merge when
    the build side would not fit executor memory)."""
    from pyspark.sql import functions as F

    from cli_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cond = o.o_custkey == c.c_custkey
        shj = o.join(c.hint("shuffle_hash"), cond)
        assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()
        smj = o.join(c.hint("merge"), cond)
        assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()
        bhj = o.join(F.broadcast(c), cond)
        assert "BroadcastHashJoin" in bhj._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_similarity_joins_have_no_cartesian(spark, sf_dir):
    """Every bounded-pair-space similarity join added in round 6 must
    plan as equi-joins (posting/band/cluster keys) — never a nested-
    loop/cartesian pair explosion."""
    for name in [
        "q253_sorted_neighborhood_pairs",
        "q257_source_overlap_matrix",
        "q267_minhash_estimator_audit",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # q270 carries 1-row scalar broadcasts (n_docs) that plan as
    # BroadcastNestedLoopJoin Cross — legitimate; its PAIR stage must
    # still be the term equi-join and never a cartesian
    plan = plan_of(spark, sf_dir, "q270_lexical_cosine_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [term" in plan


def test_round6_batch2_joins_plan_shapes(spark, sf_dir):
    """Session-3 join-bearing queries keep their scale shapes:

    * q275 grid NN: the candidate stage is a hash equi-join on the
      grid-cell key (never a point-pair nested loop);
    * q276 affinity: the pair stage is an equi-join on l_orderkey
      (basket-bounded), not a cartesian over parts;
    * q280 MERGE: exactly one full-outer equi-join applies the feed.
    """
    p275 = plan_of(spark, sf_dir, "q275_grid_nn_join")
    assert "CartesianProduct" not in p275
    assert "BroadcastNestedLoopJoin" not in p275

    p276 = plan_of(spark, sf_dir, "q276_part_affinity")
    assert "CartesianProduct" not in p276
    # only 1-row total relations may nested-loop (scalar broadcast)
    assert "l_orderkey" in p276

    p280 = plan_of(spark, sf_dir, "q280_merge_into")
    assert "CartesianProduct" not in p280
    assert "FullOuter" in p280


def test_session3_scale_shapes(spark, sf_dir):
    """Session-3 shape gates:

    * q283: the Gram build is an equi-join on vec_id + hash aggregate
      — never a nested-loop over vectors (the d²-bounded outer
      product);
    * q290: every banded config joins on (band_id, band_key) — no
      cartesian pair space despite three configurations;
    * q296: scoring joins are equi-joins; the only nested loop is the
      1-row corpus-stats broadcast;
    * q303: the pair stage joins on the part key (hub-pruned), never
      cross-product;
    * q304: the quantile windows run over the census, not fact rows —
      the plan sorts AFTER an aggregate, so no global sort of the
      join output feeds a window directly.
    """
    for name in [
        "q283_pca_power_iteration",
        "q303_bipartite_projection",
    ]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name

    # q290's round-7 form attaches the exact candidate COUNT as a
    # 1-row scalar broadcast (BroadcastNestedLoopJoin Cross — the
    # q270 precedent, legitimate); the pair stages must still be the
    # band equi-join + the per-bucket lead() window, never a
    # cartesian over docs. Since round 12 the REGISTERED query
    # returns a local 3-row rebuild (persist-leak rule), so the gate
    # inspects the distributed plan via the exposed builder.
    from cli_spark.operators.dedup import _q290_sweep_build

    out290, sig290 = _q290_sweep_build(spark, sf_dir)
    p290 = out290._jdf.queryExecution().executedPlan().toString()
    sig290.unpersist()
    assert "band_key" in p290
    assert "CartesianProduct" not in p290

    p296 = plan_of(spark, sf_dir, "q296_bm25_scores")
    assert "CartesianProduct" not in p296

    p304 = plan_of(spark, sf_dir, "q304_leadtime_quantiles")
    assert "HashAggregate" in p304
    assert "CartesianProduct" not in p304


def test_round7_additions_plan_shapes(spark, sf_dir):
    """Round-7 operators keep their scale shapes:

    * q311/q315 winnowing: selection is doc-local per-row array
      expressions since round 15 (no self-join, no per-position
      exchange); q315's match stage joins on the fingerprint hash
      (stop-capped posting lists), never doc×doc;
    * q312 ROUGE: candidates ride the band-edge relation and overlap
      joins are keyed by word — no cartesian anywhere;
    * q320 MRL: the query side is a 5-row broadcast (nested-loop over
      a broadcast scalar side is the q80 contract), corpus rows never
      pair with each other.
    """
    for name in ["q311_winnowing_fingerprints", "q315_winnowing_match",
                 "q312_rouge1_pair_audit"]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    p315 = plan_of(spark, sf_dir, "q315_winnowing_match")
    assert "SortMergeJoin" in p315 or "ShuffledHashJoin" in p315 \
        or "BroadcastHashJoin" in p315
    p320 = plan_of(spark, sf_dir, "q320_mrl_truncation_audit")
    assert "CartesianProduct" not in p320


def test_q317_federation_prunes_every_source(spark, sf_dir):
    """q317's federated star join must broadcast both dimension sides
    and push column pruning into each source: the JDBC scan's
    ReadSchema carries only the projected region columns and the scan
    of the parquet fact side reads only the join/agg columns."""
    plan = plan_of(spark, sf_dir, "q317_federated_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # fact-side parquet scan pruned to the 2 needed columns
    assert "c_nationkey" in plan and "c_acctbal" in plan
    assert "c_comment" not in plan and "c_phone" not in plan


def test_q335_salted_join_spreads_hot_key(spark, sf_dir):
    """q335's join must run on the SALTED composite key (hot_key,
    salt) through a shuffle join — not a broadcast (which would hide
    the technique) and never a nested loop."""
    plan = plan_of(spark, sf_dir, "q335_salted_skew_join")
    assert "salt" in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "CartesianProduct" not in plan
