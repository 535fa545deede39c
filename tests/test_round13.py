"""Semantic invariants for the round-13 queue operators (properties
both engines could get wrong together — the parity gate can't see
them)."""

from __future__ import annotations

import duckdb

from cli_spark.operators.round13 import (
    q460_repeated_kmer_census,
    q461_histogram_quantile_drift,
    q462_theta_sketch_intersection,
    q463_cluster_tfidf_labels,
    q464_harmonic_token_packing,
    q465_hll_register_sketch,
    q466_family_split_leakage,
    q467_rrf_hybrid_retrieval,
    q468_blocked_fuzzy_join,
    q469_mann_kendall_trend,
    q470_dedup_manifest,
    q471_power_iteration_eigvec,
)


def test_kmer_census_level_monotonicity(spark, sf_dir):
    rows = sorted(q460_repeated_kmer_census(spark, sf_dir).collect(),
                  key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    for r in rows:
        # repeated keys are a subset of distinct keys; their windows a
        # subset of all windows; multiplicity consistent with repeats
        assert 0 <= r["n_repeated"] <= r["n_distinct"] <= r["n_windows"]
        assert r["repeated_windows"] <= r["n_windows"]
        if r["n_repeated"] > 0:
            assert r["max_multiplicity"] >= 2
            assert r["repeated_windows"] >= 2 * r["n_repeated"]
    # doubling k can only shrink the window count (fewer valid starts)
    # and the count of repeated-window mass (a repeated 2k-gram forces
    # repeated k-grams at both halves, not vice versa)
    for a, b in zip(rows, rows[1:]):
        assert b["n_windows"] <= a["n_windows"]
        assert b["max_multiplicity"] <= a["max_multiplicity"]


def test_kmer_census_matches_direct_substring_count(spark, sf_dir):
    """Independent probe: the k=8 census row equals a direct DuckDB
    substring census (not via the registered oracle text)."""
    rows = {r["k"]: r for r in q460_repeated_kmer_census(spark, sf_dir).collect()}
    con = duckdb.connect()
    nd, nw = con.execute(
        f"""
        SELECT CAST(COUNT(DISTINCT s) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        FROM (
          SELECT substr(text, p, 8) AS s
          FROM (SELECT text, unnest(generate_series(1, len(text))) AS p
                FROM read_parquet('{sf_dir}/documents.parquet'))
          WHERE p + 7 <= len(text)
        )
        """
    ).fetchone()
    assert rows[8]["n_distinct"] == nd
    assert rows[8]["n_windows"] == nw


def test_histogram_quantile_within_sketch_error_bound(spark, sf_dir):
    rows = q461_histogram_quantile_drift(spark, sf_dir).collect()
    assert {r["q"] for r in rows} == {50, 90, 99}
    for r in rows:
        # estimate is the midpoint of a 1/64-range bucket containing
        # the exact rank value -> error under one bucket width
        # (1/64 of range ~ 15625 ppm) plus integer-floor slack on
        # narrow ranges; 2% of range is a safe ceiling
        assert r["drift_ppm"] <= 20_000, r
        assert r["n"] > 0


def test_theta_sketch_pairs_complete(spark, sf_dir):
    rows = q462_theta_sketch_intersection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_inter"] >= 0 and r["est_inter"] >= 0
        assert r["err_ppm"] >= 0
    # every unordered pair exactly once
    pairs = {(r["s1"], r["s2"]) for r in rows}
    assert len(pairs) == len(rows)
    assert all(s1 < s2 for s1, s2 in pairs)


def test_cluster_labels_ranked_and_sized(spark, sf_dir):
    rows = q463_cluster_tfidf_labels(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r["n_members"] >= 2
        assert r["tf"] >= 1
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for rs in by_cluster.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [r["tfidf_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_harmonic_packing_accounting(spark, sf_dir):
    rows = q464_harmonic_token_packing(spark, sf_dir).collect()
    per = [r for r in rows if r["k"] != -1]
    tot = [r for r in rows if r["k"] == -1]
    assert len(tot) == 1 and per
    t = tot[0]
    assert t["n_items"] == sum(r["n_items"] for r in per)
    assert t["bins"] == sum(r["bins"] for r in per)
    assert t["sum_tokens"] == sum(r["sum_tokens"] for r in per)
    for r in per:
        # class-k bins hold exactly k items each (last one partial)
        assert (r["n_items"] + r["k"] - 1) // r["k"] == r["bins"]
        assert 0 < r["occupancy_ppm"] <= 1_000_000
    # packing can never beat the fractional lower bound
    assert t["bins"] >= t["lower_bound"]
    assert t["vs_lb_ppm"] >= 1_000_000


def test_hll_registers_and_union_bounds(spark, sf_dir):
    rows = q465_hll_register_sketch(spark, sf_dir).collect()
    by_src = {r["source"]: r for r in rows}
    assert "__union__" in by_src
    u = by_src["__union__"]
    parts = [r for r in rows if r["source"] != "__union__"]
    assert parts
    for r in rows:
        assert 0 <= r["zeros"] <= 63  # at least one register is set
        assert r["hll_estimate"] > 0
        # realized error within ~5x the 1.04/sqrt(64) = 13% contract
        # (64 registers, one draw — generous but catches blowups)
        assert r["err_ppm"] <= 650_000, r
    # union exact >= any part exact; union estimate reflects that scale
    assert u["exact_distinct"] >= max(r["exact_distinct"] for r in parts)


def test_split_leakage_pairs_and_bounds(spark, sf_dir):
    rows = q466_family_split_leakage(spark, sf_dir).collect()
    for r in rows:
        assert r["s1"] < r["s2"]
        # every straddling cluster contributes >= 2 docs (one per side)
        assert r["n_leaked_docs"] >= 2 * r["n_straddling_clusters"]
        assert 0 <= r["leak_ppm"] <= 1_000_000


def test_rrf_ranks_consistent(spark, sf_dir):
    rows = sorted(q467_rrf_hybrid_retrieval(spark, sf_dir).collect(),
                  key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 20
    prev = None
    for r in rows:
        # fused score recomputable from the exposed leg ranks
        lex = 1_000_000 // (60 + r["lex_rank"]) if r["lex_rank"] else 0
        dense = 1_000_000 // (60 + r["dense_rank"])
        assert r["rrf_micro"] == lex + dense
        if prev is not None:
            assert r["rrf_micro"] <= prev
        prev = r["rrf_micro"]


def test_fuzzy_join_pairs_within_thresholds(spark, sf_dir):
    rows = q468_blocked_fuzzy_join(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert abs(r["len_a"] - r["len_b"]) <= 16
        # reps are distinct texts, so distance 0 is impossible
        assert 1 <= r["edit_dist"] <= 32
        # edit distance can never be below the length difference
        assert r["edit_dist"] >= abs(r["len_a"] - r["len_b"])


def test_mann_kendall_integrity(spark, sf_dir):
    rows = q469_mann_kendall_trend(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_days"]
        max_pairs = n * (n - 1) // 2
        assert abs(r["s_stat"]) <= max_pairs
        # tie correction can only reduce the no-ties variance
        assert 0 <= r["var18"] <= n * (n - 1) * (2 * n + 5)
        if r["z_micro"] > 1_959_963:
            assert r["trend"] == "increasing"
        elif r["z_micro"] < -1_959_963:
            assert r["trend"] == "decreasing"
        else:
            assert r["trend"] == "none"


def test_dedup_manifest_accounting(spark, sf_dir):
    rows = q470_dedup_manifest(spark, sf_dir).collect()
    dropped = {r["dropped_doc"] for r in rows}
    kept = {r["kept_doc"] for r in rows}
    # a kept doc is never dropped; a doc is dropped at most once
    assert not dropped & kept
    assert len(dropped) == len(rows)
    for r in rows:
        assert r["reason"] in ("exact_copy", "near_dup")
        assert r["dropped_doc"] != r["kept_doc"]
    # manifest size equals q446's stage-3 removal count
    from cli_spark.operators.round11 import q446_dedup_pipeline_flagship
    ledger = {x["stage"]: x for x in
              q446_dedup_pipeline_flagship(spark, sf_dir).collect()}
    assert len(rows) == ledger["3_manifest"]["n_removed"]


def test_power_iteration_normalized_and_converging(spark, sf_dir):
    import math

    rows = q471_power_iteration_eigvec(spark, sf_dir).collect()
    assert len(rows) == 64
    v1 = [r["v1"] for r in sorted(rows, key=lambda r: r["j"])]
    v2 = [r["v2"] for r in sorted(rows, key=lambda r: r["j"])]
    v3 = [r["v3"] for r in sorted(rows, key=lambda r: r["j"])]
    for v in (v1, v2, v3):
        m = max(abs(x) for x in v)
        # integer renormalization pins max-abs to ~2^20
        assert 2**20 - 1 <= m <= 2**20 + 2**10, m

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    # successive directions align (power iteration converges toward
    # the top eigenvector; sign is fixed by the shared start)
    assert cos(v2, v3) > 0.5
