"""Semantic invariants for the round-11 operators — properties the
oracle-parity gate can't see because both engines could share a bug
(allocation sums, sketch bounds, ledger monotonicity, compaction
conservation).
"""

from __future__ import annotations

from cli_spark.operators.round11 import (
    q446_dedup_pipeline_flagship,
    q447_weighted_reservoir_aes,
    q448_naive_bayes_langid,
    q449_kmv_distinct_sketch,
    q450_largest_remainder_split,
    q451_cdc_log_compaction,
    q452_source_lang_kl,
)
from cli_spark.tables import load_table


def test_largest_remainder_quotas_sum_and_match(spark, sf_dir):
    rows = q450_largest_remainder_split(spark, sf_dir).collect()
    strata = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    per_lang: dict[str, int] = {}
    for r in rows:
        # Hamilton's method: realized assignment equals the quota
        assert r["n_assigned"] == r["quota"], r
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["quota"]
    # quotas sum EXACTLY to the stratum size (the method's point)
    assert per_lang == strata


def test_aes_reservoir_shape(spark, sf_dir):
    rows = q447_weighted_reservoir_aes(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    strata = {
        r["lang"]: r["count"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").count().collect()
    }
    for lang, picks in by_lang.items():
        assert len(picks) == min(10, strata[lang])
        # ranks are 1..k, doc_ids unique (without replacement)
        assert sorted(p["pick"] for p in picks) == list(
            range(1, len(picks) + 1))
        assert len({p["doc_id"] for p in picks}) == len(picks)


def test_kmv_bounds_and_exact_path(spark, sf_dir):
    rows = q449_kmv_distinct_sketch(spark, sf_dir).collect()
    assert any(r["source"] == "__union__" for r in rows)
    for r in rows:
        if r["exact_distinct"] < 64:
            # below k the sketch IS the set — exact by definition
            assert r["kmv_estimate"] == r["exact_distinct"]
            assert r["err_ppm"] == 0
        else:
            # 1/sqrt(64) ~ 12.5% std error; 60% is a >4-sigma guard
            assert r["err_ppm"] <= 600_000, r


def test_dedup_flagship_ledger_invariants(spark, sf_dir):
    rows = {r["stage"]: r for r in
            q446_dedup_pipeline_flagship(spark, sf_dir).collect()}
    s1, s2, s3 = (rows["1_exact_family"], rows["2_neardup_cc"],
                  rows["3_manifest"])
    # stages chain: out of 1 feeds 2; 3 is the composition
    assert s1["n_out"] == s2["n_in"]
    assert s3["n_in"] == s1["n_in"] and s3["n_out"] == s2["n_out"]
    for r in rows.values():
        assert r["n_in"] - r["n_removed"] == r["n_out"]
        assert 0 <= r["removed_ppm"] <= 1_000_000


def test_cdc_compaction_conservation(spark, sf_dir):
    rows = q451_cdc_log_compaction(spark, sf_dir).collect()
    n_keys = sum(r["n_keys"] for r in rows)
    orders = load_table(spark, sf_dir, "orders").count()
    assert n_keys == orders  # every key resolves to exactly one state
    for r in rows:
        assert r["n_live"] + r["n_tombstoned"] == r["n_keys"]


def test_naive_bayes_covers_all_test_docs(spark, sf_dir):
    rows = q448_naive_bayes_langid(spark, sf_dir).collect()
    n_pred = sum(r["n_docs"] for r in rows)
    d = load_table(spark, sf_dir, "documents")
    n_test = d.filter("doc_id % 2 = 1").count()
    assert n_pred == n_test


def test_kl_nonnegative_up_to_floor(spark, sf_dir):
    # true KL >= 0; each of the <= 5 per-lang terms is floored to
    # micro units, so the sum can undershoot by at most 5 micro
    rows = q452_source_lang_kl(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["kl_micro"] >= -5, r
