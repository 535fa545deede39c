"""Semantic invariants for the round-12 queue operators (properties
both engines could get wrong together — the parity gate can't see
them)."""

from __future__ import annotations

from cli_spark.operators.round12 import (
    q454_skipgram_pmi,
    q455_simpsons_paradox_audit,
    q456_km_survival,
    q457_cuped_adjustment,
    q458_quantile_treatment_effect,
)


def test_pmi_ranks_contiguous_and_supported(spark, sf_dir):
    rows = q454_skipgram_pmi(spark, sf_dir).collect()
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    assert len(rows) <= 30
    for r in rows:
        assert r["c_ab"] >= 5


def test_simpson_directions_are_signs(spark, sf_dir):
    rows = q455_simpsons_paradox_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["stratum_dir"] in (-1, 0, 1)
        assert r["overall_dir"] in (-1, 0, 1)
        assert r["reversed"] == (r["stratum_dir"] * r["overall_dir"] < 0)


def test_km_survival_monotone_decreasing(spark, sf_dir):
    rows = sorted(q456_km_survival(spark, sf_dir).collect(),
                  key=lambda r: r["day"])
    assert rows
    prev = 1_000_000
    for r in rows:
        assert 0 <= r["survival_micro"] <= prev, r
        assert 0 < r["n_converted"] < r["n_risk"]
        prev = r["survival_micro"]
    # risk set shrinks over time
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_cuped_variance_reduction_bounded(spark, sf_dir):
    rows = q457_cuped_adjustment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["var_reduction_ppm"] is not None:
            # corr^2 in ppm — bounded by construction
            assert 0 <= r["var_reduction_ppm"] <= 1_000_000, r


def test_qte_decile_values_monotone_within_arm(spark, sf_dir):
    rows = q458_quantile_treatment_effect(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for rs in by_type.values():
        rs.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(range(1, 10))
        va = [r["val_a_cents"] for r in rs]
        vb = [r["val_b_cents"] for r in rs]
        assert va == sorted(va) and vb == sorted(vb)
        for r in rs:
            assert r["qte_cents"] == r["val_a_cents"] - r["val_b_cents"]
