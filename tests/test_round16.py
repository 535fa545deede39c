"""Semantic invariants for the round-15-build operators (q492–q493)
— independent reimplementations (hashlib/pandas/math, no shared SQL
text) so a shared-oracle bug cannot hide."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

import cli_spark.streaming.round16 as sr16
from cli_spark.operators.round16 import (
    q492_ddsketch_quantiles,
    q494_skew_salting_planner,
)

_MAXLONG = 9223372036854775807


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------- q492


def test_ddsketch_matches_independent_and_tightened_contract(spark, sf_dir):
    """Pure-Python gamma=sqrt(2) log-bucket histogram + rank selection
    reproduces every row (bucket index via bit_length of the square,
    estimate via math.isqrt of the squared-domain midpoint — no SQL
    text shared with either engine), and the TIGHTENED multiplicative
    contract holds as exact integer inequalities:
    2*est^2 <= 3*true^2 and 4*(est+1)^2 > 3*true^2 — i.e. est/true in
    (sqrt(3)/2, sqrt(3/2)], strictly inside q491's [0.75, 1.5]."""
    rows = q492_ddsketch_quantiles(spark, sf_dir).collect()
    assert len(rows) >= 5

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    got = {(r["event_type"], r["q"]): r for r in rows}
    n_rows_expected = 0
    for et, g in ev.groupby("event_type"):
        cents = sorted(max(int(math.floor(float(v) * 100.0)), 1)
                       for v in g["value"])
        buckets = {(c * c).bit_length() - 1 for c in cents}
        for q in (25, 50, 75, 90, 99):
            n_rows_expected += 1
            tgt = (q * len(cents) + 99) // 100
            exact = cents[tgt - 1]
            b = (exact * exact).bit_length() - 1
            est = 1 if b == 0 else math.isqrt(3 * (1 << (b - 1)))
            row = got[(et, q)]
            assert row["n"] == len(cents)
            assert row["n_buckets"] == len(buckets)
            assert row["bucket_sel"] == b
            assert row["est_cents"] == est
            assert row["exact_cents"] == exact
            assert row["rel_err_ppm"] == (abs(est - exact) * 1_000_000
                                          // max(exact, 1))
            assert row["contract_ok"] == 1
            # the tightened contract, integer-exact (and strictly
            # tighter than q491's: est/true <= sqrt(1.5) < 1.5)
            assert 2 * est * est <= 3 * exact * exact
            assert 4 * (est + 1) * (est + 1) > 3 * exact * exact
            # realized error within the bound's ppm ceiling (22.48%)
            assert row["rel_err_ppm"] <= 224745
    assert len(rows) == n_rows_expected


def test_ddsketch_bucket_count_is_bounded(spark, sf_dir):
    """The ENTIRE per-type sketch state (n_buckets) stays under the
    2*63 structural ceiling for gamma = 2^(1/2) — the O(log range)
    claim that makes the sketch mergeable metadata at any volume."""
    rows = q492_ddsketch_quantiles(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r["n_buckets"] <= 126


# ---------------------------------------------------------- q493


def test_streaming_conformal_monitor_matches_independent(
        spark, sf_dir, stream_batches):
    """Pure-Python split-conformal chain (md5 three-way split, integer
    train mean, rank-selected qhat with the +inf sentinel, Hoeffding
    slack) reproduces every row of the TRUE-stream run — the per-batch
    (n_test, n_covered) ADDITION merge lost nothing."""
    rows = sr16.q493_streaming_conformal_monitor(spark, sf_dir).collect()
    assert len(rows) >= 1

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    split = {int(d): _h60(f"cp:{int(d)}") % 3 for d in docs["doc_id"]}
    by_lang: dict[str, dict[int, list]] = {}
    for d, lang, y in zip(docs["doc_id"], docs["lang"], docs["n_chars"]):
        by_lang.setdefault(lang, {0: [], 1: [], 2: []})[
            split[int(d)]].append((int(d), int(y)))

    n_stream = sum(1 for s in split.values() if s == 2)
    bsz = -(-n_stream // stream_batches)
    nb = -(-n_stream // bsz)

    got = {r["lang"]: r for r in rows}
    for lang, parts in by_lang.items():
        train, calib, test = parts[0], parts[1], parts[2]
        if not train or not test:
            assert lang not in got
            continue
        pred = sum(y for _, y in train) // len(train)
        resid = sorted((abs(y - pred), d) for d, y in calib)
        n_calib = len(resid)
        r_rank = ((n_calib + 1) * 9 + 9) // 10
        qhat = resid[r_rank - 1][0] if r_rank <= n_calib else _MAXLONG
        if not calib:
            # no calibration rows at all -> lang absent (inner joins)
            assert lang not in got
            continue
        n_test = len(test)
        n_cov = sum(1 for _, y in test if abs(y - pred) <= qhat)
        cov_ppm = n_cov * 1_000_000 // max(n_test, 1)
        slack = int(math.floor(
            1_000_000.0 * math.sqrt(math.log(20.0) / (2.0 * n_test))))
        row = got[lang]
        assert row["n_train"] == len(train)
        assert row["n_calib"] == n_calib
        assert row["n_test"] == n_test
        assert row["pred_chars"] == pred
        assert row["qhat"] == qhat
        assert row["n_covered"] == n_cov
        assert row["coverage_ppm"] == cov_ppm
        assert row["nominal_ppm"] == 900_000
        assert row["slack_ppm"] == slack
        assert row["alarm"] == (1 if cov_ppm + slack < 900_000 else 0)
        assert row["n_batches"] == nb


def test_conformal_monitor_alarm_fires_on_drift(spark, sf_dir,
                                                stream_batches, tmp_path):
    """End-to-end drift drill: shifting every test-split document's
    n_chars far outside the calibrated band must trip the alarm for
    every language — the monitor's whole point. Built by rewriting the
    documents parquet with drifted y for split-2 rows only (the
    calibration side is untouched, so qhat is unchanged)."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    is_test = docs["doc_id"].map(
        lambda d: _h60(f"cp:{int(d)}") % 3 == 2)
    drifted = docs.copy()
    drifted.loc[is_test, "n_chars"] = (
        drifted.loc[is_test, "n_chars"] + 1_000_000)
    sf2 = tmp_path / "drift_sf"
    sf2.mkdir()
    drifted.to_parquet(sf2 / "documents.parquet", index=False)

    rows = sr16.q493_streaming_conformal_monitor(spark, str(sf2)).collect()
    assert len(rows) >= 1
    for r in rows:
        # a +1e6 shift exceeds any finite qhat from the true residual
        # scale; only the degenerate +inf-sentinel stratum still covers
        if r["qhat"] < 1_000_000:
            assert r["n_covered"] == 0
            assert r["alarm"] == 1


# ---------------------------------------------------------- q494


def _sim_salting(counts: dict, p: int, oversubs) -> dict:
    """Independent pure-Python placement simulation (hashlib only)."""
    total = sum(counts.values())
    target = -(-total // p)
    before = [0] * p
    for k, c in counts.items():
        before[_h60(f"sp:{k}") % p] += c
    out = {}
    for o in oversubs:
        load = [0] * p
        max_salt = n_subkeys = 0
        for k, c in counts.items():
            s0 = -(-c // target)
            s = 1 if s0 == 1 else min(s0 * o, c)
            max_salt = max(max_salt, s)
            n_subkeys += s
            if s == 1:
                load[_h60(f"sp:{k}") % p] += c
                continue
            for i in range(s):
                load[_h60(f"sp:{k}#{i}") % p] += c // s + (
                    1 if i < c % s else 0)
        out[o] = {
            "total": total, "target": target,
            "n_heavy_keys": sum(1 for c in counts.values()
                                if -(-c // target) > 1),
            "max_salt": max_salt, "n_subkeys": n_subkeys,
            "skew_before_ppm": max(before) * 1_000_000 * p // total,
            "max_rows_after": max(load),
            "skew_after_ppm": max(load) * 1_000_000 * p // total,
        }
    return out


def test_salting_planner_matches_independent_sim(spark, sf_dir):
    """The planner's whole sweep equals a pure-Python placement
    simulation over the same md5 lanes, and salting never increases
    the modeled straggler as oversubscription grows (the curve is the
    decision artifact — it must be monotone non-increasing)."""
    rows = q494_skew_salting_planner(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    counts = ev["event_type"].value_counts().to_dict()
    sim = _sim_salting(counts, 32, [r["oversub"] for r in rows])
    assert len(rows) == 4
    prev = None
    for r in sorted(rows, key=lambda r: r["oversub"]):
        want = sim[r["oversub"]]
        for col, val in want.items():
            assert r[col] == val, (r["oversub"], col, r[col], val)
        if prev is not None:
            assert r["max_rows_after"] <= prev
        prev = r["max_rows_after"]


def test_salting_planner_noop_on_unskewed_corpus(spark, tmp_path):
    """On a corpus where no key exceeds the per-partition budget the
    plan must be an honest no-op at EVERY swept oversubscription:
    salt stays 1, nothing is re-placed, after == before."""
    # 64 distinct keys x 10 rows each: target = ceil(640/32) = 20 >= 10
    ev = pd.DataFrame({"event_type": [f"t{k:02d}" for k in range(64)
                                      for _ in range(10)]})
    sf2 = tmp_path / "flat_sf"
    sf2.mkdir()
    ev.to_parquet(sf2 / "events.parquet", index=False)
    rows = q494_skew_salting_planner(spark, str(sf2)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_heavy_keys"] == 0
        assert r["max_salt"] == 1
        assert r["n_subkeys"] == 64
        assert r["skew_after_ppm"] == r["skew_before_ppm"]
        assert r["max_rows_after"] * 1_000_000 * 32 // r["total"] \
            == r["skew_before_ppm"]
