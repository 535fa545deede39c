"""Semantic invariants for the round-14-build operators (q481–q491)
— properties both engines could get wrong together, plus independent
reimplementations (hashlib/pandas/math, no shared SQL text) so a
shared-oracle bug cannot hide."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

import cli_spark.streaming.round15 as sr15
from cli_spark.operators.round15 import (
    q482_greedy_set_cover,
    q483_priority_merge_equivalence,
    q484_conformal_calibration,
    q485_empirical_bernstein_audit,
)

_TWO60 = 1152921504606846976


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------- q481


def test_streaming_theta_matches_independent_bottomk(spark, sf_dir,
                                                     stream_batches):
    """Pure-Python bottom-64 theta intersections over the events table
    reproduce every pairwise row of the TRUE-stream run — i.e. the
    order-statistic merge of per-batch sketches lost nothing. Batch
    count comes from the stream_batches fast-mode fixture; the merge
    property is batch-count-invariant (the graded query runs ~20)."""
    rows = sr15.q481_streaming_theta_intersection(spark, sf_dir).collect()
    assert len(rows) >= 1

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "ts"])
    keys = (ev["user_id"].astype("int64").astype(str) + ":"
            + ev["ts"].dt.date.astype(str))
    pool: dict[str, set[int]] = {}
    for et, k in zip(ev["event_type"], keys):
        pool.setdefault(et, set()).add(_h60(k))
    n = len(ev)
    bsz = -(-n // stream_batches)
    nb = -(-n // bsz)
    got = {(r["s1"], r["s2"]): r for r in rows}
    types = sorted(pool)
    expected_pairs = {(a, b) for i, a in enumerate(types)
                      for b in types[i + 1:]}
    assert set(got) == expected_pairs
    for (s1, s2), r in got.items():
        sk1 = set(sorted(pool[s1])[:64])
        sk2 = set(sorted(pool[s2])[:64])
        union = sorted(sk1 | sk2)
        theta = union[63] if len(union) >= 64 else _TWO60
        below = sum(1 for h in sk1 & sk2 if h < theta)
        est = math.floor(below * float(_TWO60) / float(theta))
        exact = len(pool[s1] & pool[s2])
        assert r["exact_inter"] == exact
        assert r["est_inter"] == est
        assert r["err_ppm"] == abs(est - exact) * 1_000_000 // max(exact, 1)
        assert r["n_batches"] == nb
        # exact-fallback contract: a merged union under 64 hashes IS
        # the union, so the estimate must be exact
        if len(union) < 64:
            assert r["est_inter"] == r["exact_inter"]


# ---------------------------------------------------------- q482


def _doc_shingles(text: str) -> set[int]:
    """Distinct word-3-gram 60-bit hashes — the engines' coverage
    elements (they ride the shingle_hash_pool cache)."""
    w = text.split(" ")
    if len(w) < 3:
        return set()
    return {_h60(" ".join(w[i:i + 3])) for i in range(len(w) - 2)}


def test_set_cover_matches_independent_greedy(spark, sf_dir):
    """Pure-pandas cost-benefit greedy reproduces all 8 picks, gains,
    costs, ratios, and the cumulative coverage."""
    rows = q482_greedy_set_cover(spark, sf_dir).collect()
    assert len(rows) == 8

    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"])
    sh = {int(r.doc_id): _doc_shingles(r.text) for r in d.itertuples()}
    sh = {k: v for k, v in sh.items() if v}
    cost = {int(r.doc_id): max(int(r.n_chars), 1) for r in d.itertuples()}
    covered: set[str] = set()
    chosen: set[int] = set()
    cum = 0
    for t, r in enumerate(rows):
        best = None
        for doc, s in sh.items():
            if doc in chosen:
                continue
            gain = len(s - covered)
            if gain == 0:
                continue  # drops out of the engines' groupBy too
            ratio = gain * 1_000_000 // cost[doc]
            key = (-ratio, doc)
            if best is None or key < best[0]:
                best = (key, doc, gain, ratio)
        _, doc, gain, ratio = best
        cum += gain
        assert r["step"] == t
        assert r["doc_id"] == doc
        assert r["gain_shingles"] == gain
        assert r["cost_chars"] == cost[doc]
        assert r["ratio_ppm"] == ratio
        assert r["cum_covered"] == cum
        covered |= sh[doc]
        chosen.add(doc)


def test_set_cover_ratio_nonincreasing(spark, sf_dir):
    """Submodularity: every doc's marginal gain shrinks as coverage
    grows, so the picked benefit/cost ratio is non-increasing."""
    rows = q482_greedy_set_cover(spark, sf_dir).collect()
    ratios = [r["ratio_ppm"] for r in sorted(rows, key=lambda r: r["step"])]
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))
    cums = [r["cum_covered"] for r in sorted(rows, key=lambda r: r["step"])]
    assert all(b > a for a, b in zip(cums, cums[1:]))


# ---------------------------------------------------------- q483


def test_priority_merge_equivalence_holds(spark, sf_dir):
    """The theorem under grade: shard-wise top-11 merge == corpus-wise
    reservoir, so the two estimates are equal integers for EVERY
    stratum, and the shard stage ships at most 4*(k+1) rows."""
    rows = q483_priority_merge_equivalence(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["merge_exact"] == 1
        assert r["est_micro_sharded"] == r["est_micro_corpus"]
        assert r["shipped_rows"] <= r["n_shards"] * 11
        assert r["shipped_rows"] <= r["n_docs"]


def test_priority_merge_matches_q472_estimate(spark, sf_dir):
    """Cross-query consistency: the corpus-wise estimate here IS
    q472's est_micro (same priorities, same k, same HT terms)."""
    from cli_spark.operators.round14 import q472_horvitz_thompson_audit

    q472 = {r["lang"]: r["est_micro"]
            for r in q472_horvitz_thompson_audit(spark, sf_dir).collect()}
    for r in q483_priority_merge_equivalence(spark, sf_dir).collect():
        assert r["est_micro_corpus"] == q472[r["lang"]]


# ---------------------------------------------------------- q484


def test_conformal_matches_independent_reimpl(spark, sf_dir):
    """Pure-Python split-conformal reimplementation (hashlib splits,
    integer mean, rank-selected qhat, test coverage) reproduces every
    column, including the +inf sentinel when r > n_calib."""
    rows = {r["lang"]: r
            for r in q484_conformal_calibration(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    d["split"] = [
        _h60(f"cp:{int(i)}") % 3 for i in d["doc_id"]]
    for lang, g in d.groupby("lang"):
        tr = g[g["split"] == 0]
        ca = g[g["split"] == 1]
        te = g[g["split"] == 2]
        if len(tr) == 0 or len(ca) == 0 or len(te) == 0:
            assert lang not in rows
            continue
        pred = int(tr["n_chars"].sum()) // len(tr)
        resid = sorted(abs(int(y) - pred) for y in ca["n_chars"])
        r_rank = ((len(ca) + 1) * 9 + 9) // 10
        qhat = (resid[r_rank - 1] if r_rank <= len(ca)
                else 9223372036854775807)
        covered = sum(1 for y in te["n_chars"]
                      if abs(int(y) - pred) <= qhat)
        row = rows[lang]
        assert row["n_train"] == len(tr)
        assert row["n_calib"] == len(ca)
        assert row["n_test"] == len(te)
        assert row["pred_chars"] == pred
        assert row["qhat"] == qhat
        assert row["n_covered"] == covered
        assert row["coverage_ppm"] == covered * 1_000_000 // max(len(te), 1)
        assert row["nominal_ppm"] == 900000


# ---------------------------------------------------------- q485


def test_empirical_bernstein_matches_independent_reimpl(spark, sf_dir):
    """Pure-Python Maurer–Pontil and Hoeffding half-widths from the
    same integer sufficient statistics reproduce every column; the
    coverage and tightness flags must agree with the floored-micro
    comparisons, and a census stratum (sample == population) must
    realize zero error."""
    rows = {r["lang"]: r for r in
            q485_empirical_bernstein_audit(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    ln40 = math.log(40.0)
    for lang, g in d.groupby("lang"):
        ordered = sorted(
            (( _h60(f"eb:{int(r.doc_id)}"), int(r.doc_id), int(r.n_chars))
             for r in g.itertuples()))
        samp = [y for _, _, y in ordered[:64]]
        n_s, sy, sy2 = len(samp), sum(samp), sum(y * y for y in samp)
        n_t, ty, rng = len(g), int(g["n_chars"].sum()), int(g["n_chars"].max())
        err = abs(sy / n_s - ty / n_t)
        v = 0.0 if n_s < 2 else (sy2 - sy * sy / n_s) / (n_s - 1.0)
        eb = (float(rng) if n_s < 2 else
              math.sqrt(2.0 * v * ln40 / n_s)
              + 7.0 * rng * ln40 / (3.0 * (n_s - 1.0)))
        ho = rng * math.sqrt(ln40 / (2.0 * n_s))
        row = rows[lang]
        assert row["n_total"] == n_t
        assert row["n_sample"] == n_s
        assert row["range_r"] == rng
        assert row["err_micro"] == math.floor(err * 1e6)
        assert row["eb_halfwidth_micro"] == math.floor(eb * 1e6)
        assert row["hoeff_halfwidth_micro"] == math.floor(ho * 1e6)
        assert row["eb_covered"] == (1 if row["err_micro"]
                                     <= row["eb_halfwidth_micro"] else 0)
        assert row["hoeff_covered"] == (1 if row["err_micro"]
                                        <= row["hoeff_halfwidth_micro"]
                                        else 0)
        assert row["eb_tighter"] == (1 if row["eb_halfwidth_micro"]
                                     < row["hoeff_halfwidth_micro"] else 0)
        if n_s == n_t:
            assert row["err_micro"] == 0
            assert row["eb_covered"] == 1 and row["hoeff_covered"] == 1


# ---------------------------------------------------------- q486


def test_streaming_priority_sample_matches_corpus_estimator(
        spark, sf_dir, stream_batches):
    """Pure-Python corpus-wise Duffield–Lund–Thorup estimator
    reproduces the stream's batch-reservoir-merged estimate exactly
    (the mergeability theorem end-to-end through a real stream), and
    the communication bound holds: at most (k+1) rows per stratum per
    micro-batch shipped."""
    rows = sr15.q486_streaming_priority_sample(spark, sf_dir).collect()
    assert len(rows) >= 1

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    two60 = float(_TWO60)
    got = {r["event_type"]: r for r in rows}
    for et, g in ev.groupby("event_type"):
        items = []
        for r in g.itertuples():
            w = max(int(math.floor(float(r.value) * 100.0)), 1)
            u = (_h60(str(int(r.event_id))) + 1.0) / two60
            items.append((w / u, int(r.event_id), w))
        items.sort(key=lambda t: (-t[0], t[1]))
        tau = items[10][0] if len(items) > 10 else 0.0
        est = sum(int(math.floor(max(float(w), tau) * 1e6))
                  for _, _, w in items[:10])
        exact = sum(w for _, _, w in items)
        row = got[et]
        assert row["est_micro"] == est
        assert row["w_exact"] == exact
        assert row["n_events"] == len(g)
        assert row["n_batches"] >= 2
        assert row["shipped_rows"] <= 11 * row["n_batches"]
        # HT sanity at k=10: the estimator's relative std is
        # ~1/sqrt(k-1) ~ 33%, and sf0.001's tiny strata realize up to
        # ~2 sigma — guard only gross regressions (sign/scale bugs)
        assert 0 < row["est_micro"] / 1e6 < 4 * exact


# ---------------------------------------------------------- q487


def test_filter_cascade_matches_independent_ordering(spark, sf_dir):
    """Independent cascade math over q162's own gate output (gate
    correctness is q162's test's job; here the ordering, survival, and
    expected-cost accounting are recomputed in pure Python), plus the
    cross-query invariant: survivors after all five stages == q162's
    keep count, regardless of order."""
    from cli_spark.operators.corpus_stats import q162_gopher_rules
    from cli_spark.operators.round15 import (
        _CASCADE_COSTS,
        q487_filter_cascade_ordering,
    )

    rows = sorted(q487_filter_cascade_ordering(spark, sf_dir).collect(),
                  key=lambda r: r["cascade_pos"])
    assert [r["cascade_pos"] for r in rows] == [1, 2, 3, 4, 5]

    gates = q162_gopher_rules(spark, sf_dir).collect()
    n_docs = len(gates)
    cost = dict(_CASCADE_COSTS)
    rej = {r: sum(0 if g[r] else 1 for g in gates) for r in cost}
    order = sorted(cost, key=lambda r: (-(rej[r] * 1_000_000 // cost[r]), r))
    # survival under the chosen order from the TRUE joint matrix
    surv_prev = n_docs
    cum = 0
    for pos, (r, row) in enumerate(zip(order, rows), start=1):
        assert row["rule"] == r
        assert row["cost_milli"] == cost[r]
        assert row["n_reject_alone"] == rej[r]
        assert row["reject_per_cost_ppm"] == rej[r] * 1_000_000 // cost[r]
        surv = sum(1 for g in gates if all(g[x] for x in order[:pos]))
        assert row["n_survivors"] == surv
        term = cost[r] * 1_000_000 * surv_prev // n_docs
        assert row["eval_cost_micro"] == term
        cum += term
        assert row["cum_cost_micro"] == cum
        surv_prev = surv
    keep = sum(1 for g in gates if g["keep"])
    assert rows[-1]["n_survivors"] == keep
    survs = [r["n_survivors"] for r in rows]
    assert all(a >= b for a, b in zip(survs, survs[1:]))


# ---------------------------------------------------------- q488


def test_snis_matches_independent_reimpl(spark, sf_dir):
    """Pure-Python SNIS/ESS reimplementation (hashlib sample, integer
    micro weights, Kong's ESS) reproduces every column per source, and
    the structural invariants hold: ess_ppm in (0, 1e6]; a
    single-language source has w constant => ESS exactly 1e6 and the
    SNIS estimate equals the plain sample mean."""
    from cli_spark.operators.round15 import q488_snis_reweighting_audit

    rows = {r["source"]: r
            for r in q488_snis_reweighting_audit(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang", "n_chars"])
    for source, g in d.groupby("source"):
        n_src = len(g)
        langs = g.groupby("lang").size().to_dict()
        k = len(langs)
        w = {l: math.floor(1e6 * n_src / (k * n)) for l, n in langs.items()}
        ordered = sorted(
            ((_h60(f"is:{int(r.doc_id)}"), int(r.doc_id), r.lang,
              int(r.n_chars)) for r in g.itertuples()))
        samp = ordered[:64]
        sw = sum(w[l] for _, _, l, _ in samp)
        swy = sum(w[l] * y for _, _, l, y in samp)
        sw2 = sum(w[l] * w[l] for _, _, l, _ in samp)
        est = math.floor(1e6 * swy / sw)
        ess = math.floor(1e6 * sw * sw / (len(samp) * sw2))
        exact = sum(
            math.floor(1e6 * int(gg["n_chars"].sum()) / len(gg))
            for _, gg in g.groupby("lang")) // k
        row = rows[source]
        assert row["n_corpus"] == n_src
        assert row["n_samp"] == len(samp)
        assert row["k_langs"] == k
        assert row["exact_micro"] == exact
        assert row["est_micro"] == est
        assert row["ess_ppm"] == ess
        assert row["err_ppm"] == math.floor(
            (est - exact) * 1e6 / max(exact, 1))
        assert 0 < row["ess_ppm"] <= 1_000_000
        if k == 1:
            assert row["ess_ppm"] == 1_000_000


# ---------------------------------------------------------- q489


def test_adaptive_cascade_matches_independent_loop(spark, sf_dir):
    """Independent Python one-step-lookahead loop over q162's gate
    output reproduces every adaptive row; position 1 must equal the
    static plan's first pick (conditional == marginal on the full
    corpus); the FINAL survivor count equals q487's (any order of the
    same five gates keeps exactly the keep set); saved_micro is the
    static-minus-adaptive difference (sign NOT asserted — greedy is
    not globally optimal and the audit reports reality)."""
    from cli_spark.operators.corpus_stats import q162_gopher_rules
    from cli_spark.operators.round15 import (
        _CASCADE_COSTS,
        q487_filter_cascade_ordering,
        q489_adaptive_cascade_reorder,
    )

    rows = sorted(q489_adaptive_cascade_reorder(spark, sf_dir).collect(),
                  key=lambda r: r["cascade_pos"])
    static = sorted(q487_filter_cascade_ordering(spark, sf_dir).collect(),
                    key=lambda r: r["cascade_pos"])
    assert rows[0]["rule"] == static[0]["rule"]
    assert rows[-1]["n_survivors"] == static[-1]["n_survivors"]

    gates = {g["doc_id"]: g for g in q162_gopher_rules(spark, sf_dir).collect()}
    n_docs = len(gates)
    cost = dict(_CASCADE_COSTS)
    alive = set(gates)
    chosen: list[str] = []
    cum = 0
    n_prev = n_docs
    for row in rows:
        best = None
        for r in cost:
            if r in chosen:
                continue
            rej = sum(1 for d in alive if not gates[d][r])
            ratio = rej * 1_000_000 // cost[r]
            key = (-ratio, r)
            if best is None or key < best[0]:
                best = (key, r, rej, ratio)
        _, r, rej, ratio = best
        alive = {d for d in alive if gates[d][r]}
        term = cost[r] * 1_000_000 * n_prev // n_docs
        cum += term
        assert row["rule"] == r
        assert row["cond_reject"] == rej
        assert row["cond_ratio_ppm"] == ratio
        assert row["n_survivors"] == len(alive)
        assert row["eval_cost_micro"] == term
        assert row["cum_cost_micro"] == cum
        assert row["saved_micro"] == (row["static_cum_cost_micro"]
                                      - row["cum_cost_micro"])
        chosen.append(r)
        n_prev = len(alive)
    keep = sum(1 for g in gates.values() if g["keep"])
    assert rows[-1]["n_survivors"] == keep


# ---------------------------------------------------------- q490


def test_neyman_realization_matches_independent_reimpl(spark, sf_dir):
    """Pure-Python reimplementation (q475's allocation math, nested
    md5 bottom-k draws, per-stratum-floored stratified estimators)
    reproduces every column; allocations are clamped to [1, n_h]; the
    corpus-level estimate/error columns are constant across rows."""
    from cli_spark.operators.round15 import (
        q490_neyman_realization_audit,
    )

    rows = {r["lang"]: r for r in
            q490_neyman_realization_audit(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    # allocation from sufficient stats (q475's chain)
    stats = {}
    for lang, g in d.groupby("lang"):
        n_h = len(g)
        sy = int(g["n_chars"].sum())
        sy2 = int((g["n_chars"].astype("int64") ** 2).sum())
        s_h = (0.0 if n_h < 2 else
               math.sqrt((sy2 - sy * sy / n_h) / (n_h - 1.0)))
        stats[lang] = (n_h, sy, math.floor(n_h * s_h * 1e6))
    n_tot = sum(v[0] for v in stats.values())
    a = sum(v[2] for v in stats.values())
    terms_p, terms_n, sum_y_all = [], [], 0
    expected = {}
    for lang, (n_h, sy, nhs) in stats.items():
        if a == 0:
            k_ney_raw = 0
        else:
            k_ney_raw = math.floor(
                math.floor(100e6 * nhs / a) / 1e6)
        k_ney = min(max(k_ney_raw, 1), n_h)
        k_prop = min(max(math.floor(100.0 * n_h / n_tot), 1), n_h)
        g = d[d["lang"] == lang]
        ranked = sorted(
            ((_h60(f"ns:{int(r.doc_id)}"), int(r.doc_id), int(r.n_chars))
             for r in g.itertuples()))
        sy_p = sum(y for _, _, y in ranked[:k_prop])
        sy_n = sum(y for _, _, y in ranked[:k_ney])
        expected[lang] = dict(
            n_h=n_h, k_prop=k_prop, k_ney=k_ney,
            mean_true_micro=sy * 1_000_000 // n_h,
            samp_mean_prop_micro=sy_p * 1_000_000 // k_prop,
            samp_mean_ney_micro=sy_n * 1_000_000 // k_ney,
        )
        terms_p.append(n_h * sy_p * 1_000_000 // k_prop)
        terms_n.append(n_h * sy_n * 1_000_000 // k_ney)
        sum_y_all += sy
    est_p = sum(terms_p) // n_tot
    est_n = sum(terms_n) // n_tot
    t_micro = sum_y_all * 1_000_000 // n_tot
    for lang, exp in expected.items():
        row = rows[lang]
        for k, v in exp.items():
            assert row[k] == v, (lang, k, row[k], v)
        assert 1 <= row["k_ney"] <= row["n_h"]
        assert 1 <= row["k_prop"] <= row["n_h"]
        assert row["est_st_prop_micro"] == est_p
        assert row["est_st_ney_micro"] == est_n
        assert row["err_prop_ppm"] == math.floor(
            (est_p - t_micro) * 1e6 / t_micro)
        assert row["err_ney_ppm"] == math.floor(
            (est_n - t_micro) * 1e6 / t_micro)


# ---------------------------------------------------------- q491


def test_logbucket_quantiles_match_independent_and_contract(
        spark, sf_dir, stream_batches):
    """Pure-Python log-bucket histogram + rank selection reproduces
    every row of the TRUE-stream run (bucket-addition merge lost
    nothing), and the multiplicative contract holds as EXACT integer
    inequalities: the rank-selected bucket contains the true quantile,
    so 4*est > 3*exact and 2*est <= 3*exact for every row."""
    rows = sr15.q491_streaming_logbucket_quantiles(spark, sf_dir).collect()
    assert len(rows) >= 3

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    n = len(ev)
    bsz = -(-n // stream_batches)
    nb = -(-n // bsz)
    got = {(r["event_type"], r["q"]): r for r in rows}
    for et, g in ev.groupby("event_type"):
        cents = sorted(max(int(math.floor(float(v) * 100.0)), 1)
                       for v in g["value"])
        for q in (50, 90, 99):
            tgt = (q * len(cents) + 99) // 100
            exact = cents[tgt - 1]
            b = exact.bit_length() - 1
            est = 1 if b == 0 else (1 << b) + (1 << (b - 1))
            row = got[(et, q)]
            assert row["n"] == len(cents)
            assert row["bucket_sel"] == b
            assert row["est_cents"] == est
            assert row["exact_cents"] == exact
            assert row["rel_err_ppm"] == (abs(est - exact) * 1_000_000
                                          // max(exact, 1))
            assert row["n_batches"] == nb
            # multiplicative contract, integer-exact
            assert 4 * row["est_cents"] > 3 * row["exact_cents"]
            assert 2 * row["est_cents"] <= 3 * row["exact_cents"]
