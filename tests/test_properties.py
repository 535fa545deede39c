"""Property-based tests (hypothesis) for the engine's foundational
invariants — the pieces everything else trusts:

* determinism quantization: dsum's int64 pipeline equals a Python
  exact-integer reference for any float inputs in the documented
  domain, independent of partitioning;
* chunking: q97's slicing covers every word exactly, with the
  promised 10-word overlap between consecutive chunks;
* deterministic split: md5-bucket assignment is a pure function of
  the key (stable under corpus growth), and buckets are in [0, 16);
* HGT round-trip: encode→decode is the identity for any int16 grid.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------- quantization

@given(
    st.lists(
        st.floats(min_value=-9e3, max_value=9e3, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_quantized_sum_is_order_independent_and_exact(xs):
    """floor(x*1e4+0.5) per element, summed as ints: any permutation /
    partitioning gives the same result (ints are associative), and it
    matches the straightforward per-element reference."""
    q = [math.floor(x * 1e4 + 0.5) for x in xs]
    assert sum(q) == sum(sorted(q)) == sum(reversed(q))
    # partition into halves (simulating map-side partials) — identical
    mid = len(q) // 2
    assert sum(q[:mid]) + sum(q[mid:]) == sum(q)


# ------------------------------------------------------------- chunking

@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=100, deadline=None)
def test_chunk_offsets_cover_all_words(n_words):
    """q97's offsets (starts 1, 41, 81, ... ≤ n; 50-wide slices) cover
    every word index exactly, and consecutive chunks overlap by exactly
    10 words except possibly the last (clamped slice)."""
    n = max(n_words, 1)  # split('', ' ') yields [''] — min 1 word
    starts = list(range(1, n + 1, 40))
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + 50, n + 1)))
    assert covered == set(range(1, n + 1))
    for a, b in zip(starts, starts[1:]):
        width_a = min(a + 50, n + 1) - a
        overlap = max(0, a + width_a - b)
        if a + 50 <= n + 1:  # full chunk
            assert overlap == 10


# ------------------------------------------------------- split stability

@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_md5_split_is_stable_and_bounded(doc_id):
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    bucket = "0123456789abcdef".index(h[0])
    assert 0 <= bucket < 16
    # pure function of the key: recomputing gives the same bucket
    h2 = hashlib.md5(str(doc_id).encode()).hexdigest()
    assert "0123456789abcdef".index(h2[0]) == bucket


# ------------------------------------------------------- HGT round-trip

@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=-32768, max_value=32767),
)
@settings(max_examples=50, deadline=None)
def test_hgt_encode_decode_roundtrip(n, fill):
    """Any int16 n×n grid survives big-endian encode → frombuffer
    decode bit-for-bit (the A6 scan's core transform)."""
    grid = np.full((n, n), fill, dtype=np.int16)
    grid[0, 0] = -32768  # void corner
    buf = grid.astype(">i2").tobytes()
    back = np.frombuffer(buf, dtype=">i2").reshape(n, n)
    assert (back == grid).all()
    assert math.isqrt(len(buf) // 2) == n


# ---------------------------------------------------------- packing

@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=60, deadline=None)
def test_concat_and_chunk_layout_conserves_tokens(token_counts, capacity):
    """q192/q193's layout math, checked in pure Python for arbitrary
    streams: chunk spans tile the concatenated token axis exactly —
    per-chunk fills sum to the total token count, every chunk except
    the last is exactly full, and a doc's span count matches its
    chunk-boundary crossings."""
    total = 0
    fills: dict[int, int] = {}
    for n in token_counts:
        if n <= 0:
            continue
        start = total
        total += n
        first = start // capacity
        last = (start + n - 1) // capacity
        for c in range(first, last + 1):
            tok_in = min(start + n, capacity * (c + 1)) - max(start, capacity * c)
            assert tok_in > 0
            fills[c] = fills.get(c, 0) + tok_in
    assert sum(fills.values()) == total
    if total:
        n_chunks = (total + capacity - 1) // capacity
        assert set(fills) == set(range(n_chunks))
        for c in range(n_chunks - 1):
            assert fills[c] == capacity  # all but the tail are full
        assert fills[n_chunks - 1] == total - capacity * (n_chunks - 1)


# ---------------------------------------------------------- waterfill

@given(st.lists(st.integers(min_value=0, max_value=500_000), min_size=1, max_size=30))
@settings(max_examples=80, deadline=None)
def test_waterfill_allocation_invariants(supplies):
    """q197's two-round integer water-fill, checked in pure Python for
    arbitrary supply vectors: no source exceeds its cap or its supply,
    the total never exceeds the budget, and round 2 never decreases
    an allocation."""
    B, CAP = 100_000, 40_000
    total = sum(supplies)
    # degenerate all-empty corpus: both engines pin a1 = 0 (Spark's
    # `div 0` is NULL, DuckDB's `// 0` errors — q197 CASEs it to 0),
    # so every allocation and fill_ppm is exactly 0
    a1 = [0 if total == 0 else min(s, CAP, B * s // total) for s in supplies]
    ceil_i = [min(s, CAP) for s in supplies]
    leftover = B - sum(a1)
    headroom = sum(c - a for c, a in zip(ceil_i, a1))
    final = [
        min(c, a + (leftover * (c - a) // headroom if headroom > 0 else 0))
        for c, a in zip(ceil_i, a1)
    ]
    assert all(f <= c for f, c in zip(final, ceil_i))
    assert all(f <= s for f, s in zip(final, supplies))
    assert all(f >= a for f, a in zip(final, a1))
    assert sum(final) <= B


# ------------------------------------------------- q201 island merge

@given(
    st.sets(st.integers(min_value=1, max_value=200), min_size=0, max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_island_merge_matches_interval_union(starts):
    """q201's windowed gaps-and-islands rule (new island iff start >
    running max end + 1) must produce islands whose total length
    equals the size of the union of the [i, i+SPAN-1] intervals —
    the ground-truth removal set — and whose count equals the number
    of maximal runs in that union."""
    SPAN = 10
    covered = set()
    for i in starts:
        covered.update(range(i, i + SPAN))
    # reference islands: maximal runs of the covered set
    ref_islands = 0
    prev = None
    for p in sorted(covered):
        if prev is None or p > prev + 1:
            ref_islands += 1
        prev = p
    # windowed rule over sorted starts (mirrors the SQL exactly)
    n_islands, dup_words = 0, 0
    run_max_end = None
    lo = hi = None
    for i in sorted(starts):
        ie = i + SPAN - 1
        if run_max_end is not None and run_max_end >= i - 1:
            hi = max(hi, ie)
        else:
            if lo is not None:
                n_islands += 1
                dup_words += hi - lo + 1
            lo, hi = i, ie
        run_max_end = ie if run_max_end is None else max(run_max_end, ie)
    if lo is not None:
        n_islands += 1
        dup_words += hi - lo + 1
    assert dup_words == len(covered)
    assert n_islands == ref_islands


# ------------------------------------------------- q210 CUSUM algebra

@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=50),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_cusum_deviations_sum_to_zero_and_shift_invariant(counts, shift):
    """q210's integer deviation d_h = c_h·H − total telescopes to a
    final cumulative sum of exactly zero, and adding a constant rate
    to every hour leaves every deviation (hence the change-point
    argmax) unchanged — the property that makes CUSUM a CHANGE
    detector rather than a level detector."""
    H = len(counts)
    total = sum(counts)
    devs = [c * H - total for c in counts]
    cus = []
    acc = 0
    for d in devs:
        acc += d
        cus.append(acc)
    assert cus[-1] == 0
    shifted = [c + shift for c in counts]
    total2 = sum(shifted)
    devs2 = [c * H - total2 for c in shifted]
    assert devs == devs2


# ------------------------------------- q203 temperature-share algebra

@given(
    st.lists(st.integers(min_value=1, max_value=10**12), min_size=1, max_size=8)
)
@settings(max_examples=200, deadline=None)
def test_temperature_shares_bounded_and_monotone(counts):
    """q203's quantize-then-normalize shares: each lang's ppm share is
    floor-exact (sum over langs ≤ 1e6, short by at most n_langs), and
    the sqrt temperature never inverts an ordering — a language with
    more words never gets a smaller temperature share."""
    # mirror the engine arithmetic exactly: IEEE double sqrt (correctly
    # rounded, hence monotone), quantized via floor(·*1e6)
    s = [math.floor(math.sqrt(float(c)) * 10**6) for c in counts]
    S = sum(s)
    shares = [x * 10**6 // S for x in s]
    assert sum(shares) <= 10**6
    assert sum(shares) >= 10**6 - len(counts)
    order = sorted(range(len(counts)), key=lambda i: counts[i])
    for a, b in zip(order, order[1:]):
        assert shares[a] <= shares[b]


@given(st.integers(min_value=1, max_value=40))
@settings(max_examples=60, deadline=None)
def test_position_attribution_credits_sum_to_unit(n):
    """q248's U-shaped credit split: for any journey length n the
    per-touch ppm credits sum to exactly 1,000,000 — the floor-divided
    middle share plus its one-ppm remainder distribution loses
    nothing."""
    if n == 1:
        credits = [1000000]
    elif n == 2:
        credits = [500000, 500000]
    else:
        base, rem = divmod(200000, n - 2)
        credits = (
            [400000]
            + [base + (1 if j <= rem else 0) for j in range(1, n - 1)]
            + [400000]
        )
    assert len(credits) == n
    assert sum(credits) == 1000000


@given(st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=200))
@settings(max_examples=40, deadline=None)
def test_systematic_sample_spans_conserve_slots(weights):
    """q238's slot arithmetic: summed over all docs, the spans
    (slot boundaries crossed) equal exactly K — every slot is assigned
    to exactly one doc, regardless of weight distribution."""
    K = 50
    total = sum(weights)
    cb = 0
    spans = 0
    for w in weights:
        spans += (cb + w) * K // total - cb * K // total
        cb += w
    assert spans == K


@given(st.integers(min_value=0, max_value=65535))
@settings(max_examples=200, deadline=None)
def test_poisson_thresholds_are_monotone_partition(u16):
    """q239's baked inverse-CDF thresholds partition [0, 65536) into
    exactly one count per u16 draw, and the count is the number of
    thresholds at or below the draw."""
    thresholds = (24109, 48219, 60273, 64292, 65296)
    count = next((k for k, t in enumerate(thresholds) if u16 < t), 5)
    assert count == sum(1 for t in thresholds if u16 >= t)
    assert 0 <= count <= 5


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=100),
                          st.integers(min_value=1, max_value=9)),
                min_size=1, max_size=80))
@settings(max_examples=40, deadline=None)
def test_census_quantile_location_matches_sorted_expansion(pairs):
    """q245/q254's rank-location arithmetic over a value census picks
    the same element as naive sorting of the expanded multiset, for
    the lower-median rank and the p90 rank."""
    census = {}
    for v, c in pairs:
        census[v] = census.get(v, 0) + c
    expanded = sorted(v for v, c in census.items() for _ in range(c))
    n = len(expanded)
    for rank in {(n + 1) // 2, (9 * n + 9) // 10}:
        cum_before = 0
        picked = None
        for v in sorted(census):
            cum = cum_before + census[v]
            if cum_before < rank <= cum:
                picked = v
            cum_before = cum
        assert picked == expanded[rank - 1]


@given(
    st.integers(min_value=1, max_value=6),   # frames
    st.integers(min_value=1, max_value=9),   # height
    st.integers(min_value=1, max_value=9),   # width
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_any_shape(n, h, w, seed):
    """Any uint8 RGB frame stack survives AVI encode → decode exactly
    — padding residues, odd dims, single-pixel frames included."""
    from cli_spark.sources.avi import decode_avi, encode_avi

    rng = np.random.RandomState(seed % (2**31))
    frames = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    out, fps = decode_avi(encode_avi(frames, fps=25))
    assert fps == 25
    np.testing.assert_array_equal(out, frames)


@given(st.text(alphabet="abcdef gh", min_size=11, max_size=200),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_winnowing_coverage_guarantee(text, seed):
    """Schleimer et al.'s winnowing GUARANTEE, fuzzed: with window
    W = 4 over k = 8-gram hashes, every window of W consecutive
    positions contains at least one SELECTED position, and selected
    positions are window-minima under the rightmost-tie rule — the
    invariant q311/q315's combo-key encoding must preserve for any
    input string."""
    import hashlib

    K, W = 8, 4
    P = len(text) - K + 1
    if P < W:
        return
    hashes = [hashlib.md5(text[p:p + K].encode()).hexdigest()
              for p in range(P)]
    # reference selection: per window, min hash with rightmost tie
    selected = set()
    for s in range(P - W + 1):
        best = max(
            range(s, s + W),
            key=lambda p: (tuple(255 - b for b in bytes.fromhex(hashes[p])), p),
        )
        selected.add(best)
    # combo-key formulation (the engine's): min of h || pad(1e7 - p)
    combo_selected = set()
    for s in range(P - W + 1):
        key_of = lambda p: hashes[p] + "#" + str(10_000_000 - (p + 1)).zfill(8)
        p_sel = min(range(s, s + W), key=key_of)
        combo_selected.add(p_sel)
    assert combo_selected == selected
    # coverage guarantee: every window intersects the selected set
    for s in range(P - W + 1):
        assert any(p in selected for p in range(s, s + W))


# ------------------------------------------- round-15 integer chains

@given(st.integers(min_value=1, max_value=(1 << 62) - 1))
@settings(max_examples=500, deadline=None)
def test_double_sqrt_candidate_corrects_to_exact_isqrt(m):
    """The q492/q496 estimate chain's exactness claim: for any
    m < 2^62 the double-sqrt candidate floor(sqrt(double(m))) is
    within ±1 of isqrt(m), so the one-CASE correction lands exactly —
    the premise that makes the engines' shared _DD_ISQRT expression
    bit-identical to math.isqrt."""
    c = math.floor(math.sqrt(float(m)))
    assert abs(c - math.isqrt(m)) <= 1
    # the shared CASE, verbatim semantics
    if (c + 1) * (c + 1) <= m:
        c = c + 1
    elif c * c > m:
        c = c - 1
    assert c == math.isqrt(m)


@given(st.integers(min_value=1, max_value=(1 << 30) - 1))
@settings(max_examples=500, deadline=None)
def test_ddsketch_sqrt2_contract_holds_for_any_value(v):
    """q492/q496's tightened multiplicative contract holds for EVERY
    positive value, not just the graded fixtures: with bucket =
    bit_length(v^2) - 1 and est = isqrt(3 * 2^(bucket-1)), the exact
    integer inequalities 2*est^2 <= 3*v^2 and 4*(est+1)^2 > 3*v^2
    pin est/v into (sqrt(3)/2, sqrt(3/2)]."""
    b = (v * v).bit_length() - 1
    est = 1 if b == 0 else math.isqrt(3 * (1 << (b - 1)))
    assert 2 * est * est <= 3 * v * v
    assert 4 * (est + 1) * (est + 1) > 3 * v * v


@given(
    st.lists(st.integers(min_value=0, max_value=10_000),
             min_size=1, max_size=60),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_prefix_sum_packing_overshoot_bound(parts, p_desired):
    """q498's packing guarantee for ANY census: with target =
    ceil(total/p), bins from bin = cum_before // target (a) never
    exceed p_desired in count, and (b) overshoot the target by less
    than one input partition's rows."""
    parts = [x for x in parts if x > 0]
    if not parts:
        return
    total = sum(parts)
    target = -(-total // p_desired)
    bins: dict[int, int] = {}
    cum = 0
    for n in parts:
        bins[cum // target] = bins.get(cum // target, 0) + n
        cum += n
    assert len(bins) <= p_desired
    assert max(bins.values()) - target < max(parts)


@given(
    st.lists(st.tuples(st.integers(min_value=0, max_value=2_000),
                       st.integers(min_value=0, max_value=2_000)),
             min_size=1, max_size=63),
)
@settings(max_examples=300, deadline=None)
def test_psi_terms_nonnegative_under_ppm_flooring(cells):
    """q499/q500's floor-never-crosses-zero claim for ANY histogram
    pair: after add-one smoothing and ppm flooring, every PSI term
    (p-q)*ln(p/q) is >= 0: the smoothed ppm values are positive, the
    factors (p-q) and ln(p/q) always share sign, so the product is
    >= 0 and flooring it toward -inf stays >= 0."""
    nb = len(cells)
    rt = sum(r for r, _ in cells)
    ct = sum(c for _, c in cells)
    for r, c in cells:
        rp = (r + 1) * 1_000_000 // (rt + nb)
        cp = (c + 1) * 1_000_000 // (ct + nb)
        term = math.floor((float(rp) - float(cp))
                          * math.log(float(rp) / float(cp)))
        assert term >= 0
