"""q442: the generated Hilbert SQL must BE the Hilbert curve.

Cross-engine parity alone cannot catch a deterministic-but-wrong
curve (engine and oracle share the generated text), so this suite
pins the curve against an independent pure-Python xy2d reference and
against the defining property: a bijection whose inverse walk moves
exactly one cell per step."""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401

N = 256


def xy2d_ref(x: int, y: int) -> int:
    """Classic xy2d (Wikipedia Hilbert-curve C code), n = 256."""
    d = 0
    s = N // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = N - 1 - x
                y = N - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_reference_curve_is_bijective_and_adjacent():
    n = 64  # full 256x256 is slow in pure Python; 64 pins the recursion
    inv = {}
    s_levels = [32, 16, 8, 4, 2, 1]

    def xy2d_n(x, y):
        d = 0
        for s in s_levels:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
        return d

    for x in range(n):
        for y in range(n):
            inv[xy2d_n(x, y)] = (x, y)
    assert len(inv) == n * n
    for d in range(1, n * n):
        x0, y0 = inv[d - 1]
        x1, y1 = inv[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_generated_sql_matches_python_reference(spark):  # noqa: F811
    from cli_spark.operators.layout import _hilbert_ctes

    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0), (128, 127)]
    values = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = f"""
WITH h0 AS (
  SELECT b1, b2, b1 AS hx, b2 AS hy, 0 AS hd
  FROM VALUES {values} AS t(b1, b2)
),{_hilbert_ctes()}
SELECT b1, b2, hd FROM h8
"""
    got = {(r["b1"], r["b2"]): r["hd"] for r in spark.sql(sql).collect()}
    for x, y in pts:
        assert got[(x, y)] == xy2d_ref(x, y), (x, y)


def test_census_conservation_and_hilbert_wins_square_probe(spark):  # noqa: F811
    from cli_spark.plans.registry import registry

    rows = registry()["q442_hilbert_layout"].fn(
        spark, "/root/testdata/sf0.01").collect()
    by = {(r["layout"], r["probe"]): r for r in rows}
    assert len(by) == 6
    for probe in ("square_64_95", "dim2_64_79"):
        matches = {by[(l, probe)]["rows_matching"]
                   for l in ("hilbert", "zorder", "linear")}
        assert len(matches) == 1, probe  # layout-invariant
    sq = {l: by[(l, "square_64_95")] for l in ("hilbert", "zorder", "linear")}
    assert sq["hilbert"]["rows_scanned"] <= sq["zorder"]["rows_scanned"]
    d2 = {l: by[(l, "dim2_64_79")] for l in ("hilbert", "zorder", "linear")}
    assert d2["linear"]["n_files_pruned"] == 0
    assert d2["hilbert"]["n_files_pruned"] > 0
    assert d2["zorder"]["n_files_pruned"] > 0
