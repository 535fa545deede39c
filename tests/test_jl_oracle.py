"""Pins for q441's hash-join oracle form (round 12, VERDICT r11 #1).

The oracle reconstructs each vector's 16-dim projection with
``list(pj ORDER BY j)`` over a join against the NONZERO matrix
entries only — which silently drops a dimension if any j-column of
the md5-derived Achlioptas matrix were all-zero. These pins make that
assumption (and the relation's fidelity to the literal matrix) a test
failure instead of a parity surprise. No Spark session needed.
"""

from __future__ import annotations

import re

from cli_spark.operators.round10_algos import (
    _JL_K,
    _jl_matrix,
    _jl_sql_matrix_rel,
)


def test_every_projection_column_has_a_nonzero_entry():
    mat = _jl_matrix()
    for j in range(_JL_K):
        assert any(mat[i][j] != 0 for i in range(64)), f"column {j} all-zero"


def test_values_relation_matches_matrix_exactly():
    mat = _jl_matrix()
    triples = {
        (int(i), int(j), int(v))
        for i, j, v in re.findall(
            r"\((-?\d+), (-?\d+), (-?\d+)\)", _jl_sql_matrix_rel())
    }
    expected = {
        (i + 1, j + 1, v)
        for i, row in enumerate(mat)
        for j, v in enumerate(row) if v != 0
    }
    assert triples == expected
    assert len(triples) == 360  # pinned: a matrix change must re-derive
    assert all(v in (-1, 1) for _, _, v in triples)
