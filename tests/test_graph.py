"""Connected-components unit tests on synthetic graphs with known
answers — exercises shapes the documents-table graph may not contain
(long chains near the round budget, isolated nodes, multiple cliques).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cli_spark.operators.graph import connected_components

# Every test runs through BOTH execution paths: the single-partition
# union-find (the small-graph hybrid, default at these sizes) and the
# distributed pointer-jumping loop (forced by a -1 threshold), so the
# iterative path can never silently rot behind the local fast path.
_PATHS = pytest.mark.parametrize(
    "local_max_edges", [None, -1], ids=["local-uf", "iterative"]
)


def _cc(spark, node_ids, pairs, local_max_edges=None):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    if sym:
        edges = spark.createDataFrame(sym, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    out = connected_components(nodes, edges, local_max_edges=local_max_edges)
    return {r["doc_id"]: r["component"] for r in out.collect()}


@_PATHS
def test_chain_converges_past_plain_propagation_budget(spark, local_max_edges):
    """A 64-node path has diameter 63 — far beyond _MAX_ROUNDS plain
    rounds; pointer jumping must still converge to a single component."""
    n = 64
    got = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)], local_max_edges)
    assert got == {i: 0 for i in range(n)}


@_PATHS
def test_cliques_and_isolated_nodes(spark, local_max_edges):
    got = _cc(
        spark,
        range(10),
        # clique {1,3,5}, pair {2,7}; 0,4,6,8,9 isolated
        [(1, 3), (3, 5), (1, 5), (2, 7)],
        local_max_edges,
    )
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 7: 2, 4: 4, 6: 6, 8: 8, 9: 9}


@_PATHS
def test_two_chains_keep_distinct_labels(spark, local_max_edges):
    got = _cc(spark, range(8), [(0, 2), (2, 4), (1, 3), (3, 5), (5, 7)], local_max_edges)
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1, 7: 1, 6: 6}


@_PATHS
def test_random_graph_matches_union_find(spark, local_max_edges):
    """200-node random graph (fixed seed) — Spark CC must agree with
    an in-memory union-find computing min-id components."""
    import random

    rng = random.Random(42)
    n = 200
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}

    got = _cc(spark, range(n), pairs, local_max_edges)
    assert got == expected


def test_edge_cache_lru_bounds_multi_sf_sessions():
    """Two (or many) sf_dirs in one long session must not leak
    checkpointed edge relations: the cache holds at most
    _EDGE_CACHE_MAX entries, evicts the least-recently-used one, and
    a get() refreshes recency (VERDICT r6 #7)."""
    from cli_spark.operators import graph as G

    saved = dict(G._EDGE_CACHE)
    G._EDGE_CACHE.clear()
    try:
        for i in range(6):
            G._edge_cache_put(("app", f"/sf{i}"), object())
        assert len(G._EDGE_CACHE) == G._EDGE_CACHE_MAX
        assert ("app", "/sf0") not in G._EDGE_CACHE
        assert ("app", "/sf1") not in G._EDGE_CACHE
        # touching the oldest survivor makes it most-recent …
        assert G._edge_cache_get(("app", "/sf2")) is not None
        G._edge_cache_put(("app", "/sf6"), object())
        # … so the eviction hits /sf3, not /sf2
        assert ("app", "/sf2") in G._EDGE_CACHE
        assert ("app", "/sf3") not in G._EDGE_CACHE
    finally:
        G._EDGE_CACHE.clear()
        G._EDGE_CACHE.update(saved)
