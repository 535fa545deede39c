"""q438 skyline: dominance invariants and the no-quadratic-stage plan."""

from __future__ import annotations

from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.01"


def _result(spark):
    from cli_spark.plans.registry import registry

    return registry()["q438_skyline_documents"].fn(spark, SF)


def test_skyline_is_mutually_undominated(spark):  # noqa: F811
    sky = _result(spark).toPandas()
    assert len(sky) > 0
    pts = sky[["lang", "n_chars", "ttr_ppm"]].values
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i == j or pts[i][0] != pts[j][0]:
                continue
            a, b = pts[i][1:], pts[j][1:]
            assert not (
                all(x >= y for x, y in zip(a, b))
                and any(x > y for x, y in zip(a, b))
            ), (i, j)


def test_skyline_frontier_is_strictly_monotone(spark):  # noqa: F811
    """Within a language, sorting the frontier by n_chars ascending
    must give strictly decreasing ttr (the definition of a maximal
    2-D frontier, modulo exact ties on both axes)."""
    sky = _result(spark).toPandas()
    for lang, g in sky.groupby("lang"):
        g = g.sort_values(["n_chars", "ttr_ppm"]).reset_index(drop=True)
        for i in range(1, len(g)):
            if g.n_chars[i] == g.n_chars[i - 1]:
                assert g.ttr_ppm[i] == g.ttr_ppm[i - 1], lang  # pure tie
            else:
                assert g.ttr_ppm[i] < g.ttr_ppm[i - 1], lang


def test_plan_has_no_join(spark):  # noqa: F811
    """The 2-D sweep is windows-only: the executed plan must contain
    no join of any kind (the naive skyline is a quadratic self-join;
    this gate pins the O(n log n) shape)."""
    plan = _result(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan
