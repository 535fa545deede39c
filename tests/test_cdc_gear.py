"""q436 gear-CDC: engine kernel vs independent goldens, the CDC
boundary-survival contract, and the md5-form bridge to q380's SQL
boundary expression."""

from __future__ import annotations

import pytest

from cli_spark.operators import cdc_gear
from tests.conftest import spark  # noqa: F401  (shared session fixture)


def test_numpy_kernel_matches_pure_python_golden():
    for doc_id, _source, text in cdc_gear.corpus():
        np_cuts = cdc_gear.boundaries_np(text.encode("utf-8")).tolist()
        golden = cdc_gear.boundaries_golden(text)
        assert np_cuts == golden, f"doc {doc_id}"


def test_insertion_survival_both_fingerprints():
    """The CDC contract: boundaries strictly after an edit's influence
    window survive the edit (shifted by the insertion length) — for
    the tabulated fingerprint AND q380's md5 form."""
    rows = {d: t for d, _s, t in cdc_gear.corpus()}
    a, b = rows[900], rows[901]
    ins = len(b) - len(a)
    assert ins == 21
    for fn in (cdc_gear.boundaries_golden, cdc_gear.boundaries_md5_golden):
        ba, bb = fn(a), fn(b)
        tail_a = [p for p in ba if p > 37 + 4]
        tail_b = [p - ins for p in bb if p > 37 + ins + 4]
        assert tail_a == tail_b and len(tail_a) > 10, fn.__name__


def test_one_md5_boundary_form_matches_two_instr_form(spark):  # noqa: F811
    """The round-15 single-md5 Spark boundary form (_CDC_BYTE_SPARK,
    first-two-hex-chars IN-set) selects EXACTLY the positions the
    original two-instr byte form does, over the full gear corpus —
    the optimization changed per-position cost, not boundaries."""
    from cli_spark.operators.dedup import _CDC_BYTE, _CDC_BYTE_SPARK

    docs = spark.createDataFrame(
        cdc_gear.corpus(), "doc_id long, source string, text string"
    )
    docs.createOrReplaceTempView("cdc_fixture_docs2")

    def bpos_of(byte_expr: str) -> dict:
        return {
            r["doc_id"]: (r["bpos"] or [])
            for r in spark.sql(f"""
                SELECT doc_id,
                       filter(transform(
                         CASE WHEN length(text) >= 4
                              THEN sequence(4, length(text))
                              ELSE CAST(array() AS ARRAY<INT>) END,
                         p -> CASE WHEN ({byte_expr}) % 32 = 0 THEN p END),
                         x -> x IS NOT NULL) AS bpos
                FROM cdc_fixture_docs2
            """).collect()
        }

    assert bpos_of(_CDC_BYTE_SPARK) == bpos_of(_CDC_BYTE)


def test_md5_bridge_matches_q380_sql_expression(spark):  # noqa: F811
    """Bit-identical bridge: the Python md5-form boundaries equal
    q380's SQL higher-order boundary expression on the same corpus —
    the Arrow path and the SQL path implement one contract."""
    from cli_spark.operators.dedup import _CDC_BYTE

    docs = spark.createDataFrame(
        cdc_gear.corpus(), "doc_id long, source string, text string"
    )
    docs.createOrReplaceTempView("cdc_fixture_docs")
    got = {
        r["doc_id"]: (r["bpos"] or [])
        for r in spark.sql(f"""
            SELECT doc_id,
                   filter(transform(
                     CASE WHEN length(text) >= 4 THEN sequence(4, length(text))
                          ELSE CAST(array() AS ARRAY<INT>) END,
                     p -> CASE WHEN ({_CDC_BYTE}) % 32 = 0 THEN p END),
                     x -> x IS NOT NULL) AS bpos
            FROM cdc_fixture_docs
        """).collect()
    }
    for doc_id, _source, text in cdc_gear.corpus():
        assert got[doc_id] == cdc_gear.boundaries_md5_golden(text), doc_id


def test_engine_census_matches_oracle_values(spark):  # noqa: F811
    out = {
        r["source"]: (
            r["n_chunks"],
            r["n_distinct_chunks"],
            r["total_chars"],
            r["dup_chars"],
            r["dup_ppm"],
        )
        for r in cdc_gear.q436_gear_cdc_chunking(spark, "").collect()
    }
    assert out == cdc_gear.oracle_census()


def test_fixture_has_real_duplicate_mass():
    census = cdc_gear.oracle_census()
    assert set(census) == set(cdc_gear.SOURCES)
    for source, (n, nd, total, dup, ppm) in census.items():
        assert n > nd > 0 and total > 0, source
        assert ppm == pytest.approx(dup * 1_000_000 // total)
        assert ppm > 50_000, f"{source}: want >5% duplicate chunk mass"
