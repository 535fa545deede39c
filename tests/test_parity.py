"""Driver-mimicking correctness gate: every registered query with an
oracle is executed on Spark AND DuckDB and compared exactly —
row count, column names, and order-insensitive cell values (the same
comparison class the driver's CORRECTNESS_r{N}.json uses, but strict:
float cells must match bit-for-bit, which the engine's determinism
strategy guarantees by construction).

Queries without an oracle (rows-only in the driver) are executed and
smoke-checked here; their semantic goldens live in dedicated test
files (test_hgt.py, test_streaming.py).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cli_spark.plans.registry import registry


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive
    exact comparison frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total order across NaN/None/mixed types
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = _canon(sdf), _canon(odf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            a_nan = isinstance(a, float) and math.isnan(a)
            b_nan = isinstance(b, float) and math.isnan(b)
            if (a is None and b_nan) or (a_nan and b is None) or (a_nan and b_nan):
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    problems.append(
                        f"col {col} row {i}: spark={a!r} oracle={b!r} (diff={a-b:.3e})"
                    )
                    break
            elif a != b:
                problems.append(f"col {col} row {i}: spark={a!r} oracle={b!r}")
                break
            # string-level check on top of value equality: catches
            # int-vs-float dtype drift ('77342' vs '77342.0') and
            # signed zero ('-0.0' vs '0.0') that == treats as equal
            # but a hash of rendered values would not
            if str(a) != str(b):
                problems.append(
                    f"col {col} row {i}: rendered mismatch {str(a)!r} vs {str(b)!r}"
                )
                break
    return problems


_SPECS = registry()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = _SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = duck.execute(spec.oracle).df()
    problems = _compare(sdf, odf, name)
    assert not problems, f"{name}: " + "; ".join(problems[:5])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_q66_goldens(spark, sf_dir):
    """q66 has no DuckDB oracle (Spark-native functions) — pin exact
    values for two rows so the surface can't silently drift."""
    from cli_spark.plans.registry import registry as _reg

    df = _reg()["q66_spark_native_funcs"].fn(spark, sf_dir)
    rows = {r["n_nationkey"]: r.asDict() for r in df.collect()}
    assert rows[0] == {
        "n_nationkey": 0, "name_soundex": "N350", "mb": 2.0, "bankers": 0.0,
        "binary_repr": "0", "crc": 3678181428, "xxh": -3635279775981152085,
        "b64": "TkFUSU9OXzA=", "hex_key": "0", "shl": 0, "shr": 0,
    }
    assert rows[7] == {
        "n_nationkey": 7, "name_soundex": "N350", "mb": 86.0, "bankers": 8.0,
        "binary_repr": "111", "crc": 1163398551, "xxh": -1821898194479978266,
        "b64": "TkFUSU9OXzc=", "hex_key": "7", "shl": 28, "shr": 3,
    }


def test_q67_goldens(spark, sf_dir):
    """Map-ops pack is rows-only for the driver — pin one nation row."""
    from cli_spark.plans.registry import registry as _reg

    df = _reg()["q67_map_ops_pack"].fn(spark, sf_dir)
    rows = {r["n_nationkey"]: r.asDict() for r in df.collect()}
    assert rows[7] == {
        "n_nationkey": 7, "name_len": 8, "key_x2": 14, "reg_upkey": 2,
        "n_big": 2, "key_sum": 14, "keys_sorted": "key,len,reg",
        "values_total": 17,  # key 7 + reg 2 + len 8
    }
