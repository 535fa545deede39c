"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB exactly, but
float aggregation order differs between engines (and even between
runs under AQE), so ``SUM(double)`` is not reproducible bit-for-bit.
The strategy used throughout the registry quantizes every addend with
*pure IEEE double ops* that both engines evaluate identically:

    q = floor(x * 10^s + 0.5)        -- one multiply, one add, floor:
                                        bit-identical cross-engine
    SUM(q) as BIGINT                 -- exact integer arithmetic,
                                        order-independent
    CAST(sum AS DOUBLE) / 10^s       -- int64→double is correctly
                                        rounded in both engines,
                                        division is IEEE-exact

(The naive alternative — CAST(x AS DECIMAL) — leaks: Spark rounds the
double's shortest decimal repr HALF_UP while DuckDB rounds the scaled
binary value, which disagrees on ~1/2000 arbitrary products, and
DuckDB's final decimal→double cast is not correctly rounded, leaving
1-ulp residue. Both observed empirically; the floor-quantize pipeline
has neither leak.)

Averages divide the exact sum by COUNT(col): two IEEE divisions of
identical operands → identical everywhere.

Overflow bounds: per-row |x|·10^s < 2^53 (money scale s=4 →
|x| < 9e11). The ACCUMULATOR is decimal(38,0): an int64 accumulator
overflows at 100 TB — squared-moment sums (q25: p²·10^4 ≈ 1e14/row)
blow past 2^63 within ~10⁵ rows per group, and even linear money sums
do at ~7e9 rows per group — caught empirically by the round-6 sf1
sweep (ARITHMETIC_OVERFLOW under ANSI mode, which at least fails loud
rather than wrapping). DuckDB never had the problem because its
SUM(BIGINT) widens to HUGEINT (int128); summing the quantized longs
as decimal(38,0) gives Spark the same ~1e38 headroom, stays exact
(integer-valued decimals), and partial aggregation still applies.
decimal(38,0)→double matches int128→double: both are correctly
rounded for integers (validated by the strict bit-exact parity suite
at sf0.001/0.01/0.1 and the sf1 sweep).

Scale note: this is a handful of extra JVM-side expressions inside
whole-stage codegen; partial aggregation (map-side combine) applies to
the integer sums exactly as to double sums — ~zero cost at 100 TB,
and it buys run-to-run reproducibility under AQE re-partitioning,
a production property worth having regardless of the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 4 fractional digits covers the 2-decimal money/measure columns and
# their 2–3-factor products.
MONEY_SCALE = 4
# High-scale variant for small-magnitude values (embedding products).
VEC_SCALE = 12


def quantize(col: Column, scale: int = MONEY_SCALE) -> Column:
    """floor(x·10^s + 0.5) as BIGINT — engine-portable quantization."""
    return F.floor(col * F.lit(float(10**scale)) + F.lit(0.5))


def wide_sum(col: Column) -> Column:
    """Exact sum of int64 addends in a decimal(38,0) accumulator —
    the Spark analogue of DuckDB's SUM(BIGINT)→HUGEINT widening (an
    int64 accumulator overflows on squared-moment sums at scale; see
    module docstring)."""
    return F.sum(col.cast("decimal(38,0)"))


def dsum(col: Column, scale: int = MONEY_SCALE) -> Column:
    """Order-independent, cross-engine-exact sum of a double column."""
    return wide_sum(quantize(col, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column, scale: int = MONEY_SCALE) -> Column:
    """Exact-sum / count average (IEEE-identical across engines)."""
    return dsum(col, scale) / F.count(col)


def dsum_over(col: Column, window, scale: int = MONEY_SCALE) -> Column:
    """Windowed variant of :func:`dsum` (running/sliding frames)."""
    return (
        F.sum(quantize(col, scale).cast("decimal(38,0)")).over(window).cast("double")
        / F.lit(float(10**scale))
    )


def sql_quantize(expr: str, scale: int = MONEY_SCALE) -> str:
    return f"CAST(floor(({expr}) * {float(10 ** scale)!r} + 0.5) AS BIGINT)"


def sql_dsum(expr: str, scale: int = MONEY_SCALE) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM({sql_quantize(expr, scale)}) AS DOUBLE) / {float(10 ** scale)!r}"


def sql_davg(expr: str, scale: int = MONEY_SCALE) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


def ts_str(col: Column) -> Column:
    """Render a timestamp as a second-resolution string.

    Timestamp values cross the hash boundary as strings so that both
    engines serialize identically (oracle mirror:
    ``strftime(x, '%Y-%m-%d %H:%M:%S')``).
    """
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def date_str(col: Column) -> Column:
    """Render a date/timestamp as a day-resolution string
    (oracle mirror: ``strftime(x, '%Y-%m-%d')``)."""
    return F.date_format(col, "yyyy-MM-dd")


SQL_TS_STR = "strftime({}, '%Y-%m-%d %H:%M:%S')"
SQL_DATE_STR = "strftime({}, '%Y-%m-%d')"
