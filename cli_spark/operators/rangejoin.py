"""Binned range join — the scale-out rewrite of a theta join whose
BOTH sides are too big to broadcast.

q16 shows the broadcast-theta shape (3-row band table → BNLJ is
fine). When the interval side is ALSO large — thousands of sliding
value bands, calendar-of-maintenance-windows, IP-range tables — a
BroadcastNestedLoopJoin evaluates N×M predicates and a non-broadcast
nested loop is a cartesian disaster. The standard rewrite:

1. pick a bin width w (≤ the minimum interval length);
2. explode each interval [lo, hi) into the integer bins it overlaps
   (``sequence(floor(lo/w), ceil(hi/w)-1)``) — output grows only by
   interval_length/w per interval;
3. map each point to its single bin ``floor(value/w)``;
4. equi-join on the bin id — a plain shuffle hash/sort-merge join
   that partitions both sides by bin — then re-check the exact range
   predicate as a residual filter.

Shuffle volume is linear in (points + exploded intervals), the join
is key-partitioned (AQE handles hot bins), and nothing is quadratic.
This is exactly how Spark's own OSS range-join hints (Databricks
runtime) and DuckDB's IEJoin avoid the nested loop.

Oracle: the naive theta join — DuckDB plans it as an IEJoin, and the
results must match the binned plan exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.functions.determinism import dsum, sql_dsum
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# 120 overlapping value bands [4i, 4i+8), i = 0..119: every event value
# falls in exactly 2 bands; bin width 4 divides the band step so each
# band explodes into exactly 2 bins.
_N_BANDS = 120
_STEP = 4.0
_WIDTH = 8.0
_BIN_W = 4.0


def value_bands(spark: SparkSession) -> DataFrame:
    """(band_id, lo, hi) — the interval side, generated, not collected."""
    return spark.range(_N_BANDS).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * _STEP).cast("double").alias("lo"),
        (F.col("id") * _STEP + _WIDTH).cast("double").alias("hi"),
    )


@register(
    "q108_binned_range_join",
    oracle=f"""
WITH bands AS (
  SELECT CAST(i AS INTEGER) AS band_id,
         CAST(i * {_STEP} AS DOUBLE) AS lo,
         CAST(i * {_STEP} + {_WIDTH} AS DOUBLE) AS hi
  FROM generate_series(0, {_N_BANDS - 1}) AS t(i)
)
SELECT b.band_id,
       COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS value_sum
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
""",
    tags=("join", "range", "binned"),
)
def q108_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-band range join executed as a binned EQUI-join
    (explode intervals into width-4 bins, join on bin id, residual
    range filter) instead of a nested-loop theta join. Identical
    result to the naive form; the plan is a key-partitioned join
    whose cost is linear in events + 2×bands at any scale."""
    e = load_table(spark, sf_dir, "events")
    bands = value_bands(spark)
    binned_bands = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W).cast("long"),
                (F.ceil(F.col("hi") / _BIN_W) - 1).cast("long"),
            )
        ).alias("bin"),
    )
    binned_events = e.select(
        "value", F.floor(F.col("value") / _BIN_W).cast("long").alias("bin")
    )
    return (
        binned_events.join(binned_bands, "bin")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("value_sum"),
        )
    )
