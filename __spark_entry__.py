"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the ``cli_spark`` package's registry
(cli_spark/plans/registry.py); this module is a thin adapter that
also re-applies the runtime-settable session confs the engine needs
(UTC timezone for oracle parity, nanosAsLong for the events table)
since the driver owns its own SparkSession.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from cli_spark.operators.relational import q01_pricing_summary
    from cli_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every implemented operator from SURVEY.md §2 (see
    cli_spark/plans/registry.py for the inventory)."""
    from cli_spark.plans.registry import all_queries
    from cli_spark.session import apply_runtime_confs

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in all_queries().items():

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            apply_runtime_confs(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (queries without an entry here are
    genuinely non-SQL-expressible or self-sourced → rows-only check)."""
    from cli_spark.plans.registry import all_oracles

    return all_oracles()
