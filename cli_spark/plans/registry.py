"""Query registry — the engine's graded surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. The
driver runs both sides at sf0.01 and hash-compares (row count + schema
+ order-insensitive value hash), so:

* every computed column is aliased identically on both sides;
* aggregates over doubles are rounded on both sides (float summation
  order differs between engines — rounding makes the hash stable);
* integer sums are cast to BIGINT in the oracle (DuckDB sum(int) is
  HUGEINT, Spark's is long);
* nothing depends on output row order (the hash is order-insensitive)
  but window/rank queries break ties on unique keys so both engines
  select the *same* rows.

``oracle=None`` marks a genuinely non-SQL-expressible op — the driver
records a weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a query to the graded registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags,
                                    doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import cli_spark.operators.relational  # noqa: F401
    import cli_spark.operators.joins  # noqa: F401
    import cli_spark.operators.aggregates  # noqa: F401
    import cli_spark.operators.windows  # noqa: F401
    import cli_spark.operators.setops  # noqa: F401
    import cli_spark.operators.scalar_funcs  # noqa: F401
    import cli_spark.operators.asof  # noqa: F401
    import cli_spark.operators.udfs  # noqa: F401
    import cli_spark.operators.subqueries  # noqa: F401
    import cli_spark.operators.reshape  # noqa: F401
    import cli_spark.operators.dedup  # noqa: F401
    import cli_spark.operators.pipeline  # noqa: F401
    import cli_spark.operators.skew  # noqa: F401
    import cli_spark.operators.graph  # noqa: F401
    import cli_spark.operators.sampling  # noqa: F401
    import cli_spark.operators.quality  # noqa: F401
    import cli_spark.operators.rangejoin  # noqa: F401
    import cli_spark.operators.layout  # noqa: F401
    import cli_spark.operators.incremental  # noqa: F401
    import cli_spark.operators.sql_features  # noqa: F401
    import cli_spark.operators.audit  # noqa: F401
    import cli_spark.operators.analytics  # noqa: F401
    import cli_spark.operators.cdc  # noqa: F401
    import cli_spark.operators.tpch_composites  # noqa: F401
    import cli_spark.operators.tpch_composites2  # noqa: F401
    import cli_spark.operators.similarity  # noqa: F401
    import cli_spark.operators.text  # noqa: F401
    import cli_spark.streaming.batch_windows  # noqa: F401
    import cli_spark.sources.hgt_queries  # noqa: F401
    import cli_spark.sources.multimodal  # noqa: F401


def registry() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in registry().items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in registry().items()
            if spec.oracle is not None}
