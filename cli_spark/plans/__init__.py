from cli_spark.plans.registry import QuerySpec, all_queries, all_oracles, register

__all__ = ["QuerySpec", "all_queries", "all_oracles", "register"]
