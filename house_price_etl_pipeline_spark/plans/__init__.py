from .catalog import REGISTRY, oracle_sql, queries, register

__all__ = ["REGISTRY", "oracle_sql", "queries", "register"]
