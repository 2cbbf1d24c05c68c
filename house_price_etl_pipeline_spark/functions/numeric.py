"""Numeric helpers: unit conversion + oracle-stable aggregation.

``dec_sum``/``dec_avg`` exist because the driver compares our results to
DuckDB by value hash: a plain double SUM is order-dependent (parallel
reduction ≠ DuckDB's scan order), so the last bits can differ run-to-run.
Casting each element to DECIMAL(25,6) first makes the addition exact and
associative — bit-identical regardless of partitioning — then we cast the
total back to double. This is also the right call at 100 TB: result
stability shouldn't depend on the number of executors. Cost: decimal adds
are ~2x double adds, irrelevant in scan-dominated aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1 坪 (ping) = 3.30579 m² — reference etl_pipeline_spark.py:76,78.
M2_PER_PING = 3.30579

_DEC = "decimal(25,6)"


def m2_to_ping(col: Column | str) -> Column:
    """Area m² → 坪, rounded to 2 (reference etl_pipeline_spark.py:76)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c / F.lit(M2_PER_PING), 2)


def ping_price_from_m2(col: Column | str) -> Column:
    """Price per m² → per 坪, rounded to 2 (reference etl_pipeline_spark.py:78)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(M2_PER_PING), 2)


def dec_sum(col: Column | str) -> Column:
    """Order-independent SUM over a double column (exact decimal inner sum)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def dec_avg(col: Column | str) -> Column:
    """Order-independent AVG over a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).cast("double")


def dec_sum_expr(sql_expr: str) -> str:
    """DuckDB-side twin of :func:`dec_sum` for oracle queries."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def dec_avg_expr(sql_expr: str) -> str:
    """DuckDB-side twin of :func:`dec_avg`."""
    return (
        f"CAST(CAST(SUM(CAST(({sql_expr}) AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({sql_expr}) AS DOUBLE)"
    )
