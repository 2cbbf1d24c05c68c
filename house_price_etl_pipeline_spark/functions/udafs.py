"""User-defined aggregate surface: GROUPED_AGG pandas UDFs (SURVEY §2.9
U3 — the reference has no UDAF at all; this is the extension exemplar
for aggregation semantics the built-ins don't ship).

The kernel uses ``math.fsum`` (correctly-rounded float summation) so the
result is ORDER-INDEPENDENT — a plain float64 running sum would differ
in the last bits between partitionings (and from the DuckDB oracle,
which sums in scan order), exactly the instability the engine's
decimal-exact native aggregates (functions/numeric.py) exist to avoid.
A UDAF must solve the same problem on the Python side, and fsum does it
without Decimal's 30x cost.

Scale note: GROUPED_AGG ships each group's column slices to the Python
worker as Arrow — fine for bounded per-group data (here: weights+values
per returnflag), wrong for billion-row groups. At 100 TB the native
decimal path stays the default; the UDAF surface exists for genuinely
custom math (trimmed/winsorized estimators, domain scores).

NB: ``pd`` must be a module-level import — under ``from __future__
import annotations`` the pandas_udf type hints stringify and resolve
against this module's globals (same trap documented in bench.py).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.catalog import register
from ..sources.tables import load_table


def weighted_avg():
    """Quantity-weighted mean as a GROUPED_AGG pandas UDF, via
    exactly-rounded (order-independent) float summation. Built lazily:
    the ``pandas_udf`` decorator parses its DDL return type through the
    active SparkContext, so it cannot run at import time (catalog
    modules import before any session exists)."""

    @pandas_udf("double")
    def _wavg(value: pd.Series, weight: pd.Series) -> float:
        num = math.fsum((value * weight).to_numpy())
        den = math.fsum(weight.to_numpy())
        return num / den if den else float("nan")

    return _wavg


def group_size():
    """Row count as a GROUPED_AGG pandas UDF — Spark disallows mixing
    group-aggregate pandas UDFs with native aggregates in one ``agg``
    (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same surface."""

    @pandas_udf("long")
    def _n(value: pd.Series) -> int:
        return len(value)

    return _n


@register(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           round(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6)))
                 AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate through the GROUPED_AGG pandas-UDF surface:
    quantity-weighted average price per return flag. The oracle computes
    the same quantity in exact DECIMAL; parity holds because fsum's
    correctly-rounded sum equals the decimal sum of these (exactly
    representable) products cast back to double."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(group_size()("l_quantity").alias("n_items"),
             F.round(weighted_avg()("l_extendedprice", "l_quantity"), 6)
             .alias("wavg_price"))
        .orderBy("l_returnflag")
    )
