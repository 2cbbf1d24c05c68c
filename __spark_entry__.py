"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``house_price_etl_pipeline_spark.plans.catalog``: the
catalog is the real registry (one entry per operator from SURVEY.md §2
plus the LLM-data-pipeline extensions); this module just exposes it in
the driver's shape and runs the flagship query for the smoke check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from house_price_etl_pipeline_spark.plans import catalog as _catalog
from house_price_etl_pipeline_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    _catalog.load_all()
    fn = _catalog.REGISTRY["flagship_avg_price_by_year"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    qs = _catalog.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)
        return run

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracle-expressible query."""
    return _catalog.oracle_sql()
