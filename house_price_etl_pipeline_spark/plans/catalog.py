"""Query catalog: the single registry behind ``__spark_entry__.py``.

Every operator the engine claims (SURVEY §2 + the LLM-data-pipeline
extensions) registers here as a named query: a PySpark builder
``fn(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, a
DuckDB oracle string over the same parquet tables. The driver (and our
local ``tests/test_oracle_parity.py``) runs both and compares row count +
schema + order-insensitive value hash.

Parity rules every registered query follows (SURVEY §7.4):
- alias every computed column identically in Spark and SQL;
- aggregate doubles via exact decimal inner sums (functions.numeric) so
  results don't depend on partitioning / evaluation order;
- timestamps in outputs are cast to date or string (arrow tz-awareness
  differs between Spark and DuckDB);
- integer-typed outputs cast to the same width both sides (DuckDB SUM
  on integers yields HUGEINT, year() yields BIGINT, ...).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


_MODULES = (
    "house_price_etl_pipeline_spark.operators.relational",
    "house_price_etl_pipeline_spark.operators.tpch_shapes",
    "house_price_etl_pipeline_spark.operators.tpch_shapes2",
    "house_price_etl_pipeline_spark.operators.sampling",
    "house_price_etl_pipeline_spark.sources.formats",
    "house_price_etl_pipeline_spark.sources.pydatasource",
    "house_price_etl_pipeline_spark.sources.sinks",
    "house_price_etl_pipeline_spark.functions.batteries",
    "house_price_etl_pipeline_spark.functions.udafs",
    "house_price_etl_pipeline_spark.operators.temporal",
    "house_price_etl_pipeline_spark.operators.analytics",
    "house_price_etl_pipeline_spark.operators.reference_ops",
    "house_price_etl_pipeline_spark.operators.text",
    "house_price_etl_pipeline_spark.operators.packing",
    "house_price_etl_pipeline_spark.operators.dedup",
    "house_price_etl_pipeline_spark.operators.similarity",
    "house_price_etl_pipeline_spark.operators.multimodal",
    "house_price_etl_pipeline_spark.operators.skew",
    "house_price_etl_pipeline_spark.operators.curation",
    "house_price_etl_pipeline_spark.operators.corpus",
    "house_price_etl_pipeline_spark.operators.layout",
    "house_price_etl_pipeline_spark.operators.tokenizer",
    "house_price_etl_pipeline_spark.operators.graph",
    "house_price_etl_pipeline_spark.streaming.windows",
    "house_price_etl_pipeline_spark.streaming.joins",
    "house_price_etl_pipeline_spark.streaming.stateful",
    "house_price_etl_pipeline_spark.streaming.foreach",
    "house_price_etl_pipeline_spark.streaming.ingest",
    "house_price_etl_pipeline_spark.streaming.index",
    "house_price_etl_pipeline_spark.streaming.skipping",
    "house_price_etl_pipeline_spark.streaming.matview",
    "house_price_etl_pipeline_spark.streaming.cdf",
)


def load_all() -> dict[str, Query]:
    """Import every operator module (each registers its queries)."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if e.name is not None and e.name.startswith("house_price"):
                continue  # module not built yet (incremental rounds)
            raise
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
