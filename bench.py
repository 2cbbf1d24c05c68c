#!/usr/bin/env python
"""Benchmark harness: run the engine's query catalog at a given scale factor.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Prints exactly ONE JSON line:
    {"metric": "catalog_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Methodology:
- every query from ``plans.catalog`` (the same registry the driver's
  correctness gate reads) is built and fully materialized with the
  ``noop`` sink — all columns evaluated, nothing collected to the
  driver, no disk write cost;
- one untimed warmup query amortizes session/JVM/codegen startup so the
  numbers measure the plans, not Spark boot;
- a failing query records ``-1.0`` and the run continues (the driver
  still gets a complete line).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from house_price_etl_pipeline_spark.plans import catalog
from house_price_etl_pipeline_spark.session import get_spark


def materialize(df) -> None:
    """Evaluate the full plan (every column, every row) without collect."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="bench")
    registry = catalog.load_all()

    # Warmup: run the flagship once untimed (JVM/codegen/Arrow spin-up),
    # plus one tiny call through each Python-worker path (pandas_udf and
    # the Python DataSource) — the daemon/worker pool start is a
    # session-level cost, same amortization class as JVM startup.
    try:
        materialize(registry["flagship_avg_price_by_year"].fn(spark, sf_dir))
        import pandas as pd
        from pyspark.sql.functions import col, pandas_udf

        @pandas_udf("double")
        def _warm(v: pd.Series) -> pd.Series:
            return v * 1.0

        spark.range(32).select(_warm(col("id").cast("double"))).collect()
        from house_price_etl_pipeline_spark.sources.pydatasource import (
            read_synthetic_events)
        # partitions matches the catalog query's so the worker pool is
        # fully grown before timing starts
        materialize(read_synthetic_events(spark, rows=64, partitions=8))
    except Exception as exc:  # pragma: no cover - warmup best-effort
        print(f"warmup failed: {exc!r}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in sorted(registry):
        t0 = time.perf_counter()
        try:
            materialize(registry[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            print(f"{name} FAILED: {exc!r}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "catalog_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
