#!/usr/bin/env python
"""Isolate and time individual catalog queries with the noop sink.

Usage:
    python scripts/qtime.py QUERY [QUERY...] [--reps N] [--sf DIR]

Per query: builds the DataFrame fresh each rep and materializes it with
``noop`` (guide §1.4), printing each rep's wall seconds plus min/median.
A weather probe (bench.weather_probe) runs first and last so a noisy
host window is visible next to the numbers it inflated.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401  (warmup pandas_udf hint resolution)

from bench import materialize, weather_probe
from house_price_etl_pipeline_spark.plans import catalog
from house_price_etl_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="qtime")
    registry = catalog.load_all()
    # same session warmup class as bench.py
    materialize(registry["flagship_avg_price_by_year"].fn(spark, args.sf))

    print("weather(start):", json.dumps(weather_probe(spark)))
    results: dict[str, list[float]] = {}
    for name in args.queries:
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}:{i}")
            t0 = time.perf_counter()
            materialize(registry[name].fn(spark, args.sf))
            dt = round(time.perf_counter() - t0, 4)
            runs.append(dt)
            print(f"  {name} rep{i}: {dt:.3f}s", flush=True)
        results[name] = runs
        print(f"{name}: min={min(runs):.3f} "
              f"median={statistics.median(runs):.3f} runs={runs}")
    print("weather(end):", json.dumps(weather_probe(spark)))
    print(json.dumps({n: {"min": min(r), "runs": r}
                      for n, r in results.items()}))


if __name__ == "__main__":
    main()
