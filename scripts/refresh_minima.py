#!/usr/bin/env python
"""Refresh bench_minima.json from one or more solo bench runs.

Each bench.py run writes per-query timings to bench_queries.json; this
script folds the CURRENT bench_queries.json into bench_minima.json as
an elementwise min (retry attempts included — the committed floor is
the best time ever observed solo). Run bench.py solo N times, calling
this after each run:

    for i in 1 2 3; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
        python scripts/refresh_minima.py
    done

Queries no longer in the catalog are dropped; new ones enter at their
observed best.
"""

from __future__ import annotations

import datetime
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    runs = json.load(open(ROOT / "bench_queries.json"))
    timings = dict(runs["queries"])
    for name, attempts in runs.get("retries", {}).items():
        timings[name] = min([timings.get(name, float("inf")),
                             *attempts])
    try:
        cur = json.load(open(ROOT / "bench_minima.json"))
        minima = cur.get("minima", {})
    except FileNotFoundError:
        minima = {}
    merged = {
        name: round(min(minima.get(name, float("inf")), t), 4)
        for name, t in timings.items()}
    dropped = sorted(set(minima) - set(timings))
    out = {
        "minima": merged,
        "sf": runs.get("sf", 0.1),
        "note": ("per-query minima across solo sf0.1 runs; bench.py "
                 "uses these to retry stall-inflated queries once. "
                 "Last folded "
                 f"{datetime.date.today().isoformat()} via "
                 "scripts/refresh_minima.py (elementwise min, retry "
                 "attempts included)."),
    }
    json.dump(out, open(ROOT / "bench_minima.json", "w"), indent=1,
              sort_keys=True)
    print(f"minima: {len(merged)} queries "
          f"({sum(1 for n in timings if timings[n] <= minima.get(n, float('inf')))} lowered/new, "
          f"{len(dropped)} dropped: {dropped})", file=sys.stderr)


if __name__ == "__main__":
    main()
