#!/usr/bin/env python
"""Refresh bench_minima.json from one or more solo bench runs.

Each bench.py run writes per-query timings to bench_queries.json
("queries" = recorded min over attempts, "retries" = every attempt,
first attempt first). This script folds the CURRENT bench_queries.json
into bench_minima.json, which carries DUAL floors per query (VERDICT
r13 item 1):

- "cold":   elementwise min of FIRST attempts only — what a fresh
            process pays, fixture builds included;
- "minima": elementwise min over ALL attempts (the steady floor) —
            the operator's cost once session fixtures are warm. With
            the r14 re-run contract (run_serialized) a retry re-runs
            the operator against committed fixtures, so this measures
            the operator, never a consumer re-read of its output.

bench.py's stall-retry detector keys off "minima"; the 2x bench gate
ratio in BASELINE.md uses the STEADY sum (the driver also records
min-of-attempts). Run bench.py solo N times, calling this after each:

    for i in 1 2 3; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
        python scripts/refresh_minima.py
    done

Queries no longer in the catalog are dropped; new ones enter at their
observed best. A bench_minima.json written by the pre-r14 schema (no
"cold" key) is discarded entirely — the old floors for harness-backed
queries measured consumer reads, not operators, so the table re-bases
once (VERDICT r13 item 1 "Done" clause).
"""

from __future__ import annotations

import datetime
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    runs = json.load(open(ROOT / "bench_queries.json"))
    steady_obs = dict(runs["queries"])
    cold_obs = dict(runs["queries"])  # no retry -> the one attempt is both
    for name, attempts in runs.get("retries", {}).items():
        steady_obs[name] = min([steady_obs.get(name, float("inf")),
                                *attempts])
        cold_obs[name] = attempts[0]
    try:
        cur = json.load(open(ROOT / "bench_minima.json"))
        if "cold" not in cur:
            print("re-basing: discarding pre-r14 single-floor minima "
                  "(they priced consumer reads for harness queries)",
                  file=sys.stderr)
            cur = {}
        minima = cur.get("minima", {})
        cold = cur.get("cold", {})
    except FileNotFoundError:
        minima, cold = {}, {}
    merged = {
        name: round(min(minima.get(name, float("inf")), t), 4)
        for name, t in steady_obs.items()}
    merged_cold = {
        name: round(min(cold.get(name, float("inf")), t), 4)
        for name, t in cold_obs.items()}
    dropped = sorted(set(minima) - set(steady_obs))
    out = {
        "minima": merged,
        "cold": merged_cold,
        "sf": runs.get("sf", 0.1),
        "note": ("dual per-query floors across solo sf0.1 runs: "
                 "'minima' = steady (min over all attempts; operators "
                 "re-run per attempt, fixtures warm) — bench.py's "
                 "stall detector and the BASELINE.md 2x gate sum use "
                 "this; 'cold' = min over first attempts only (fresh-"
                 "process cost incl. fixture builds). Last folded "
                 f"{datetime.date.today().isoformat()} via "
                 "scripts/refresh_minima.py."),
    }
    json.dump(out, open(ROOT / "bench_minima.json", "w"), indent=1,
              sort_keys=True)
    print(f"minima: {len(merged)} queries, steady sum "
          f"{sum(merged.values()):.1f}s, cold sum "
          f"{sum(merged_cold.values()):.1f}s, {len(dropped)} dropped: "
          f"{dropped}", file=sys.stderr)


if __name__ == "__main__":
    main()
