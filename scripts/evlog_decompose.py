#!/usr/bin/env python
"""Decompose a bench event log per query: jobs, job wall, driver gaps.

Usage: python scripts/evlog_decompose.py /tmp/evlog_base [--top 30]

Groups jobs by their ``spark.job.description`` (bench.py sets
``bench:<query>``), reporting per query:
  n_jobs     number of Spark jobs the query ran
  job_wall   sum of (job end - job start) — distributed work + per-job
             scheduling, as seen by the DAGScheduler
  span       last job end - first job start
  gap        span - job_wall when jobs are sequential: driver-side think
             time between jobs (planning, fs metadata, collects, journal)
Queries whose time is mostly OUTSIDE job spans (span << bench seconds)
are driver/planning-bound; queries with many jobs pay per-job overhead.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("evdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--prefix", default="bench:")
    args = ap.parse_args()

    files = sorted(
        (os.path.join(args.evdir, f) for f in os.listdir(args.evdir)
         if not f.startswith(".")),
        key=os.path.getmtime)
    jobs = {}  # job_id -> [desc, start, end]
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    jobs[ev["Job ID"]] = [desc, ev["Submission Time"], None]
                elif e == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j:
                        j[2] = ev["Completion Time"]

    per = defaultdict(list)
    for desc, s, e in jobs.values():
        if desc.startswith(args.prefix) and e is not None:
            per[desc[len(args.prefix):]].append((s, e))

    rows = []
    for q, spans in per.items():
        spans.sort()
        job_wall = sum(e - s for s, e in spans) / 1000.0
        span = (max(e for _, e in spans) - min(s for s, _ in spans)) / 1000.0
        rows.append((q, len(spans), job_wall, span, span - job_wall))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':42s} {'njobs':>5s} {'jobwall':>8s} {'span':>8s} "
          f"{'gap':>8s}")
    for q, n, jw, sp, gap in rows[:args.top]:
        print(f"{q:42s} {n:5d} {jw:8.2f} {sp:8.2f} {gap:8.2f}")
    tot_jobs = sum(n for _, n, *_ in rows)
    print(f"\ntotal queries={len(rows)} total jobs={tot_jobs} "
          f"total jobwall={sum(r[2] for r in rows):.1f}s "
          f"total span={sum(r[3] for r in rows):.1f}s")


if __name__ == "__main__":
    main()
