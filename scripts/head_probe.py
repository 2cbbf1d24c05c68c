#!/usr/bin/env python
"""Deep-journal head-resolution probe (VERDICT r13 item 4).

``resolve_published_snapshot`` claims O(tail) cost via journal
checkpoints. Probe it on SYNTHETIC journals of 512..4096 commits —
entries written through the real ``fsutil.try_commit`` CAS, pointer
publish mode's on-disk shape (no symlink; ``_LATEST.json`` present but
deliberately stale so resolution exercises the journal route, never
the pointer shortcut) — and measure head-resolve wall with and
without checkpoints.

Synthetic because 4096 REAL upsert commits cost ~90 min of Spark time
and add nothing: head resolution never opens data files, only journal
entries + one isdir() on the head's version dir, which is exactly what
this builds.

Usage: python scripts/head_probe.py
Prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from house_price_etl_pipeline_spark import fsutil
from house_price_etl_pipeline_spark.streaming.ingest import (
    resolve_published_snapshot)

REPS = 9


def build_table(root: str, n_commits: int) -> str:
    target = os.path.join(root, f"tbl_{n_commits}")
    vr = target + "_versions"
    cd = os.path.join(vr, "_commits")
    os.makedirs(cd)
    entries = []
    for i in range(n_commits):
        name = f"v{i}_{i:08x}"
        assert fsutil.try_commit(cd, i, {
            "op": "upsert", "version": i, "version_name": name,
            "writer": "probe"})
        entries.append(dict(op="upsert", version=i, version_name=name,
                            writer="probe", seq=i))
        os.makedirs(os.path.join(vr, name))
    # checkpoints exactly as the publish path maintains them (latest
    # two kept): consolidate at the head
    full = fsutil.read_commit_journal(cd)
    fsutil.maybe_checkpoint_journal(cd, full)
    # stale pointer: resolution must go through the journal
    with open(os.path.join(vr, "_LATEST.json"), "w") as f:
        json.dump({"version": 0, "version_name": "v0_00000000",
                   "seq": 0}, f)
    return target


def best_wall(fn) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    root = tempfile.mkdtemp(prefix="head_probe_")
    os.environ["SPARK_GRAFT_PUBLISH_MODE"] = "pointer"
    os.environ["SPARK_GRAFT_CARRY_MODE"] = "manifest"
    print("| commits | with checkpoint | full parse | ratio |")
    print("|---|---|---|---|")
    try:
        for n in (512, 1024, 2048, 4096):
            t = build_table(root, n)
            cd = os.path.join(t + "_versions", "_commits")
            head = os.path.join(t + "_versions", f"v{n-1}_{n-1:08x}")

            def resolve():
                got = resolve_published_snapshot(t)
                assert got == head, (got, head)

            with_ck = best_wall(resolve)
            # strip checkpoints -> full parse route
            for f in os.listdir(cd):
                if f.startswith("_ckpt_"):
                    os.unlink(os.path.join(cd, f))
            without = best_wall(resolve)
            print(f"| {n} | {with_ck*1e3:.2f} ms | {without*1e3:.2f} ms "
                  f"| {without/with_ck:.1f}x |")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
