#!/usr/bin/env python
"""Carry-mode read fan-out probe at deep retention (VERDICT r12 item 4).

A manifest-carried snapshot reads as a UNION of per-owner scans
(carry.owner_groups): every retained version that still physically owns
a file the head carries adds one scan branch. The bound is the
retention window — so the worst case is keep_versions=64 with 64
single-key incremental commits, where the head's manifest can point at
up to 64 owner dirs. This probe measures:

1. owner-group count at the head after N incremental commits
   (keep_versions=N) — the read fan-out;
2. head snapshot-read wall (full materialization) in manifest mode at
   that fan-out, vs LINK mode on the identical commit history (links
   collapse ownership physically, so its fan-out is 1);
3. the mitigation: one OPTIMIZE rewrites the head into owned files —
   owner count back to 1 — and the read wall after it.

Usage:
    python scripts/carry_fanout_probe.py [--commits 64] [--rows 200000]
Prints a JSON blob for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _read_wall(spark, target, reps=3):
    from house_price_etl_pipeline_spark.streaming.ingest import (
        read_upsert_version)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        read_upsert_version(spark, target).write.format("noop") \
            .mode("overwrite").save()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return round(best, 3)


def _build(spark, target, n_commits, rows, keep):
    """Base with enough files to carry, then n_commits single-key
    incremental commits — each rewrites ONE touched file and carries
    the rest, so in manifest mode ownership spreads across history."""
    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.streaming.ingest import (
        upsert_commit_batch)

    base = (spark.range(rows)
            .select(F.col("id").alias("k"),
                    (F.col("id") * 3).alias("v"),
                    F.lit(0).alias("ord"))
            .repartition(32, "k"))
    upsert_commit_batch(base, target, 0, key_cols=["k"], order_col="ord",
                        keep_versions=keep, incremental_min_bytes=0)
    for b in range(1, n_commits + 1):
        delta = spark.createDataFrame([(b * 7 % rows, -b, b)],
                                      "k bigint, v bigint, ord int")
        upsert_commit_batch(delta, target, b, key_cols=["k"],
                            order_col="ord", keep_versions=keep,
                            incremental_min_bytes=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=64)
    ap.add_argument("--rows", type=int, default=200_000)
    args = ap.parse_args()

    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.streaming.carry import (
        owner_groups, read_carry, snapshot_files)
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _journal_state, optimize_upsert_target, read_upsert_version)

    spark = get_spark(app_name="carry_fanout_probe")
    keep = args.commits
    out = {"commits": args.commits, "rows": args.rows,
           "keep_versions": keep}

    for mode in ("link", "manifest"):
        os.environ["SPARK_GRAFT_CARRY_MODE"] = mode
        root = tempfile.mkdtemp(prefix=f"fanout_{mode}_")
        t = os.path.join(root, "tbl")
        t0 = time.perf_counter()
        _build(spark, t, args.commits, args.rows, keep)
        build_wall = round(time.perf_counter() - t0, 2)
        commits, _ = _journal_state(t + "_versions")
        head = os.path.join(t + "_versions", commits[-1]["version_name"])
        rels = snapshot_files(head)
        groups = owner_groups(head, rels, read_carry(head))
        out[mode] = {
            "build_wall_s": build_wall,
            "head_files": len(rels),
            "owner_dirs": len(groups),
            "read_wall_s": _read_wall(spark, t),
        }
        if mode == "manifest":
            t1 = time.perf_counter()
            optimize_upsert_target(spark, t, keep_versions=keep)
            out[mode]["optimize_wall_s"] = round(
                time.perf_counter() - t1, 2)
            commits, _ = _journal_state(t + "_versions")
            head = os.path.join(t + "_versions",
                                commits[-1]["version_name"])
            rels = snapshot_files(head)
            out[mode]["owner_dirs_after_optimize"] = len(
                owner_groups(head, rels, read_carry(head)))
            out[mode]["read_wall_after_optimize_s"] = _read_wall(spark, t)
        n = read_upsert_version(spark, t).count()
        assert n == args.rows, (mode, n)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
