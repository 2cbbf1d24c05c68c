#!/usr/bin/env python
"""Deep-lag CDC catch-up probe (VERDICT r11 item 1): a replica lagging
N versions behind its source must catch up in O(changed data), not
O(lagged versions).

Builds a source table with a sizeable base commit plus N small
incremental commits, seeds a replica at v0, and measures:

1. coalesced catch-up at full lag (`coalesce_after=32`, the default):
   ONE net-change MERGE from v0 -> head — wall should track the
   CHANGED data (N * update_rows keys), not N;
2. per-version replay rate on a separate small-lag source
   (`coalesce_after=None`), to project what N sequential MERGE+commit
   rounds would have cost;
3. empty-replica re-seed at full lag: one snapshot commit.

Usage:
    python scripts/cdc_lag_probe.py [--lag 256] [--base-rows 200000]
Prints a JSON blob for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lag", type=int, default=256)
    ap.add_argument("--base-rows", type=int, default=200_000)
    ap.add_argument("--update-rows", type=int, default=50)
    ap.add_argument("--replay-sample", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.streaming.cdf import (
        apply_changes_to_table)
    from house_price_etl_pipeline_spark.streaming.ingest import (
        read_upsert_version, upsert_commit_batch)

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.environ["SPARK_GRAFT_INCREMENTAL_MIN_BYTES"] = "0"
    root = tempfile.mkdtemp(prefix="cdc_lag_probe_")
    out: dict = {"lag": args.lag, "base_rows": args.base_rows,
                 "update_rows": args.update_rows}

    def build_source(path: str, lag: int) -> None:
        base = spark.range(args.base_rows).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        upsert_commit_batch(base, path, 0, key_cols=["k"],
                            order_col="v", keep_versions=lag + 8)
        for i in range(1, lag + 1):
            up = spark.range(i * 7, i * 7 + args.update_rows).select(
                F.col("id").alias("k"),
                (F.col("id") * 100 + i).alias("v"))
            upsert_commit_batch(up, path, i, key_cols=["k"],
                                order_col="v", keep_versions=lag + 8)

    try:
        # --- full-lag source + replica seeded at v0 --------------------
        src = os.path.join(root, "src")
        t0 = time.monotonic()
        build_source(src, args.lag)
        out["build_wall_s"] = round(time.monotonic() - t0, 2)

        dst = os.path.join(root, "dst")
        seed = read_upsert_version(spark, src, 0)
        upsert_commit_batch(seed, dst, 0, key_cols=["k"],
                            order_col="v", keep_versions=4)

        t0 = time.monotonic()
        n = apply_changes_to_table(spark, src, dst, ["k"],
                                   keep_versions=4, coalesce_after=32)
        out["coalesced_catchup_wall_s"] = round(time.monotonic() - t0, 2)
        out["coalesced_commits"] = n
        src_head = read_upsert_version(spark, src)
        rep = read_upsert_version(spark, dst)
        out["replica_equal"] = (
            src_head.count() == rep.count()
            and src_head.exceptAll(rep).limit(1).count() == 0)

        # --- empty-replica deep-lag re-seed ----------------------------
        dst2 = os.path.join(root, "dst2")
        t0 = time.monotonic()
        apply_changes_to_table(spark, src, dst2, ["k"],
                               keep_versions=4, coalesce_after=32)
        out["reseed_wall_s"] = round(time.monotonic() - t0, 2)

        # --- per-version replay rate on a small-lag twin ----------------
        src_s = os.path.join(root, "src_small")
        build_source(src_s, args.replay_sample)
        dst3 = os.path.join(root, "dst3")
        t0 = time.monotonic()
        n = apply_changes_to_table(spark, src_s, dst3, ["k"],
                                   keep_versions=4, coalesce_after=None)
        wall = time.monotonic() - t0
        out["replay_sample_versions"] = n
        out["replay_s_per_version"] = round(wall / n, 3)
        out["replay_projected_at_lag_s"] = round(
            wall / n * args.lag, 1)
        out["speedup_vs_replay"] = round(
            out["replay_projected_at_lag_s"]
            / out["coalesced_catchup_wall_s"], 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
