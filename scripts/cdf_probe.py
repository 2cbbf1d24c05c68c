#!/usr/bin/env python
"""CDF high-version-count probe (VERDICT r10 item 7): drive the
change-feed source over a journal with 100+ commits and measure

1. end-to-end drain wall (one streaming query consuming every
   transition) and its per-transition overhead;
2. `latestOffset` polling cost at full journal depth — the r11 journal
   cursor cache parses only NEW commit files per poll, so a poll on a
   deep journal must cost O(new), not O(history); the probe times a
   cold first poll (parses everything once) vs. 200 warm polls.

Usage:
    python scripts/cdf_probe.py [--commits 128] [--base-rows 200000]
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
    ap.add_argument("--commits", type=int, default=128)
    ap.add_argument("--base-rows", type=int, default=200_000)
    ap.add_argument("--update-rows", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.streaming.cdf import (
        UpsertChangesStreamReader, stream_upsert_changes)
    from house_price_etl_pipeline_spark.streaming.ingest import \
        upsert_commit_batch
    from house_price_etl_pipeline_spark.streaming.windows import _drain

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    root = tempfile.mkdtemp(prefix="cdf_probe_")
    target = os.path.join(root, "tbl")
    n = args.commits
    try:
        base = (spark.range(args.base_rows)
                .select(F.col("id").alias("k"),
                        F.lit(0).alias("ord"),
                        F.col("id").alias("v")))
        t0 = time.perf_counter()
        upsert_commit_batch(base, target, 0, key_cols=["k"],
                            order_col="ord", keep_versions=n + 2,
                            incremental_min_bytes=0)
        base_commit_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(1, n):
            upd = (spark.range(args.update_rows)
                   .select((F.col("id") * (args.base_rows
                                           // args.update_rows) % args.base_rows)
                           .alias("k"),
                           F.lit(i).alias("ord"),
                           (F.col("id") + i * 1_000_000).alias("v")))
            upsert_commit_batch(upd, target, i, key_cols=["k"],
                                order_col="ord", keep_versions=n + 2,
                                incremental_min_bytes=0)
        commits_s = time.perf_counter() - t0

        # 1. full-history drain through the real streaming source
        t0 = time.perf_counter()
        out = _drain(stream_upsert_changes(spark, target, ["k"]),
                     spark, output_mode="append")
        rows = out.count()
        drain_s = time.perf_counter() - t0

        # 2. latestOffset: cold (parse all) vs warm (cursor cache)
        reader = UpsertChangesStreamReader({"path": target,
                                            "key_cols": "k"})
        t0 = time.perf_counter()
        off = reader.latestOffset()
        cold_poll_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        polls = 200
        for _ in range(polls):
            reader.latestOffset()
        warm_poll_s = (time.perf_counter() - t0) / polls

        # uncached comparison: a fresh reader per poll re-parses all
        t0 = time.perf_counter()
        for _ in range(20):
            UpsertChangesStreamReader(
                {"path": target, "key_cols": "k"}).latestOffset()
        fresh_poll_s = (time.perf_counter() - t0) / 20

        print(json.dumps({
            "commits": n,
            "base_rows": args.base_rows,
            "update_rows_per_commit": args.update_rows,
            "base_commit_s": round(base_commit_s, 3),
            "incremental_commits_s": round(commits_s, 3),
            "per_commit_s": round(commits_s / max(n - 1, 1), 4),
            "drain_s": round(drain_s, 3),
            "drain_rows": rows,
            "per_transition_drain_s": round(drain_s / n, 4),
            "latest_offset": off,
            "cold_poll_s": round(cold_poll_s, 5),
            "warm_poll_s": round(warm_poll_s, 6),
            "uncached_poll_s": round(fresh_poll_s, 5),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
