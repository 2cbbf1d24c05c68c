#!/usr/bin/env python
"""Disjoint-writer rebase probe (VERDICT r11 item 5): under sustained
two-writer contention on disjoint partitions, a lost CAS race should
cost a file-level rebase, not a Spark re-merge.

A/B on the same workload — two threads, each landing N incremental
commits confined to its own partition of a shared table:

  A) fast path ON (production): losers rebase (zero extra Spark
     staging writes);
  B) fast path OFF (_rebase_disjoint_stage forced to decline): every
     lost race re-runs the merge + staging write against the new head.

Reported: wall clock, Spark staging-write count, rebased-entry count,
and the journal's consistency (strict sequence, all versions applied).
Races are timing-dependent, so the probe also reports how many
actually occurred per mode.

Round-14 (VERDICT r13 item 5) scaled the probe: ``--writers N`` runs
N concurrent writers (own partition each, disjoint version ranges)
and reports per-writer walls, CAS attempt/lost-race counts (journal
rounds), and the rebase success rate — the starvation probe for the
backoff policy. ``--modes fast`` skips the slow re-merge A/B leg.

Usage:
    python scripts/rebase_probe.py [--commits 8] [--rows 200000]
                                   [--writers 2] [--modes fast,off]
Prints a JSON blob for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=8)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--writers", type=int, default=2)
    ap.add_argument("--modes", default="fast,off")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import house_price_etl_pipeline_spark.streaming.ingest as ing
    from house_price_etl_pipeline_spark.fsutil import read_commit_journal
    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.streaming.partitioning import (
        set_table_partitioning)

    spark = get_spark(app_name="rebase_probe", cores=8)
    work = tempfile.mkdtemp(prefix="rebase_probe_")
    out: dict = {"commits_per_writer": args.commits, "rows": args.rows}

    real_staged_write = ing._staged_write
    real_rebase = ing._rebase_disjoint_stage

    def run(mode: str) -> dict:
        ing._rebase_disjoint_stage = (
            real_rebase if mode == "fast" else
            (lambda *a, **k: None))
        staged = {"n": 0}
        lock = threading.Lock()

        def counting(*a, **k):
            with lock:
                staged["n"] += 1
            return real_staged_write(*a, **k)

        ing._staged_write = counting

        # journal-round accounting: every CAS attempt and every lost
        # race, via the swappable fsutil primitive try_commit routes
        # through (imported at call time, so rebinding works)
        import house_price_etl_pipeline_spark.fsutil as fsu
        real_try_commit = fsu.try_commit
        cas = {"attempts": 0, "lost": 0}

        def counting_commit(cd, seq, payload):
            ok = real_try_commit(cd, seq, payload)
            with lock:
                cas["attempts"] += 1
                cas["lost"] += (not ok)
            return ok

        fsu.try_commit = counting_commit
        t = os.path.join(work, f"tbl_{mode}")
        nw = args.writers
        set_table_partitioning(t, {"bucket": "bigint"})
        base = spark.range(args.rows).select(
            F.col("id").alias("k"),
            (F.col("id") % max(8, nw)).alias("bucket"),
            (F.col("id") * 2).alias("v"), F.lit(0).alias("ord"))
        ing.upsert_commit_batch(base, t, 0,
                                key_cols=["k", "bucket"],
                                order_col="ord", keep_versions=2 * nw,
                                incremental_min_bytes=0)
        base_stages = staged["n"]
        cas["attempts"] = cas["lost"] = 0
        errors: list = []
        writer_walls: dict[str, float] = {}

        def writer(tag, bucket, ids):
            try:
                w0 = time.perf_counter()
                for bid in ids:
                    df = spark.createDataFrame(
                        [(bucket * 1000 + j, bucket, bid, bid)
                         for j in range(3)],
                        "k long, bucket long, v long, ord long")
                    ing.upsert_commit_batch(
                        df, t, bid, key_cols=["k", "bucket"],
                        order_col="ord", keep_versions=2 * nw,
                        writer=tag, max_retries=64,
                        incremental_min_bytes=0)
                writer_walls[tag] = round(time.perf_counter() - w0, 2)
            except Exception as exc:  # pragma: no cover
                errors.append((tag, repr(exc)))

        n = args.commits
        t0 = time.perf_counter()
        ts = [threading.Thread(
                  target=writer,
                  args=(f"w{w}", w + 1,
                        list(range(1 + w * n, 1 + (w + 1) * n))))
              for w in range(nw)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        wall = time.perf_counter() - t0
        commits = read_commit_journal(
            ing._commits_dir(t + "_versions"))
        fsu.try_commit = real_try_commit
        assert not errors, errors
        assert [c["seq"] for c in commits] == list(range(len(commits)))
        assert {c["version"] for c in commits} == set(range(nw * n + 1))
        total = nw * n
        return {"wall_s": round(wall, 2),
                "writers": nw,
                "spark_staging_writes": staged["n"] - base_stages,
                "staging_write_amplification": round(
                    (staged["n"] - base_stages) / total, 3),
                "rebased_commits": sum(bool(c.get("rebased"))
                                       for c in commits),
                "cas_attempts": cas["attempts"],
                "cas_lost_races": cas["lost"],
                "journal_rounds_per_commit": round(
                    cas["attempts"] / total, 3),
                "writer_walls_s": dict(sorted(writer_walls.items())),
                "total_commits": total}

    try:
        # warmup: one real (tiny) commit chain through the same code
        # path so JVM/codegen costs are paid before either timed mode
        warm = os.path.join(work, "warmup")
        set_table_partitioning(warm, {"bucket": "bigint"})
        wdf = spark.range(64).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("bucket"),
            F.col("id").alias("v"), F.lit(0).alias("ord"))
        for b in (0, 1):
            ing.upsert_commit_batch(wdf, warm, b,
                                    key_cols=["k", "bucket"],
                                    order_col="ord", keep_versions=4,
                                    incremental_min_bytes=0)
        modes = [m.strip() for m in args.modes.split(",") if m.strip()]
        if "fast" in modes:
            out["fast_path_on"] = run("fast")
        if "off" in modes:
            out["fast_path_off"] = run("off")
    finally:
        ing._staged_write = real_staged_write
        ing._rebase_disjoint_stage = real_rebase
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
