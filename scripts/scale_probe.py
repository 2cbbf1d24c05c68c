#!/usr/bin/env python
"""Scale-up probe (SCALE.md §Scale-up probe): multiply the sf0.1 tables
N× and measure the heavy query families at 1× and N×, recording wall
time AND shuffle volumes (from the Spark event log) per query.

Replica construction keeps per-replica structure and kills cross-replica
similarity, so output relations grow LINEARLY in input by construction
and any super-linear growth measured is the plan's fault:
- all entity keys shift by replica (joins stay within-replica, entity
  counts grow N×);
- document tokens are prefixed per replica (r7x...), so shingle/MinHash
  similarity across replicas is zero — near-dup pairs grow N×, not
  N-choose-2 (identical copies would form N-cliques);
- embeddings keep their values (scoring cost is what scales), vec_ids
  shift so the fixed query batch stays 8 vectors.

Usage:
    python scripts/scale_probe.py --mult 32 [--keep-dir DIR]
Prints a per-query table (sec + shuffle GiB at both scales) and a JSON
blob for SCALE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHIFT = 10_000_000  # per-replica key offset (≫ any sf0.1 key)

# per-table key columns to shift per replica (dims region/nation copy 1×)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBE_QUERIES = [
    # references: scan/agg/join shapes
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "dedup_exact_groups",
    # heavy families (VERDICT r3 item 5)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "sim_ann_batch_topk_join",
    "sim_ann_batch_lsh_topk",
    "graph_pagerank_suppliers",
    # lakehouse maintenance chain: upsert x2 + parallel OPTIMIZE +
    # change-feed read (round-6: exercises the size-targeted rewrite)
    "cdc_upsert_changes",
]


def build_replica(spark, src: str, dst: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.sources.tables import (
        TABLE_NAMES, load_table)

    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        base = load_table(spark, src, name)
        out = os.path.join(dst, f"{name}.parquet")
        if name in ("region", "nation"):
            base.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(mult):
            df = base
            for c in SHIFT_COLS.get(name, []):
                df = df.withColumn(c, (F.col(c) + F.lit(i * SHIFT))
                                   .cast(dict(base.dtypes)[c]))
            if name == "documents" and i > 0:
                # per-replica token namespace: zero cross-replica overlap
                pfx = f"r{i}x"
                df = df.withColumn(
                    "text",
                    F.concat(F.lit(pfx),
                             F.regexp_replace("text", " ", " " + pfx)))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)


def parse_eventlog(ev_dir: str) -> dict[str, dict[str, float]]:
    """Aggregate shuffle read/write + input bytes per job description."""
    out: dict[str, dict[str, float]] = {}
    stage_to_desc: dict[int, str] = {}
    for path in glob.glob(os.path.join(ev_dir, "*")):
        if os.path.isdir(path):
            continue
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    for sid in ev.get("Stage IDs", []):
                        stage_to_desc[sid] = desc
                elif kind == "SparkListenerTaskEnd":
                    desc = stage_to_desc.get(ev.get("Stage ID"), "")
                    if not desc.startswith("probe:"):
                        continue
                    m = ev.get("Task Metrics") or {}
                    sr = m.get("Shuffle Read Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    im = m.get("Input Metrics") or {}
                    d = out.setdefault(desc, {"shuffle_read": 0.0,
                                              "shuffle_write": 0.0,
                                              "input": 0.0,
                                              "task_time_s": 0.0})
                    d["shuffle_read"] += (sr.get("Remote Bytes Read", 0)
                                          + sr.get("Local Bytes Read", 0))
                    d["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                    d["input"] += im.get("Bytes Read", 0)
                    d["task_time_s"] += m.get("Executor Run Time", 0) / 1e3
    return out


def clear_caches() -> None:
    """Dedup/ANN pipelines memoize per (session, sf_dir); clear so every
    timed run rebuilds from the scan."""
    from house_price_etl_pipeline_spark.operators import dedup

    for cache in (dedup._PAIRS_CACHE, dedup._EXACT_PAIRS_CACHE,
                  dedup._SHINGLE_TOK_CACHE):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        cache.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=32)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep-dir", default=None,
                    help="reuse/keep the replica dir (skips rebuild if "
                         "populated)")
    ap.add_argument("--queries", default=",".join(PROBE_QUERIES))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    ev_dir = tempfile.mkdtemp(prefix="probe_evlog_")
    os.environ["SPARK_GRAFT_EVENTLOG"] = ev_dir
    # pair-scale stages sized to candidate volume (SCALE.md): grow the
    # pair shuffles with the data on the big side
    from house_price_etl_pipeline_spark.plans import catalog
    from house_price_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    registry = catalog.load_all()
    names = [n for n in args.queries.split(",") if n]

    big_dir = args.keep_dir or tempfile.mkdtemp(prefix=f"probe_x{args.mult}_")
    if not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
        t0 = time.perf_counter()
        build_replica(spark, args.src, big_dir, args.mult)
        print(f"replica x{args.mult} built in "
              f"{time.perf_counter() - t0:.0f}s -> {big_dir}", file=sys.stderr)

    # warmup: JVM/codegen/Arrow + Python-worker pools, untimed
    try:
        (registry["q1_pricing_summary"].fn(spark, args.src)
         .write.format("noop").mode("overwrite").save())
    except Exception:
        pass

    results: dict[str, dict] = {}
    # corpus-scale aggregation width now auto-sizes to the document
    # count (dedup.corpus_partitions) — no env forcing; set
    # SPARK_GRAFT_DEDUP_PARTITIONS manually to A/B the knob.
    for scale, sf_dir in (("x1", args.src), (f"x{args.mult}", big_dir)):
        for name in names:
            # Run index in the job description so each repetition's
            # event-log metrics are keyed separately — only the best
            # (min-time) run's bytes are reported, not runs× the volume.
            best, best_run = None, 0
            for run_i in range(args.runs):
                clear_caches()
                spark.sparkContext.setJobDescription(
                    f"probe:{name}:{scale}:r{run_i}")
                t0 = time.perf_counter()
                try:
                    (registry[name].fn(spark, sf_dir)
                     .write.format("noop").mode("overwrite").save())
                except Exception as ex:  # record, keep probing the rest
                    print(f"{name} {scale} r{run_i} FAILED: "
                          f"{type(ex).__name__}: {str(ex)[:300]}",
                          file=sys.stderr)
                    results.setdefault(name, {})[scale] = {"sec": -1.0,
                                                           "best_run": -1}
                    break
                dt = time.perf_counter() - t0
                if best is None or dt < best:
                    best, best_run = dt, run_i
            spark.sparkContext.setJobDescription(None)
            if best is None:
                continue
            results.setdefault(name, {})[scale] = {"sec": round(best, 2),
                                                   "best_run": best_run}
            print(f"{name} {scale}: {best:.2f}s", file=sys.stderr)

    # streaming-state family: the synthetic-source upsert, rows scaled
    from house_price_etl_pipeline_spark.streaming.foreach import (
        FB_PER_BATCH, FB_ROWS, run_upsert_stream)
    # warmup the Python DataSource + foreachBatch path untimed
    _warm_root = tempfile.mkdtemp(prefix="probe_fb_warm_")
    run_upsert_stream(spark, _warm_root, rows=64, per_batch=64)
    shutil.rmtree(_warm_root, ignore_errors=True)
    for scale, rows in (("x1", FB_ROWS), (f"x{args.mult}",
                                          FB_ROWS * args.mult)):
        spark.sparkContext.setJobDescription(f"probe:stream_upsert:{scale}:r0")
        root = tempfile.mkdtemp(prefix="probe_fb_")
        t0 = time.perf_counter()
        run_upsert_stream(spark, root, rows=rows,
                          per_batch=max(FB_PER_BATCH, rows // 2))
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        results.setdefault("stream_upsert", {})[scale] = {"sec": round(dt, 2),
                                                          "best_run": 0}
        print(f"stream_upsert {scale}: {dt:.2f}s", file=sys.stderr)
        shutil.rmtree(root, ignore_errors=True)

    spark.stop()
    time.sleep(2)  # let the event log flush
    metrics = parse_eventlog(ev_dir)
    for desc, m in metrics.items():
        parts = desc.split(":")
        if len(parts) != 4:
            continue
        _, name, scale, run_tag = parts
        if name in results and scale in results[name]:
            # keep only the metrics of the best (min-time) run
            if run_tag != f"r{results[name][scale].get('best_run', 0)}":
                continue
            results[name][scale].update(
                {k: round(v / 2**30, 3) if k != "task_time_s" else round(v, 1)
                 for k, v in m.items()})

    mult = f"x{args.mult}"
    print(f"\n| query | x1 sec | {mult} sec | ratio | x1 shuf GiB "
          f"| {mult} shuf GiB | shuf ratio |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        a, b = r.get("x1", {}), r.get(mult, {})
        ratio = (b.get("sec", 0) / a["sec"]) if a.get("sec") else float("nan")
        sa = a.get("shuffle_write", 0.0)
        sb = b.get("shuffle_write", 0.0)
        sr = (sb / sa) if sa else float("nan")
        print(f"| {name} | {a.get('sec')} | {b.get('sec')} | {ratio:.1f} "
              f"| {sa} | {sb} | {sr:.1f} |")
    print(json.dumps(results))
    if not args.keep_dir:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
