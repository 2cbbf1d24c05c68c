#!/usr/bin/env python
"""Link-less carry probe (VERDICT r11 item 3): manifest-pointer carries
must make an incremental commit's carry cost O(1) in the carried file
count — one small JSON write — where the hard-link carry pays one
syscall per carried file (and a full byte copy per file on stores
without links, which is every object store).

Builds a base snapshot with N files, then runs one single-key
incremental commit per mode and measures:

1. carry wall per mode (stage-to-publish, minus the shared merge cost
   is not separable locally, so the headline is the CARRY side-cost:
   staged bytes on disk and syscalls proxied by staged file count);
2. staged PHYSICAL bytes for the new version (manifest mode should be
   ~the rewritten file only);
3. pure-metadata partition drop in manifest mode: files staged must be
   ZERO (pointer manifest only), vs one link per kept file in link mode;
4. copy-fallback worst case: link mode with os.link disabled (the
   object-store-without-manifests strawman) — full bytes re-copied.

Usage:
    python scripts/carry_probe.py [--files 64] [--rows 400000]
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


def _phys(d):
    out = []
    for r, _dirs, fs in os.walk(d):
        out += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--rows", type=int, default=400_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _journal_state, read_upsert_version, upsert_commit_batch,
        upsert_drop_partitions)
    from house_price_etl_pipeline_spark.streaming.partitioning import (
        set_table_partitioning)

    spark = get_spark(app_name="carry_probe", cores=8)
    work = tempfile.mkdtemp(prefix="carry_probe_")
    out: dict = {"files": args.files, "rows": args.rows}

    def build(tag, mode):
        # PARTITIONED BY bucket: partitionBy writes one file per live
        # bucket deterministically — the base really has args.files
        # files (a flat small write gets AQE-coalesced and would make
        # the carry trivial)
        os.environ["SPARK_GRAFT_CARRY_MODE"] = mode
        t = os.path.join(work, f"tbl_{tag}")
        set_table_partitioning(t, {"bucket": "bigint"})
        df = spark.range(args.rows).select(
            F.col("id").alias("k"),
            (F.col("id") % args.files).alias("bucket"),
            (F.col("id") * 2).alias("v"),
            F.lit(0).alias("ord")).repartition(args.files, "bucket")
        upsert_commit_batch(df, t, 0, key_cols=["k", "bucket"],
                            order_col="ord", keep_versions=4,
                            incremental_min_bytes=0)
        return t

    def head_dir(t):
        commits, _ = _journal_state(t + "_versions")
        return os.path.join(t + "_versions", commits[-1]["version_name"])

    def one_commit(t, b):
        delta = spark.createDataFrame(
            [(0, 0, -b, b)], "k bigint, bucket bigint, v bigint, ord int")
        t0 = time.perf_counter()
        upsert_commit_batch(delta, t, b, key_cols=["k", "bucket"],
                            order_col="ord", keep_versions=4,
                            incremental_min_bytes=0)
        wall = time.perf_counter() - t0
        hd = head_dir(t)
        files = _phys(hd)
        return {"wall_s": round(wall, 3),
                "staged_physical_files": len(files),
                "staged_physical_bytes": sum(map(os.path.getsize, files))}

    # 1+2: incremental commit, link vs manifest vs copy-fallback —
    # commit b=1 is an unmeasured warmup (JVM/codegen), b=2 is measured
    for mode in ("link", "manifest"):
        t = build(mode, mode)
        one_commit(t, 1)
        out[f"incremental_commit_{mode}"] = one_commit(t, 2)
        out[f"incremental_commit_{mode}"]["read_rows"] = \
            read_upsert_version(spark, t).count()
    # copy-fallback strawman: link mode with links disabled
    t = build("copyfb", "link")
    one_commit(t, 1)
    real_link = os.link

    def _no(*a, **k):
        raise OSError("links disabled (object-store strawman)")
    os.link = _no
    try:
        out["incremental_commit_copy_fallback"] = one_commit(t, 2)
    finally:
        os.link = real_link

    # 3: metadata partition drop staging cost per mode
    for mode in ("link", "manifest"):
        os.environ["SPARK_GRAFT_CARRY_MODE"] = mode
        t = build(f"drop_{mode}", mode)
        t0 = time.perf_counter()
        upsert_drop_partitions(spark, t, 1, "bucket = 0",
                               keep_versions=4)
        wall = time.perf_counter() - t0
        hd = head_dir(t)
        out[f"partition_drop_{mode}"] = {
            "wall_s": round(wall, 3),
            "staged_physical_files": len(_phys(hd)),
            "read_rows": read_upsert_version(spark, t).count()}

    os.environ.pop("SPARK_GRAFT_CARRY_MODE", None)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
