"""Scale probe for PARTITIONED BY tables and incremental OPTIMIZE.

Builds the same partitioned table at 1x and 8x rows and measures the
operations whose 100 TB story depends on NOT scaling with table size:

- metadata-only partition drop (pure links: wall should stay ~flat)
- single-partition COW upsert (files_rewritten bounded by the touched
  partition, wall ~flat as untouched data grows)
- partition-pruned read (files opened = one partition's files)
- incremental vs full OPTIMIZE at identical small-file debt (wall gap
  should WIDEN with table size — the debt is constant, the table isn't)

Run:  python scripts/partition_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from house_price_etl_pipeline_spark.session import get_spark  # noqa: E402
from house_price_etl_pipeline_spark.streaming.ingest import (  # noqa: E402
    _journal_state, _snapshot_data_files, optimize_upsert_target,
    read_upsert_version, upsert_commit_batch, upsert_drop_partitions)
from house_price_etl_pipeline_spark.streaming.partitioning import (  # noqa: E402
    set_table_partitioning)

N_BUCKETS = 16


def build(spark, root, rows, debt_commits=6):
    t = os.path.join(root, f"tbl_{rows}")
    set_table_partitioning(t, {"bucket": "bigint"})
    base = spark.range(0, rows).select(
        F.col("id").alias("k"), (F.col("id") % N_BUCKETS).alias("bucket"),
        (F.col("id") * 3).alias("v")).repartition(8)
    upsert_commit_batch(base, t, 0, key_cols=["k", "bucket"],
                        order_col="v", keep_versions=4)
    # compact the base first: incremental OPTIMIZE's regime is a
    # WELL-SIZED table carrying a constant trickle of small commits —
    # debt ≪ table, the opposite of a table that is all debt
    optimize_upsert_target(spark, t, keep_versions=4, stats_cols=[])
    # constant small-file debt regardless of table size: disjoint keys
    for i in range(debt_commits):
        d = spark.range(rows + i * 100, rows + i * 100 + 50).select(
            F.col("id").alias("k"),
            (F.col("id") % N_BUCKETS).alias("bucket"),
            F.lit(1).cast("bigint").alias("v"))
        upsert_commit_batch(d, t, i + 1, key_cols=["k", "bucket"],
                            order_col="v", keep_versions=4,
                            incremental_min_bytes=0)
    return t


def probe(spark, root, rows):
    out = {"rows": rows}
    t = build(spark, root, rows)
    head = os.path.realpath(t)
    out["files_head"] = len(_snapshot_data_files(head))

    # partition-pruned read
    snap = read_upsert_version(spark, t)
    t0 = time.monotonic()
    opened = (snap.filter(F.col("bucket") == 3)
              .select(F.input_file_name()).distinct().count())
    out["pruned_read_s"] = round(time.monotonic() - t0, 3)
    out["pruned_files_opened"] = opened
    out["total_files"] = (snap.select(F.input_file_name())
                          .distinct().count())

    # single-partition COW upsert
    d = spark.range(0, 200).select(
        (F.col("id") * N_BUCKETS + 5).alias("k"),
        F.lit(5).cast("bigint").alias("bucket"),
        F.lit(9).cast("bigint").alias("v"))
    t0 = time.monotonic()
    upsert_commit_batch(d, t, 100, key_cols=["k", "bucket"],
                        order_col="v", keep_versions=4,
                        incremental_min_bytes=0)
    out["cow_upsert_s"] = round(time.monotonic() - t0, 3)
    e = _journal_state(t + "_versions")[0][-1]
    out["cow_rewritten"] = e["files_rewritten"]
    out["cow_reused"] = e["files_reused"]

    # metadata-only drop
    t0 = time.monotonic()
    upsert_drop_partitions(spark, t, 101, "bucket = 7", keep_versions=4)
    out["drop_partition_s"] = round(time.monotonic() - t0, 3)

    # incremental vs full OPTIMIZE: the debt is constant (the trickle
    # commits), the table grows 8x — incremental wall should stay flat
    # while full rewrite wall scales with the table
    t0 = time.monotonic()
    optimize_upsert_target(spark, t, keep_versions=4,
                           min_file_bytes=64 * 1024,
                           stats_cols=[])
    out["optimize_incremental_s"] = round(time.monotonic() - t0, 3)
    e = _journal_state(t + "_versions")[0][-1]
    out["opt_rewritten"] = e.get("files_rewritten")
    out["opt_reused"] = e.get("files_reused")
    t0 = time.monotonic()
    optimize_upsert_target(spark, t, keep_versions=4, stats_cols=[])
    out["optimize_full_s"] = round(time.monotonic() - t0, 3)
    return out


def main():
    spark = get_spark(app_name="partition_probe", cores=32)
    root = tempfile.mkdtemp(prefix="part_probe_")
    try:
        for rows in (250_000, 2_000_000):
            print(json.dumps(probe(spark, root, rows)))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
