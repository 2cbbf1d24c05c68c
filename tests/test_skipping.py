"""File-level data-skipping manifest (streaming/skipping.py): stats
correctness, prune safety (never drops a matching row), and the
ZORDER+manifest integration in OPTIMIZE."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.streaming.ingest import (
    optimize_upsert_target, upsert_commit_batch)
from house_price_etl_pipeline_spark.streaming.skipping import (
    STATS_MANIFEST, prune_files, read_skipping, read_stats_manifest,
    write_stats_manifest)


def _build_table(spark, root, n=4096, zorder=True):
    """Upsert n synthetic rows and OPTIMIZE ZORDER into ~8 files with a
    stats manifest on (a, b)."""
    target = os.path.join(root, "tbl")
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).alias("a"),
        ((F.col("id") * 7919) % 64).alias("b"),
        (F.col("id") % 10).cast("double").alias("v"))
    upsert_commit_batch(df, target, 0, key_cols=["k"], order_col="k")
    from house_price_etl_pipeline_spark.streaming.ingest import \
        _data_file_bytes
    snap_bytes = _data_file_bytes(os.path.realpath(target))
    optimize_upsert_target(
        spark, target, target_file_bytes=max(1, snap_bytes // 8),
        zorder_by=["a", "b"] if zorder else None,
        stats_cols=["a", "b"])
    return target


def test_manifest_stats_match_file_contents(spark, tmp_path):
    """Every manifest [min, max] equals the file's actual column range
    (footer stats are the source of truth a prune decision rides on)."""
    target = _build_table(spark, str(tmp_path))
    snap = os.path.realpath(target)
    manifest = read_stats_manifest(snap)
    assert manifest is not None and manifest["columns"] == ["a", "b"]
    files = [f for f in os.listdir(snap)
             if f.endswith(".parquet") and not f.startswith(("_", "."))]
    assert len(files) > 1              # the rewrite really multi-filed
    assert set(manifest["files"]) == set(files)
    for f, entry in manifest["files"].items():
        pdf = spark.read.parquet(os.path.join(snap, f)) \
            .agg(F.min("a"), F.max("a"), F.min("b"), F.max("b"),
                 F.count("*")) \
            .collect()[0]
        stats = entry["stats"]
        assert stats["a"][0] == pdf[0] and stats["a"][1] == pdf[1]
        assert stats["b"][0] == pdf[2] and stats["b"][1] == pdf[3]
        assert entry["rows"] == pdf[4]


def test_skipping_read_equals_full_filter_and_prunes(spark, tmp_path):
    """read_skipping == plain filter on every row, while scanning
    strictly fewer files (the zorder clustering makes ranges on either
    dimension selective)."""
    target = _build_table(spark, str(tmp_path))
    for col, bounds in (("a", (0, 7)), ("b", (56, 63)), ("a", (30, 33))):
        df, n_scan, n_total = read_skipping(spark, target, {col: bounds})
        expect = (spark.read.parquet(target)
                  .filter(F.col(col).between(*bounds)))
        got = sorted(r.k for r in df.collect())
        want = sorted(r.k for r in expect.collect())
        assert got == want, (col, bounds)
        assert n_scan < n_total, (col, bounds, n_scan, n_total)


def test_prune_is_safe_without_manifest_or_stats(spark, tmp_path):
    """No manifest → keep everything; a column missing from the stats →
    unprunable on that column; both still return exact results."""
    target = _build_table(spark, str(tmp_path))
    snap = os.path.realpath(target)
    # drop column 'b' stats from every file entry
    manifest = read_stats_manifest(snap)
    for f in manifest["files"]:
        manifest["files"][f]["stats"].pop("b", None)
    with open(os.path.join(snap, STATS_MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    kept_b, total = prune_files(snap, {"b": (0, 1)})
    assert kept_b == sorted(manifest["files"])     # b unprunable now
    kept_a, _ = prune_files(snap, {"a": (0, 7)})
    assert len(kept_a) < total                     # a still prunes
    # no manifest at all
    os.remove(os.path.join(snap, STATS_MANIFEST))
    kept_none, total2 = prune_files(snap, {"a": (0, 7)})
    assert kept_none == sorted(manifest["files"]) and total2 == total
    df, n_scan, n_total = read_skipping(spark, target, {"a": (0, 7)})
    assert n_scan == n_total                       # kept all — safe
    assert df.filter(~F.col("a").between(0, 7)).count() == 0
    assert df.count() == 4096 // 8                 # exact result anyway


def test_all_files_pruned_returns_empty_with_schema(spark, tmp_path):
    target = _build_table(spark, str(tmp_path))
    df, n_scan, n_total = read_skipping(spark, target,
                                        {"a": (1000, 2000)})
    assert df.count() == 0
    assert set(df.columns) == {"k", "a", "b", "v"}


def test_unzordered_rewrite_prunes_poorly_or_not(spark, tmp_path):
    """Negative control: without ZORDER the same range predicate keeps
    (almost) every file — the manifest only pays off on clustered
    layouts, which is the documented contract."""
    target = _build_table(spark, str(tmp_path), zorder=False)
    _, n_scan_plain, n_total = read_skipping(spark, target,
                                             {"a": (0, 7)})
    target_z = _build_table(spark, str(tmp_path / "z"), zorder=True)
    _, n_scan_z, n_total_z = read_skipping(spark, target_z,
                                           {"a": (0, 7)})
    # round-robin repartition spreads a∈[0,7] across every file
    assert n_scan_plain == n_total
    assert n_scan_z < n_total_z


def test_all_null_column_file_is_droppable(spark, tmp_path):
    """A file whose predicate column is entirely NULL carries
    [None, None, rows] in the manifest and is pruned for ANY range
    (NULL never satisfies BETWEEN) — while mixed-null files keep their
    real min/max plus the null count."""
    d = str(tmp_path / "nullfiles")
    spark.createDataFrame(
        [(1, None), (2, None)], "k long, a int").coalesce(1) \
        .write.parquet(os.path.join(d, "f_allnull"))
    spark.createDataFrame(
        [(3, 5), (4, None)], "k long, a int").coalesce(1) \
        .write.parquet(os.path.join(d, "f_mixed"))
    import shutil
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, sub in enumerate(("f_allnull", "f_mixed")):
        src = next(f for f in os.listdir(os.path.join(d, sub))
                   if f.endswith(".parquet"))
        shutil.copy(os.path.join(d, sub, src),
                    os.path.join(flat, f"part-{i}.parquet"))
    write_stats_manifest(flat, ["a"])
    manifest = read_stats_manifest(flat)
    assert manifest["files"]["part-0.parquet"]["stats"]["a"] == [None, None, 2]
    assert manifest["files"]["part-1.parquet"]["stats"]["a"] == [5, 5, 1]
    kept, total = prune_files(flat, {"a": (0, 100)})
    assert total == 2 and kept == ["part-1.parquet"]


def test_float_columns_get_no_range_stats(spark, tmp_path):
    """Parquet min/max exclude NaN and Spark orders NaN above every
    double, so a float range decided from footer stats could drop a
    file whose only matching rows are NaN: float columns must carry NO
    range stats (always kept), while a provably all-NULL float column
    keeps the droppable [None, None, rows] form (no values → no NaN)."""
    import shutil
    d = str(tmp_path / "floatsrc")
    spark.createDataFrame(
        [(1, 1.5), (2, float("nan"))], "k long, v double").coalesce(1) \
        .write.parquet(os.path.join(d, "f_nan"))
    spark.createDataFrame(
        [(3, None), (4, None)], "k long, v double").coalesce(1) \
        .write.parquet(os.path.join(d, "f_allnull"))
    flat = str(tmp_path / "floatflat")
    os.makedirs(flat)
    for i, sub in enumerate(("f_nan", "f_allnull")):
        src = next(f for f in os.listdir(os.path.join(d, sub))
                   if f.endswith(".parquet"))
        shutil.copy(os.path.join(d, sub, src),
                    os.path.join(flat, f"part-{i}.parquet"))
    write_stats_manifest(flat, ["v", "k"])
    manifest = read_stats_manifest(flat)
    assert "v" not in manifest["files"]["part-0.parquet"]["stats"]
    assert manifest["files"]["part-1.parquet"]["stats"]["v"] == \
        [None, None, 2]
    assert manifest["files"]["part-0.parquet"]["stats"]["k"] == [1, 2, 0]
    # range above the finite values must NOT prune the NaN file (Spark
    # treats NaN > any double, so v >= 100.0 matches the NaN row)
    kept, total = prune_files(flat, {"v": (100.0, None)})
    assert total == 2 and "part-0.parquet" in kept


def test_distributed_manifest_matches_serial(spark, tmp_path, monkeypatch):
    """write_stats_manifest(spark=...) — the executor-side footer walk
    used by OPTIMIZE past the file-count threshold — produces a
    byte-identical manifest to the serial driver loop."""
    import house_price_etl_pipeline_spark.streaming.skipping as sk

    target = _build_table(spark, str(tmp_path))
    snap = os.path.realpath(target)
    write_stats_manifest(snap, ["a", "b"])
    serial = read_stats_manifest(snap)
    monkeypatch.setattr(sk, "_DISTRIBUTE_STATS_MIN_FILES", 2)
    write_stats_manifest(snap, ["a", "b"], spark=spark)
    dist = read_stats_manifest(snap)
    assert dist == serial and len(dist["files"]) > 1


def test_manifest_carries_across_incremental_commits(spark, tmp_path):
    """Data skipping survives incremental commits: kept (hard-linked)
    files keep their manifest entries, rewritten files get fresh
    footer stats — O(changed) per commit — so pruning keeps working
    between compactions instead of silently degrading."""
    import os

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.streaming.ingest import (
        optimize_upsert_target, upsert_commit_batch)
    from house_price_etl_pipeline_spark.streaming.skipping import (
        read_skipping, read_stats_manifest)

    t = os.path.join(str(tmp_path), "tbl")
    df = spark.range(0, 4000).select(F.col("id").alias("k"),
                                     F.col("id").alias("v"))
    upsert_commit_batch(df.repartition(4), t, 0, key_cols=["k"],
                        order_col="v", keep_versions=8)
    optimize_upsert_target(spark, t, keep_versions=8, stats_cols=["v"],
                           max_records_per_file=500, zorder_by=["v"])
    base_manifest = read_stats_manifest(os.path.realpath(t))
    assert base_manifest is not None
    # incremental commit touching a narrow key slice
    d = spark.range(0, 20).select(F.col("id").alias("k"),
                                  (F.col("id") + 10_000_000).alias("v"))
    upsert_commit_batch(d, t, 1, key_cols=["k"], order_col="v",
                        keep_versions=8, incremental_min_bytes=0)
    head = os.path.realpath(t)
    m = read_stats_manifest(head)
    assert m is not None, "manifest dropped by the incremental commit"
    # every live data file has an entry
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _snapshot_data_files)
    assert set(m["files"]) == set(_snapshot_data_files(head))
    # pruning still fires and results stay exact
    df2, n_scanned, n_total = read_skipping(spark, t, {"v": (100, 200)})
    assert n_scanned < n_total
    assert df2.count() == 101
    # the rewritten file's fresh stats cover the new high values
    df3, n3, _ = read_skipping(spark, t,
                               {"v": (10_000_000, 20_000_000)})
    assert df3.count() == 20 and n3 >= 1
