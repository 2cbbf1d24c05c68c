"""Link-less manifest carries (SPARK_GRAFT_CARRY_MODE=manifest).

Pins the object-store posture of the table format (streaming/carry.py):
incremental commits that move ZERO bytes and touch ZERO inodes (pure
``_CARRY.json`` pointer manifests), reads that resolve pointers across
version dirs (flat and partitioned, batch and change feed), retention/
VACUUM that never deletes a physical file a retained version still
references, mode interop (tables survive the flag flipping either way
mid-history), and the reader protocol gate that keeps older builds from
silently misreading a carried snapshot.

Every manifest-mode test monkeypatches ``os.link`` to raise — proving
the whole DML surface works on a filesystem with no links at all.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.streaming.carry import (
    CARRY_MANIFEST, read_carry, snapshot_files)
from house_price_etl_pipeline_spark.streaming.cdf import (
    read_changes_batch_pysource)
from house_price_etl_pipeline_spark.streaming.ingest import (
    _journal_state, clone_upsert_table, optimize_upsert_target,
    read_upsert_changes, read_upsert_version, restore_upsert_target,
    show_upsert_partitions, upsert_commit_batch, upsert_delete_where,
    upsert_drop_partitions, upsert_update_where, vacuum_upsert_target)
from house_price_etl_pipeline_spark.streaming.partitioning import (
    set_table_partitioning, table_protocol_features)


def _no_link(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("os.link called in manifest carry mode")
    monkeypatch.setattr(os, "link", boom)


def _manifest_mode(monkeypatch, forbid_links=True):
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    if forbid_links:
        _no_link(monkeypatch)


def _phys_parquet(d):
    return sorted(
        os.path.relpath(os.path.join(r, f), d)
        for r, _dirs, fs in os.walk(d) for f in fs
        if f.endswith(".parquet"))


def _vdir(t, which=-1):
    commits, _ = _journal_state(t + "_versions")
    return os.path.join(t + "_versions", commits[which]["version_name"])


def _mk_flat(spark, tmp_path, n=400, keep_versions=8):
    """Multi-file flat table via two key-disjoint commits (AQE
    coalesces a single small write into one file; disjoint commits
    guarantee ≥2 logical files so carries are non-trivial). Batch ids
    0 and 1 are consumed; the head is version 1."""
    t = os.path.join(str(tmp_path), "tbl")
    for b, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        df = spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit(0).alias("ord"))
        upsert_commit_batch(df, t, b, key_cols=["k"], order_col="ord",
                            keep_versions=keep_versions,
                            incremental_min_bytes=0, max_retries=4)
    return t


def test_manifest_commit_moves_no_bytes(spark, tmp_path, monkeypatch):
    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    assert len(snapshot_files(_vdir(t))) >= 2   # carries must be non-trivial
    delta = spark.createDataFrame([(0, -1, 1), (1, -1, 1)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, t, 2, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0,
                        max_retries=4)
    cur = _vdir(t)
    carry = read_carry(cur)
    assert carry, "incremental commit must write a carry manifest"
    # carried names are NOT physical in the new dir; targets are
    # versions_root-relative and point at the base's physical files
    for rel, target in carry.items():
        assert not os.path.exists(os.path.join(cur, rel))
        assert os.path.exists(os.path.join(t + "_versions", target))
    # logical = physical ∪ carried, and the read sees every row
    assert set(snapshot_files(cur)) == set(_phys_parquet(cur)) | set(carry)
    snap = read_upsert_version(spark, t)
    assert snap.count() == 400
    assert snap.filter("v = -1").count() == 2
    # protocol gate: the table now requires carry-aware readers
    assert "carry_manifest" in table_protocol_features(t)


def test_manifest_dml_sequence_and_time_travel(spark, tmp_path,
                                               monkeypatch):
    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    upsert_update_where(spark, t, 2, "k < 10", {"v": F.lit(-5)},
                        keep_versions=8, incremental_min_bytes=0)
    upsert_delete_where(spark, t, 3, "k >= 390", keep_versions=8,
                        incremental_min_bytes=0)
    head = read_upsert_version(spark, t)
    assert head.count() == 390
    assert head.filter("v = -5").count() == 10
    # time travel resolves carried versions
    v1 = read_upsert_version(spark, t, 1)
    assert v1.count() == 400 and v1.filter("v = -5").count() == 0
    # change feed across carried versions: only real changes emit
    ch = read_upsert_changes(spark, t, 1, 3, key_cols=["k"])
    got = {r["change_type"]: r["n"] for r in
           ch.groupBy("change_type").agg(F.count("*").alias("n"))
           .collect()}
    assert got == {"update_preimage": 10, "update_postimage": 10,
                   "delete": 10}
    # OPTIMIZE full rewrite in manifest mode, then RESTORE a carried
    # version (copytree keeps its manifest valid — same versions root)
    optimize_upsert_target(spark, t, keep_versions=8)
    assert read_upsert_version(spark, t).count() == 390
    restore_upsert_target(spark, t, 2, 4, keep_versions=8)
    restored = read_upsert_version(spark, t)
    assert restored.count() == 400
    assert restored.filter("v = -5").count() == 10


def test_manifest_partitioned_dml_and_feeds(spark, tmp_path, monkeypatch):
    _manifest_mode(monkeypatch)
    t = os.path.join(str(tmp_path), "ptbl")
    set_table_partitioning(t, {"bucket": "bigint"})
    df = spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 10).alias("v"))
    upsert_commit_batch(df, t, 0, key_cols=["k", "bucket"],
                        order_col="v", keep_versions=8,
                        incremental_min_bytes=0, max_retries=4)
    delta = spark.range(5).select(
        (F.col("id") * 4 + 2).alias("k"),
        F.lit(2).cast("bigint").alias("bucket"),
        F.lit(999).cast("bigint").alias("v"))
    upsert_commit_batch(delta, t, 1, key_cols=["k", "bucket"],
                        order_col="v", keep_versions=8,
                        incremental_min_bytes=0, max_retries=4)
    cur = _vdir(t)
    carry = read_carry(cur)
    assert carry and all(r.startswith("bucket=") for r in carry)
    # rewritten files live only under the delta's partition
    assert all(r.startswith("bucket=2" + os.sep)
               for r in _phys_parquet(cur))
    snap = read_upsert_version(spark, t)
    assert snap.count() == 80 and snap.filter("v = 999").count() == 5
    assert dict(snap.dtypes)["bucket"] == "bigint"
    # partition values survive the cross-dir union read
    assert snap.filter("bucket = 2").count() == 20
    # SHOW PARTITIONS sees carried partitions (no physical dir in head)
    shown = {r["bucket"]: r["num_files"]
             for r in show_upsert_partitions(spark, t).collect()}
    assert set(shown) == {0, 1, 2, 3}
    # metadata partition drop writes a PURE-manifest version: zero
    # parquet files staged, the other partitions carried by pointer
    upsert_drop_partitions(spark, t, 2, "bucket = 3", keep_versions=8)
    dropped_head = _vdir(t)
    assert _phys_parquet(dropped_head) == []
    assert read_carry(dropped_head)
    snap2 = read_upsert_version(spark, t)
    assert snap2.count() == 60
    assert snap2.filter("bucket = 3").count() == 0
    # batch CDF via the Python data source resolves carried paths
    ch = read_changes_batch_pysource(
        spark, t, key_cols=["k", "bucket"], starting_version=1,
        ending_version=2)
    got = {r["change_type"]: r["n"] for r in
           ch.groupBy("change_type").agg(F.count("*").alias("n"))
           .collect()}
    assert got.get("delete") == 20
    assert got.get("update_postimage", 0) + got.get("insert", 0) >= 5


def test_prune_and_vacuum_respect_carry_references(spark, tmp_path,
                                                   monkeypatch):
    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    owner = _vdir(t)                   # v0: physically owns every file
    owner_name = os.path.basename(owner)
    # two incremental commits with keep_versions=2: v0 retires from
    # retention while v1/v2 still point into it
    for b in (2, 3):
        delta = spark.createDataFrame([(b, -b, b)],
                                      "k bigint, v bigint, ord int")
        upsert_commit_batch(delta, t, b, key_cols=["k"],
                            order_col="ord", keep_versions=2,
                            incremental_min_bytes=0, max_retries=4)
    commits, _ = _journal_state(t + "_versions")
    assert owner_name not in {c["version_name"] for c in commits[-2:]}
    # publish-time prune ran; the retired owner dir must still hold
    # every file the head's manifest references
    head_carry = read_carry(_vdir(t))
    assert any(tgt.startswith(owner_name + "/")
               for tgt in head_carry.values())
    for tgt in head_carry.values():
        assert os.path.exists(os.path.join(t + "_versions", tgt)), tgt
    # VACUUM (age floor forced to zero) must also keep pinned files
    removed = vacuum_upsert_target(t, 0, keep_versions=2, force=True)
    assert owner_name not in removed
    snap = read_upsert_version(spark, t)
    assert snap.count() == 400
    assert snap.filter("v < 0").count() == 2
    # full rewrite unpins everything → the owner remnant is reclaimable
    optimize_upsert_target(spark, t, keep_versions=1)
    delta = spark.createDataFrame([(4, -4, 4)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, t, 4, key_cols=["k"], order_col="ord",
                        keep_versions=1, incremental_min_bytes=0,
                        max_retries=4)
    vacuum_upsert_target(t, 0, keep_versions=1, force=True)
    assert not os.path.isdir(owner), \
        "unpinned owner remnant must be reclaimed"
    assert read_upsert_version(spark, t).count() == 400


def test_mode_interop_link_commit_on_carried_base(spark, tmp_path,
                                                  monkeypatch):
    # manifest-mode history first…
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    t = _mk_flat(spark, tmp_path)
    delta = spark.createDataFrame([(0, -1, 1)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, t, 2, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0,
                        max_retries=4)
    assert read_carry(_vdir(t))
    # …then a LINK-mode commit on the carried base: carried sources
    # must be resolved through the manifest and materialized
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "link")
    delta2 = spark.createDataFrame([(1, -2, 2)],
                                   "k bigint, v bigint, ord int")
    upsert_commit_batch(delta2, t, 3, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0,
                        max_retries=4)
    cur = _vdir(t)
    assert read_carry(cur) == {}
    assert set(_phys_parquet(cur)) == set(snapshot_files(cur))
    snap = read_upsert_version(spark, t)
    assert snap.count() == 400 and snap.filter("v < 0").count() == 2


def test_clone_materializes_carried_files(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    t = _mk_flat(spark, tmp_path)
    delta = spark.createDataFrame([(0, -1, 1)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, t, 2, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0,
                        max_retries=4)
    assert read_carry(_vdir(t))
    dst = os.path.join(str(tmp_path), "clone")
    clone_upsert_table(t, dst)
    cdir = _vdir(dst)
    # the clone is self-contained: every logical file physical, no
    # cross-table pointer manifest
    assert not os.path.exists(os.path.join(cdir, CARRY_MANIFEST))
    assert set(_phys_parquet(cdir)) == set(snapshot_files(_vdir(t)))
    got = read_upsert_version(spark, dst)
    assert got.count() == 400 and got.filter("v = -1").count() == 1


def test_carry_manifest_shape_and_chain_collapse(spark, tmp_path,
                                                 monkeypatch):
    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    owner_name = os.path.basename(_vdir(t))
    # three successive single-key commits: v3's carry entries must
    # point at the ORIGINAL physical owner (one hop), never at v2/v1
    for b in (2, 3, 4):
        delta = spark.createDataFrame([(b * 7, -b, b)],
                                      "k bigint, v bigint, ord int")
        upsert_commit_batch(delta, t, b, key_cols=["k"],
                            order_col="ord", keep_versions=8,
                            incremental_min_bytes=0, max_retries=4)
    carry = read_carry(_vdir(t))
    assert carry
    with open(os.path.join(_vdir(t), CARRY_MANIFEST)) as f:
        assert set(json.load(f)) == {"files"}
    for rel, tgt in carry.items():
        o, orel = tgt.split("/", 1)
        assert orel == rel              # carries never rename
        # the target dir physically owns the file (no pointer chains)
        assert os.path.exists(os.path.join(t + "_versions", tgt))
        assert not read_carry(
            os.path.join(t + "_versions", o)).get(rel), \
            "carry target must be the physical owner, not another carry"
    # at least one untouched base file is still owned by v0
    assert any(tgt.startswith(owner_name + "/")
               for tgt in carry.values())


def test_skipping_manifest_covers_carried_files(spark, tmp_path,
                                                monkeypatch):
    """Data skipping over a manifest-carried snapshot: the pruned read
    must still see CARRIED files' rows (pruning is performance-only by
    contract) and carried files keep their stats entries, so they still
    prune when their ranges exclude the predicate."""
    from house_price_etl_pipeline_spark.streaming.skipping import (
        read_skipping, read_stats_manifest)

    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    # full rewrite with a stats manifest, sized to several files
    optimize_upsert_target(spark, t, keep_versions=8,
                           target_file_bytes=2048, stats_cols=["k"],
                           zorder_by=["k"])
    # incremental commit on top: kept files carry BY POINTER, and their
    # stats entries carry with them
    delta = spark.createDataFrame([(0, -1, 1)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, t, 2, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0,
                        max_retries=4)
    cur = _vdir(t)
    carry = read_carry(cur)
    assert carry
    stats = read_stats_manifest(cur)
    assert stats is not None
    assert set(carry) <= set(stats["files"]), \
        "carried files must keep their stats entries"
    df, n_scanned, n_total = read_skipping(spark, t,
                                           {"k": (300, 399)})
    assert n_total == len(snapshot_files(cur))
    assert n_scanned < n_total, "stats must still prune"
    assert df.count() == 100          # carried rows all present


def test_carry_mode_env_validated(monkeypatch):
    from house_price_etl_pipeline_spark.config import carry_mode
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "s3")
    with pytest.raises(ValueError, match="link.*manifest|manifest"):
        carry_mode()


def test_drop_carry_manifest_feature(spark, tmp_path, monkeypatch):
    """DROP FEATURE recovery path: a writer that STAGED in manifest
    mode but never committed a manifest leaves the reader gate on a
    fully-physical table — droppable; once a committed snapshot really
    carries by manifest, the drop must refuse; after a full physical
    rewrite plus vacuum it becomes droppable again."""
    from house_price_etl_pipeline_spark.streaming.partitioning import (
        drop_table_feature, register_table_feature,
        table_protocol_features)

    t = os.path.join(str(tmp_path), "plain")
    df = spark.range(10).select(F.col("id").alias("k"),
                                (F.col("id") * 2).alias("v"),
                                F.lit(0).alias("ord"))
    upsert_commit_batch(df, t, 0, key_cols=["k"], order_col="ord",
                        keep_versions=1, incremental_min_bytes=0)
    # simulate the staged-but-never-committed registration
    register_table_feature(t, "carry_manifest")
    assert "carry_manifest" in table_protocol_features(t)
    assert drop_table_feature(t, "carry_manifest") is True
    assert "carry_manifest" not in table_protocol_features(t)
    assert drop_table_feature(t, "carry_manifest") is False  # idempotent

    # a real manifest-carried commit re-gates, and then REFUSES to drop
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    d2 = _mk_flat(spark, tmp_path)
    delta = spark.createDataFrame([(0, -1, 1)],
                                  "k bigint, v bigint, ord int")
    upsert_commit_batch(delta, d2, 2, key_cols=["k"], order_col="ord",
                        keep_versions=8, incremental_min_bytes=0)
    with pytest.raises(ValueError, match="rewrite the table physical"):
        drop_table_feature(d2, "carry_manifest")
    # full physical rewrite in link mode + vacuum clears every manifest
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "link")
    optimize_upsert_target(spark, d2, keep_versions=1)
    delta2 = spark.createDataFrame([(1, -2, 2)],
                                   "k bigint, v bigint, ord int")
    upsert_commit_batch(delta2, d2, 3, key_cols=["k"], order_col="ord",
                        keep_versions=1, incremental_min_bytes=0)
    vacuum_upsert_target(d2, 0, keep_versions=1, force=True)
    assert drop_table_feature(d2, "carry_manifest") is True
    assert read_upsert_version(spark, d2).count() == 400
    # non-droppable features refuse loudly
    with pytest.raises(ValueError, match="only 'carry_manifest'"):
        drop_table_feature(d2, "column_mapping")


def test_stream_cdf_refuses_pruned_remnant(spark, tmp_path, monkeypatch):
    """A lagging change-feed stream whose offsets point at a PARTIALLY
    PRUNED version dir (manifest-carry tombstone) must fail loudly —
    diffing the pinned-files-only remnant would fabricate change rows
    from a partial file set."""
    from house_price_etl_pipeline_spark.streaming.cdf import (
        stream_upsert_changes)
    from house_price_etl_pipeline_spark.streaming.carry import (
        is_pruned_remnant)

    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path, keep_versions=2)
    v1_dir = _vdir(t)
    for b in (2, 3):
        delta = spark.createDataFrame([(b, -b, b)],
                                      "k bigint, v bigint, ord int")
        upsert_commit_batch(delta, t, b, key_cols=["k"],
                            order_col="ord", keep_versions=2,
                            incremental_min_bytes=0, max_retries=4)
    # v1 retired and partially pruned (head still pins some of its files)
    assert is_pruned_remnant(v1_dir)
    feed = stream_upsert_changes(spark, t, ["k"])
    q = (feed.writeStream.format("memory")
         .queryName("remnant_probe").outputMode("append")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="pruned past retention"):
        q.awaitTermination()
    # batch time travel refuses the remnant the same way
    with pytest.raises(FileNotFoundError, match="not retained"):
        read_upsert_version(spark, t, 1).count()


def test_flat_carried_read_is_one_scan_at_any_owner_count(spark, tmp_path,
                                                          monkeypatch):
    """r12 VERDICT item 4 (fan-out probe) regression pin, flat half: a
    FLAT manifest-carried head whose ownership spreads across many
    version dirs must still read as ONE multi-path scan — no per-owner
    union — so deep retention costs nothing on the read path
    (scripts/carry_fanout_probe.py: 26 owners read 0.10s single-scan
    vs 1.89s as a 26-branch union)."""
    _manifest_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path, keep_versions=12)
    for b in range(2, 10):  # 8 single-key commits spread ownership
        delta = spark.createDataFrame([(b * 17, -b, b)],
                                      "k bigint, v bigint, ord int")
        upsert_commit_batch(delta, t, b, key_cols=["k"], order_col="ord",
                            keep_versions=12, incremental_min_bytes=0,
                            max_retries=4)
    from house_price_etl_pipeline_spark.streaming.carry import owner_groups
    head = _vdir(t)
    groups = owner_groups(head, snapshot_files(head))
    assert len(groups) >= 3, "fixture must actually spread ownership"
    df = read_upsert_version(spark, t)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan
    assert df.count() == 400
    assert df.filter("v < 0").count() == 8


def test_auto_compact_collapses_partitioned_owner_fanout(spark, tmp_path,
                                                         monkeypatch):
    """r12 VERDICT item 4 regression pin, partitioned half: a
    PARTITIONED carried read pays one scan branch per owner dir
    (basePath anchoring allows no single scan), so
    auto_compact_upsert_target triggers on owner spread and one
    incremental OPTIMIZE collapses ownership back to a single dir with
    identical rows."""
    _manifest_mode(monkeypatch)
    from house_price_etl_pipeline_spark.streaming.carry import owner_groups
    from house_price_etl_pipeline_spark.streaming.ingest import (
        auto_compact_upsert_target)

    t = os.path.join(str(tmp_path), "ptbl")
    set_table_partitioning(t, {"p": "int"})
    base = spark.range(200).selectExpr("id as k", "id * 2 as v",
                                       "cast(id % 4 as int) as p",
                                       "0 as ord")
    upsert_commit_batch(base, t, 0, key_cols=["k"], order_col="ord",
                        keep_versions=12, incremental_min_bytes=0,
                        max_retries=4)
    for b in range(1, 7):   # spread ownership across 6 more dirs
        delta = spark.createDataFrame([(b, -b, b % 4, b)],
                                      "k bigint, v bigint, p int, ord int")
        upsert_commit_batch(delta, t, b, key_cols=["k"], order_col="ord",
                            keep_versions=12, incremental_min_bytes=0,
                            max_retries=4)
    head = _vdir(t)
    spread = len(owner_groups(head, snapshot_files(head)))
    assert spread >= 3
    before = {(r.k, r.v, r.p) for r in read_upsert_version(spark, t).collect()}
    # below the spread: no trigger;  at/above: one OPTIMIZE commit
    assert auto_compact_upsert_target(
        spark, t, min_small_files=10**6, keep_versions=12,
        max_owner_dirs=spread) is None
    assert auto_compact_upsert_target(
        spark, t, min_small_files=10**6, keep_versions=12,
        max_owner_dirs=spread - 1) is not None
    head = _vdir(t)
    assert len(owner_groups(head, snapshot_files(head))) == 1
    after = {(r.k, r.v, r.p) for r in read_upsert_version(spark, t).collect()}
    assert after == before


def test_rebase_fast_path_survives_concurrent_vacuum_manifest(
        spark, tmp_path, monkeypatch):
    """VERDICT r12 item 5: the disjoint-writer REBASE fast path racing
    VACUUM in manifest carry mode. Two writers hammer disjoint
    partitions (losers rebase: carry manifests re-pointed at the new
    head between a stat-check and a publish) while a third thread
    force-VACUUMs at zero age with tight retention — the exact window
    where a rebase's carry targets can vanish mid-carry. Pins: every
    commit lands (rebase or graceful full re-stage fallback), VACUUM
    never errors, the journal stays gap-free, the final state equals
    serial application, and NO retained version is left with a
    dangling carry entry (every manifest target resolves to a physical
    file)."""
    import threading
    import time

    from house_price_etl_pipeline_spark.streaming.carry import read_carry
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _journal_state, _retained_names, resolve_published_snapshot,
        vacuum_upsert_target)

    _manifest_mode(monkeypatch)
    t = os.path.join(str(tmp_path), "tbl")
    set_table_partitioning(t, {"bucket": "bigint"})
    base = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("bucket"),
        F.lit(0).cast("long").alias("payload"),
        F.lit(0).cast("long").alias("ord"))
    upsert_commit_batch(base, t, 0, key_cols=["k", "bucket"],
                        order_col="ord", keep_versions=2,
                        incremental_min_bytes=0)

    errors, stop = [], threading.Event()

    def writer(tag, bucket, ids):
        try:
            for bid in ids:
                df = spark.createDataFrame(
                    [(bucket * 100 + j, bucket, bid, bid)
                     for j in range(3)],
                    "k long, bucket long, payload long, ord long")
                r = upsert_commit_batch(
                    df, t, bid, key_cols=["k", "bucket"],
                    order_col="ord", keep_versions=2, writer=tag,
                    max_retries=16, incremental_min_bytes=0)
                assert r in ("applied", "applied-after-retry"), r
        except Exception as exc:  # pragma: no cover
            errors.append((tag, exc))

    def vacuumer():
        try:
            while not stop.is_set():
                vacuum_upsert_target(t, older_than_seconds=0,
                                     keep_versions=2, force=True)
                time.sleep(0.005)
        except Exception as exc:  # pragma: no cover
            errors.append(("vacuum", exc))

    ts = [threading.Thread(target=writer, args=("a", 1, [1, 3, 5, 7, 9])),
          threading.Thread(target=writer, args=("b", 2, [2, 4, 6, 8, 10])),
          threading.Thread(target=vacuumer)]
    for th in ts:
        th.start()
    for th in ts[:2]:
        th.join()
    stop.set()
    ts[2].join()
    assert errors == []

    commits, _ = _journal_state(t + "_versions")
    assert [c["seq"] for c in commits] == list(range(len(commits)))
    assert {c["version"] for c in commits} == set(range(11))
    # final state == serial keep-latest application
    got = {r.k: (r.bucket, r.payload) for r in
           read_upsert_version(spark, t).collect()}
    model = {i: (i % 3, 0) for i in range(30)}
    model.update({100 + j: (1, 9) for j in range(3)})
    model.update({200 + j: (2, 10) for j in range(3)})
    assert got == model
    # no dangling manifest entries anywhere still reachable: every
    # carry target of every RETAINED version (and the published head)
    # must resolve to a physical file
    vroot = t + "_versions"
    reachable = _retained_names(commits, 2)
    reachable.add(os.path.basename(resolve_published_snapshot(t)))
    for name in sorted(reachable):
        d = os.path.join(vroot, name)
        assert os.path.isdir(d), f"retained version dir missing: {name}"
        for rel, tgt in read_carry(d).items():
            assert os.path.exists(os.path.join(vroot, tgt)), (
                f"dangling carry entry {rel} -> {tgt} in {name}")
