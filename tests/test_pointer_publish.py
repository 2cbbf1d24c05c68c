"""Pointer-file publication (SPARK_GRAFT_PUBLISH_MODE=pointer) + the
abstracted CAS primitive — the object-store posture completed (VERDICT
r12 item 2).

Every test here runs with BOTH ``os.symlink`` and ``os.link``
monkeypatched to raise, in manifest carry mode: the whole DML /
OPTIMIZE / VACUUM / time-travel / change-feed surface must work on a
filesystem with no links of any kind, which is exactly an object
store. Publication is the ``_LATEST.json`` pointer file (Delta's
``_last_checkpoint`` pattern); engine reads resolve the commit
journal's head (Delta's readers-resolve-the-log rule), so a stale
pointer can never regress a read. The commit CAS itself routes
through ``fsutil.cas_put_if_absent`` — one swappable primitive shaped
like an If-None-Match conditional PUT.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark import fsutil
from house_price_etl_pipeline_spark.streaming.ingest import (
    _journal_state, optimize_upsert_target, read_upsert_as_of_timestamp,
    read_upsert_changes, read_upsert_version, resolve_published_snapshot,
    upsert_commit_batch, upsert_delete_where, upsert_merge_into,
    upsert_update_where, vacuum_upsert_target)


def _no_links_pointer_mode(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PUBLISH_MODE", "pointer")
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")

    def no_link(*a, **k):
        raise AssertionError("os.link called in pointer/manifest mode")

    def no_symlink(*a, **k):
        raise AssertionError("os.symlink called in pointer publish mode")

    monkeypatch.setattr(os, "link", no_link)
    monkeypatch.setattr(os, "symlink", no_symlink)


def _mk_flat(spark, tmp_path, n=400, keep_versions=8):
    t = os.path.join(str(tmp_path), "tbl")
    for b, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        df = spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit(0).alias("ord"))
        upsert_commit_batch(df, t, b, key_cols=["k"], order_col="ord",
                            keep_versions=keep_versions,
                            incremental_min_bytes=0, max_retries=4)
    return t


def _latest(t):
    with open(os.path.join(t + "_versions", "_LATEST.json")) as f:
        return json.load(f)


def test_pointer_dml_sequence_no_symlink(spark, tmp_path, monkeypatch):
    """Full DML chain with zero link/symlink syscalls: commits publish
    the pointer file, reads resolve the journal head, the target path
    itself never exists on disk."""
    _no_links_pointer_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    assert not os.path.lexists(t)  # no symlink was ever created
    assert read_upsert_version(spark, t).count() == 400

    upsert_update_where(spark, t, 2, "k < 10", {"v": "-1"},
                        key_cols=["k"], keep_versions=8,
                        incremental_min_bytes=0, max_retries=4)
    upsert_delete_where(spark, t, 3, "k >= 390", keep_versions=8,
                        max_retries=4, incremental_min_bytes=0)
    src = spark.createDataFrame([(10, 777, 1), (1000, 777, 1)],
                                "k bigint, v bigint, ord int")
    upsert_merge_into(spark, t, 4, src, ["k"], keep_versions=8,
                      max_retries=4, incremental_min_bytes=0)
    snap = read_upsert_version(spark, t)
    assert snap.count() == 391  # 400 - 10 deleted + 1 inserted
    assert snap.filter("v = -1").count() == 10
    assert snap.filter("v = 777").count() == 2
    # the pointer file tracks the journal head exactly
    commits, _ = _journal_state(t + "_versions")
    assert _latest(t)["seq"] == commits[-1]["seq"]
    assert _latest(t)["version_name"] == commits[-1]["version_name"]
    # resolver lands inside the versions root on the head snapshot
    pub = resolve_published_snapshot(t)
    assert os.path.dirname(pub) == t + "_versions"
    assert os.path.basename(pub) == commits[-1]["version_name"]


def test_pointer_optimize_and_time_travel(spark, tmp_path, monkeypatch):
    _no_links_pointer_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path)
    upsert_delete_where(spark, t, 2, "k % 2 = 1", keep_versions=8,
                        max_retries=4, incremental_min_bytes=0)
    optimize_upsert_target(spark, t, keep_versions=8)
    assert read_upsert_version(spark, t).count() == 200
    # VERSION AS OF across the OPTIMIZE (shares its version number)
    assert read_upsert_version(spark, t, 1).count() == 400
    assert read_upsert_version(spark, t, 2).count() == 200
    # TIMESTAMP AS OF resolves through in-commit timestamps
    commits, _ = _journal_state(t + "_versions")
    ts1 = next(c["ts"] for c in commits if c["version"] == 1
               and c["op"] == "upsert")
    assert read_upsert_as_of_timestamp(spark, t, ts1).count() == 400


def test_pointer_cdf_and_vacuum(spark, tmp_path, monkeypatch):
    _no_links_pointer_mode(monkeypatch)
    t = _mk_flat(spark, tmp_path, keep_versions=2)
    upsert_delete_where(spark, t, 2, "k < 5", keep_versions=2,
                        max_retries=4, incremental_min_bytes=0)
    ch = read_upsert_changes(spark, t, 1, 2, ["k"])
    assert ch.filter("change_type = 'delete'").count() == 5
    # retention (keep_versions=2) + VACUUM: the published head and its
    # carry-pinned files survive; version 0 is gone
    removed = vacuum_upsert_target(t, older_than_seconds=0,
                                   keep_versions=2, force=True)
    assert isinstance(removed, list)
    assert read_upsert_version(spark, t).count() == 395
    with pytest.raises(FileNotFoundError):
        read_upsert_version(spark, t, 0)


def test_mode_interop_symlink_table_flips_to_pointer(spark, tmp_path,
                                                     monkeypatch):
    """A table born in symlink mode keeps working after the flag flips:
    the pointer publish drops the stale link so the resolver can never
    regress to an old snapshot through it."""
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    monkeypatch.setenv("SPARK_GRAFT_PUBLISH_MODE", "symlink")
    t = _mk_flat(spark, tmp_path)
    assert os.path.islink(t)
    monkeypatch.setenv("SPARK_GRAFT_PUBLISH_MODE", "pointer")
    upsert_delete_where(spark, t, 2, "k < 100", keep_versions=8,
                        max_retries=4, incremental_min_bytes=0)
    assert not os.path.lexists(t)  # stale link removed at publish
    assert read_upsert_version(spark, t).count() == 300
    assert read_upsert_version(spark, t, 1).count() == 400


def test_cas_backend_hook_is_the_one_commit_path(tmp_path, monkeypatch):
    """Every journal commit goes through fsutil.cas_put_if_absent —
    rebinding it swaps the backend (the If-None-Match PUT hook). A
    backend-reported conflict surfaces as a lost race, not an error."""
    calls = []
    real = fsutil.cas_put_if_absent

    def recording(path, data):
        calls.append(path)
        if len(calls) == 2:   # simulate a conditional-PUT 412 once
            return False
        return real(path, data)

    monkeypatch.setattr(fsutil, "cas_put_if_absent", recording)
    cd = str(tmp_path / "_commits")
    assert fsutil.try_commit(cd, 0, {"op": "upsert", "version": 0,
                                     "version_name": "v0"})
    assert not fsutil.try_commit(cd, 1, {"op": "upsert", "version": 1,
                                         "version_name": "v1"})
    assert fsutil.try_commit(cd, 1, {"op": "upsert", "version": 1,
                                     "version_name": "v1"})
    assert len(calls) == 3 and all("_commits" in p for p in calls)
    entries = fsutil.read_commit_journal(cd)
    assert [e["seq"] for e in entries] == [0, 1]
    # in-commit timestamps stay strictly monotonic through the backend
    assert entries[1]["ts"] > entries[0]["ts"]


def test_cas_single_shot_content(tmp_path):
    """The local backend is single-shot: a won CAS file is complete
    JSON the instant it exists (no claimed-but-empty window)."""
    cd = str(tmp_path / "_commits")
    os.makedirs(cd)
    assert fsutil.cas_put_if_absent(
        os.path.join(cd, "c0000000000.json"), b'{"seq": 0}')
    assert not fsutil.cas_put_if_absent(
        os.path.join(cd, "c0000000000.json"), b'{"seq": 9}')
    with open(os.path.join(cd, "c0000000000.json")) as f:
        assert json.load(f) == {"seq": 0}


def test_dangling_symlink_falls_back_to_journal(spark, tmp_path,
                                                monkeypatch):
    """A BROKEN published link (target pruned by an external cleanup or
    lost in a migration) must not win over the journal: the resolver
    falls through to the journal head and reads keep working."""
    monkeypatch.setenv("SPARK_GRAFT_CARRY_MODE", "manifest")
    t = _mk_flat(spark, tmp_path)
    assert os.path.islink(t)
    os.unlink(t)
    os.symlink(os.path.join(t + "_versions", "does_not_exist"), t)
    pub = resolve_published_snapshot(t)
    assert os.path.isdir(pub) and os.path.dirname(pub) == t + "_versions"
    assert read_upsert_version(spark, t).count() == 400
