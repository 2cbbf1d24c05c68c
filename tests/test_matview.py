"""Incremental materialized-view maintenance (streaming/matview.py):
the change-feed fold must equal a full recompute at every version —
bit-for-bit, through inserts, key updates that MOVE rows between
groups, NULL groups, NULL values, and group extinction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.streaming.ingest import \
    upsert_commit_batch
from house_price_etl_pipeline_spark.streaming.matview import (
    read_mv, refresh_mv)

COLS = ["uid", "seq", "grp", "v"]


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, seq long, grp string, v double")


def _recompute(spark, target):
    snap = spark.read.parquet(target)
    return {
        (r.grp,): (r.n_rows, r.sum_value)
        for r in snap.groupBy("grp")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("v").cast("decimal(25,6)")).cast("double")
             .alias("sum_value"))
        .collect()
    }


def _view_state(spark, view):
    return {(r.grp,): (r.n_rows, r.sum_value)
            for r in read_mv(spark, view).collect()}


def test_incremental_equals_recompute_across_batches(spark, tmp_path):
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")

    batches = [
        # v0: two groups, one NULL group, one NULL value
        [(1, 0, "A", 1.5), (2, 0, "A", 2.25), (3, 0, "B", 10.0),
         (4, 0, None, 7.0), (5, 0, "C", None)],
        # v1: uid 1 MOVES A→B (A loses a row, B gains), uid 6 inserts
        # into the NULL group, uid 5 gains a real value
        [(1, 1, "B", 4.0), (6, 0, None, 1.0), (5, 1, "C", 3.5)],
        # v2: group A goes EXTINCT (uid 2 moves to B); uid 4 value
        # becomes NULL (NULL group's sum must drop to 1.0 exactly)
        [(2, 1, "B", 2.25), (4, 1, None, None)],
    ]
    modes = []
    for i, rows in enumerate(batches):
        upsert_commit_batch(_frame(spark, rows), target, i,
                            key_cols=["uid"], order_col="seq",
                            keep_versions=4)
        modes.append(refresh_mv(spark, target, view, key_cols=["uid"],
                                group_cols=["grp"], sum_col="v"))
        assert _view_state(spark, view) == _recompute(spark, target), i
    assert modes == ["full", "incremental", "incremental"]
    final = _view_state(spark, view)
    assert ("A",) not in final                     # extinct group gone
    assert final[(None,)] == (2, 1.0)              # NULL group exact
    assert final[("B",)] == (3, 16.25)


def test_refresh_noop_at_head(spark, tmp_path):
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq")
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "noop"


def test_null_only_group_sum_stays_null(spark, tmp_path):
    """A group whose values are all NULL reports sum NULL (not 0.0) —
    and keeps doing so through the incremental path."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "X", None)]), target, 0,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    upsert_commit_batch(_frame(spark, [(2, 0, "X", None)]), target, 1,
                        key_cols=["uid"], order_col="seq")
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") \
        == "incremental"
    assert _view_state(spark, view) == {("X",): (2, None)}


def test_retired_state_reclaim_is_age_gated(spark, tmp_path):
    """The pointer swap retires the previous state dir WITHOUT deleting
    it (a reader's lazy scan may still hold it); only states older than
    STATE_GC_AGE_S are swept on a later refresh — the VACUUM retention
    contract applied to the view."""
    import time

    from house_price_etl_pipeline_spark.streaming.matview import \
        STATE_GC_AGE_S

    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    # hold a lazy reader on the CURRENT state before it is retired
    held = read_mv(spark, view)
    upsert_commit_batch(_frame(spark, [(2, 0, "A", 2.0)]), target, 1,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    states = [d for d in os.listdir(view) if d.startswith("state_")]
    assert len(states) == 2            # retired state survives the swap
    # the in-flight reader still scans its pinned (old) state cleanly
    assert {(r.grp, r.n_rows) for r in held.collect()} == {("A", 1)}
    assert _view_state(spark, view) == {("A",): (2, 3.0)}
    # age the retired state past the GC window; the next swap sweeps it
    old = time.time() - STATE_GC_AGE_S - 60
    from house_price_etl_pipeline_spark.streaming.matview import \
        _read_meta
    current = _read_meta(view)["state"]
    for d in states:
        if d != current:
            os.utime(os.path.join(view, d), (old, old))
    upsert_commit_batch(_frame(spark, [(3, 0, "B", 5.0)]), target, 2,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    remaining = [d for d in os.listdir(view) if d.startswith("state_")]
    assert len(remaining) == 2         # aged one GC'd, fresh one kept


def test_refresh_falls_back_to_full_when_base_version_pruned(
        spark, tmp_path):
    """A view refreshed less often than the table's retention window
    loses its change-feed base — refresh must rebuild from the head
    snapshot instead of failing forever."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=2)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    # three more versions at keep_versions=2: version 0 gets pruned
    for i in (1, 2, 3):
        upsert_commit_batch(
            _frame(spark, [(i + 1, 0, "B", float(i))]), target, i,
            key_cols=["uid"], order_col="seq", keep_versions=2)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    assert _view_state(spark, view) == _recompute(spark, target)


def test_refresh_rejects_mismatched_view_spec(spark, tmp_path):
    """Folding deltas aggregated on different columns into an existing
    state would silently corrupt it — refuse loudly."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    upsert_commit_batch(_frame(spark, [(2, 0, "A", 2.0)]), target, 1,
                        key_cols=["uid"], order_col="seq")
    with pytest.raises(ValueError, match="different columns"):
        refresh_mv(spark, target, view, ["uid"], ["uid"], "v")


def test_full_build_aggregates_pinned_head_not_symlink(spark, tmp_path):
    """The first build must aggregate the journal-head SNAPSHOT, not
    the published symlink: if publication lags (or races ahead), a
    symlink read would record a version over different data and the
    next incremental fold would double-count or skip changes."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    upsert_commit_batch(_frame(spark, [(2, 0, "A", 2.0)]), target, 1,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    # simulate a lagging publisher: re-point the symlink at version 0
    from house_price_etl_pipeline_spark.streaming.ingest import \
        _journal_state
    commits, _ = _journal_state(target + "_versions")
    v0_name = commits[0]["version_name"]
    os.remove(target)
    os.symlink(os.path.join(target + "_versions", v0_name), target)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    # the view reflects head (2 rows), not the stale symlink (1 row)
    assert _view_state(spark, view) == {("A",): (2, 3.0)}
    # and a subsequent commit folds exactly once
    upsert_commit_batch(_frame(spark, [(3, 0, "B", 9.0)]), target, 2,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") \
        == "incremental"
    assert _view_state(spark, view) == _recompute(spark, target)


def test_delete_where_folds_into_view(spark, tmp_path):
    """upsert_delete_where's change-feed delete rows fold as −1 legs:
    the view tracks row removal, group shrink, and delete-driven group
    extinction, staying bit-equal to a recompute."""
    from house_price_etl_pipeline_spark.streaming.ingest import \
        upsert_delete_where

    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    rows = [(1, 0, "A", 1.5), (2, 0, "A", 2.5), (3, 0, "B", 10.0),
            (4, 0, "B", None), (5, 0, "C", 7.0)]
    upsert_commit_batch(_frame(spark, rows), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    # delete one of two A rows, the NULL-value B row, and ALL of C
    assert upsert_delete_where(
        spark, target, 1, "uid IN (2, 4, 5)",
        keep_versions=4) == "applied"
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") \
        == "incremental"
    state = _view_state(spark, view)
    assert state == _recompute(spark, target)
    assert state[("A",)] == (1, 1.5)
    assert state[("B",)] == (1, 10.0)
    assert ("C",) not in state                 # extinct via delete


def test_refresh_noops_when_view_ahead_of_pinned_head(spark, tmp_path):
    """ADVICE r9: a maintainer whose table-journal read is staler than
    the view (a peer already refreshed past it) must NOT fold the feed
    with a reversed version pair — that applies inverse deltas and
    regresses the view. It no-ops and leaves the state untouched."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    upsert_commit_batch(_frame(spark, [(2, 0, "A", 2.0)]), target, 1,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    before = _view_state(spark, view)
    # simulate the stale journal read: drop the last table commit file
    # so head appears as 0 while the view is pinned at 1
    from house_price_etl_pipeline_spark.fsutil import commit_path
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _commits_dir, _journal_state)
    commits, _ = _journal_state(target + "_versions")
    os.remove(commit_path(_commits_dir(target + "_versions"),
                          commits[-1]["seq"]))
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "noop"
    assert _view_state(spark, view) == before


def test_crash_between_cas_and_publish_is_repaired(spark, tmp_path,
                                                   monkeypatch):
    """A maintainer that dies after winning the CAS but before the
    pointer swap leaves the journal ahead of the meta file; the next
    refresh repairs publication from the journal tail (the upsert
    table's replayed-batch idiom) instead of re-folding or diverging."""
    import house_price_etl_pipeline_spark.streaming.matview as mv

    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    upsert_commit_batch(_frame(spark, [(2, 0, "B", 5.0)]), target, 1,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=4)

    def crash(view_dir, entry):
        raise RuntimeError("simulated crash after CAS")

    monkeypatch.setattr(mv, "_publish_meta", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    monkeypatch.undo()
    # journal is at version 1, meta still at version 0
    from house_price_etl_pipeline_spark.fsutil import read_commit_journal
    tail = read_commit_journal(mv._mv_commits_dir(view))[-1]
    assert tail["version"] == 1
    assert mv._read_meta(view)["version"] == 0
    # next refresh repairs the pointer and recognizes head is reached
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "noop"
    assert mv._read_meta(view)["version"] == 1
    assert _view_state(spark, view) == _recompute(spark, target)


def test_concurrent_refreshes_one_winner_no_lost_updates(spark, tmp_path):
    """VERDICT r9 item 4: two maintainers refreshing the same view
    concurrently — the CAS journal serializes them (exactly one winner
    per slot), the loser retries/no-ops cleanly, and the final state is
    bit-equal to a recompute (zero lost updates, no double-folds)."""
    import threading

    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq",
                        keep_versions=8)
    assert refresh_mv(spark, target, view, ["uid"], ["grp"], "v") == "full"
    for i in range(1, 5):
        upsert_commit_batch(
            _frame(spark, [(i + 1, 0, "AB"[i % 2], float(i))]), target, i,
            key_cols=["uid"], order_col="seq", keep_versions=8)

    barrier = threading.Barrier(2)
    results, errors = [], []

    def maintain():
        try:
            barrier.wait()
            results.append(refresh_mv(spark, target, view, ["uid"],
                                      ["grp"], "v"))
        except Exception as exc:  # surfaced below — don't swallow
            errors.append(exc)

    threads = [threading.Thread(target=maintain) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # both completed; at least one really folded, any loser no-opped
    assert len(results) == 2 and "incremental" in results
    import house_price_etl_pipeline_spark.streaming.matview as mv
    from house_price_etl_pipeline_spark.fsutil import read_commit_journal
    journal = read_commit_journal(mv._mv_commits_dir(view))
    assert [c["seq"] for c in journal] == list(range(len(journal)))
    assert mv._read_meta(view)["version"] == 4
    assert _view_state(spark, view) == _recompute(spark, target)


def test_maintain_mv_from_feed_commit_driven(spark, tmp_path):
    """The CDF-driven maintainer refreshes exactly when commits land:
    first drain builds the view, a later drain after a new commit folds
    incrementally, a drain with nothing pending performs no refresh —
    and the view always equals the from-scratch recompute."""
    from house_price_etl_pipeline_spark.streaming.ingest import \
        upsert_commit_batch
    from house_price_etl_pipeline_spark.streaming.matview import (
        maintain_mv_from_feed, read_mv)

    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    b0 = spark.createDataFrame(
        [(1, 0, "a", 1.0), (2, 0, "b", 2.0), (3, 0, "a", 3.0)],
        "k long, ord long, g string, v double")
    upsert_commit_batch(b0, target, 0, key_cols=["k"], order_col="ord",
                        keep_versions=8)

    def run():
        return maintain_mv_from_feed(spark, target, view, ["k"], ["g"],
                                     "v", ckpt)

    assert run() == ["full"]

    def recompute():
        return {(r.g, r.n_rows, round(r.sum_value, 6)) for r in
                spark.read.parquet(target)
                .groupBy(F.col("g"))
                .agg(F.count("*").alias("n_rows"),
                     F.sum("v").alias("sum_value")).collect()}

    def view_rows():
        return {(r.g, r.n_rows, round(r.sum_value, 6)) for r in
                read_mv(spark, view).collect()}

    assert view_rows() == recompute()
    b1 = spark.createDataFrame([(2, 1, "b", 9.0), (4, 1, "c", 4.0)],
                               "k long, ord long, g string, v double")
    upsert_commit_batch(b1, target, 1, key_cols=["k"], order_col="ord",
                        keep_versions=8)
    assert run() == ["incremental"]
    assert view_rows() == recompute()
    assert run() == []              # nothing pending: no refresh at all
