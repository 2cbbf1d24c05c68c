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


def test_reader_sees_consistent_state_after_crashless_swap(spark, tmp_path):
    """The pointer swap leaves exactly one live state dir and read_mv
    resolves it (the previous state dir is reclaimed)."""
    target = str(tmp_path / "tbl")
    view = str(tmp_path / "mv")
    upsert_commit_batch(_frame(spark, [(1, 0, "A", 1.0)]), target, 0,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    upsert_commit_batch(_frame(spark, [(2, 0, "A", 2.0)]), target, 1,
                        key_cols=["uid"], order_col="seq")
    refresh_mv(spark, target, view, ["uid"], ["grp"], "v")
    states = [d for d in os.listdir(view) if d.startswith("state_")]
    assert len(states) == 1
    assert _view_state(spark, view) == {("A",): (2, 3.0)}
