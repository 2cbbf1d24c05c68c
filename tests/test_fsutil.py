"""fsutil: atomic publication primitives (crash-window behavior)."""

from __future__ import annotations

import json
import os

import pytest

from house_price_etl_pipeline_spark.fsutil import (
    atomic_symlink_swap, atomic_write_json)


def test_atomic_write_json_replaces_and_leaves_no_temp(tmp_path):
    p = str(tmp_path / "state.json")
    atomic_write_json(p, {"v": 1})
    atomic_write_json(p, {"v": 2})
    with open(p) as f:
        assert json.load(f) == {"v": 2}
    assert [n for n in os.listdir(tmp_path) if n.startswith(".tmp_")] == []


def test_atomic_write_json_failure_leaves_old_content(tmp_path):
    p = str(tmp_path / "state.json")
    atomic_write_json(p, {"v": 1})
    with pytest.raises(TypeError):
        atomic_write_json(p, {"v": object()})  # not JSON-serializable
    with open(p) as f:
        assert json.load(f) == {"v": 1}  # old state intact
    assert [n for n in os.listdir(tmp_path) if n.startswith(".tmp_")] == []


def test_atomic_symlink_swap_retargets(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "f").write_text("A")
    (b / "f").write_text("B")
    link = str(tmp_path / "current")
    atomic_symlink_swap(link, str(a))
    assert open(os.path.join(link, "f")).read() == "A"
    atomic_symlink_swap(link, str(b))
    assert open(os.path.join(link, "f")).read() == "B"
    assert os.path.islink(link)


def test_query_workspace_sweeps_dead_pid_dirs(tmp_path, monkeypatch):
    """query_workspace reclaims same-prefix dirs left by exited
    processes (per-PID naming leaks otherwise), keeps live-PID dirs
    and foreign names, and returns a stable per-(pid, sf_dir) path."""
    import os
    import tempfile

    from house_price_etl_pipeline_spark import fsutil

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    dead = tmp_path / "wsx_999999999_deadbeef"   # no such pid
    live = tmp_path / f"wsx_{os.getpid()}_aaaaaaaa"
    other = tmp_path / "unrelated_999999999_cafecafe"
    for d in (dead, live, other):
        d.mkdir()
    p1 = fsutil.query_workspace("wsx", str(tmp_path))
    assert not dead.exists()                 # dead pid reclaimed
    assert live.exists()                     # own pid kept
    assert other.exists()                    # foreign prefix untouched
    assert fsutil.query_workspace("wsx", str(tmp_path)) == p1


def test_try_commit_monotonic_in_commit_timestamps(tmp_path):
    """The commit clock is the IN-COMMIT ``ts`` stamped into each
    journal entry (Delta ICT), strictly monotonic across commits: a
    predecessor whose ts sits in the future (clock step between
    writers) forces a +1 ms bump, and a LEGACY predecessor without ts
    orders against its file mtime. File mtimes of ICT entries are not
    load-bearing."""
    import json
    import os
    import time

    from house_price_etl_pipeline_spark.fsutil import (commit_path,
                                                       commit_time_of,
                                                       try_commit)

    cdir = str(tmp_path / "c")
    assert try_commit(cdir, 0, {"op": "upsert", "version": 0})
    # rewrite seq 0 as if its writer's clock ran 30 s fast
    with open(commit_path(cdir, 0)) as f:
        e0 = json.load(f)
    future = time.time() + 30.0
    e0["ts"] = future
    with open(commit_path(cdir, 0), "w") as f:
        json.dump(e0, f)
    assert try_commit(cdir, 1, {"op": "upsert", "version": 1})
    with open(commit_path(cdir, 1)) as f:
        e1 = json.load(f)
    assert e1["ts"] > future
    # legacy predecessor (no ts): the next commit orders against its
    # file mtime instead
    cdir2 = str(tmp_path / "c2")
    assert try_commit(cdir2, 0, {"op": "upsert", "version": 0})
    with open(commit_path(cdir2, 0)) as f:
        legacy = json.load(f)
    legacy.pop("ts")
    with open(commit_path(cdir2, 0), "w") as f:
        json.dump(legacy, f)
    far = time.time() + 60.0
    os.utime(commit_path(cdir2, 0), (far, far))
    assert commit_time_of(cdir2, {"seq": 0}) == pytest.approx(far)
    assert try_commit(cdir2, 1, {"op": "upsert", "version": 1})
    with open(commit_path(cdir2, 1)) as f:
        e1 = json.load(f)
    assert e1["ts"] > far


def test_journal_checkpoint_roundtrip(tmp_path):
    """Checkpoints consolidate the entry list every INTERVAL commits;
    reads load checkpoint + tail and must equal the full parse; a
    corrupt checkpoint falls back silently (derived data)."""
    import json
    import os

    from house_price_etl_pipeline_spark.fsutil import (
        JOURNAL_CHECKPOINT_INTERVAL, maybe_checkpoint_journal,
        read_commit_journal, try_commit)

    cdir = str(tmp_path / "_commits")
    n = JOURNAL_CHECKPOINT_INTERVAL + 5
    for seq in range(n):
        assert try_commit(cdir, seq, {"op": "upsert", "version": seq,
                                      "version_name": f"v{seq}"})
    full = read_commit_journal(cdir)
    assert [c["seq"] for c in full] == list(range(n))
    assert maybe_checkpoint_journal(cdir, full) is True
    cks = [f for f in os.listdir(cdir) if f.startswith("_ckpt_")]
    assert len(cks) == 1
    # checkpointed read equals the full parse
    assert read_commit_journal(cdir) == full
    # below the interval: no new checkpoint
    assert maybe_checkpoint_journal(cdir, full) is False
    # tail commits after the checkpoint are appended by the read
    assert try_commit(cdir, n, {"op": "upsert", "version": n,
                                "version_name": f"v{n}"})
    got = read_commit_journal(cdir)
    assert got[:-1] == full and got[-1]["seq"] == n
    # corrupt checkpoint: silently ignored, full parse still right
    with open(os.path.join(cdir, cks[0]), "w") as f:
        f.write("{broken")
    assert [c["seq"] for c in read_commit_journal(cdir)] \
        == list(range(n + 1))


def test_journal_checkpoint_via_publish(tmp_path, spark):
    """The table-format publish path writes checkpoints as a
    ride-along: INTERVAL+ commits on a real table leave a checkpoint
    behind, and every reader (time travel, history, feeds) stays
    consistent with it."""
    import os

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.fsutil import (
        JOURNAL_CHECKPOINT_INTERVAL)
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _commits_dir, describe_upsert_history, read_upsert_version,
        upsert_commit_batch)

    t = str(tmp_path / "tbl")
    n = JOURNAL_CHECKPOINT_INTERVAL + 2
    for i in range(n):
        df = spark.createDataFrame([(i, i)], "k long, v long")
        upsert_commit_batch(df, t, i, key_cols=["k"], order_col="v",
                            keep_versions=4)
    cks = [f for f in os.listdir(_commits_dir(t + "_versions"))
           if f.startswith("_ckpt_")]
    assert cks, "publish path never wrote a checkpoint"
    assert read_upsert_version(spark, t).count() == n
    hist = describe_upsert_history(spark, t)
    assert hist.count() == n


def test_journal_checkpoints_under_writer_contention(tmp_path, spark,
                                                     monkeypatch):
    """Checkpoints are written from the publish path WHILE writers
    race: with the interval forced low, several checkpoints land
    mid-stress and every journal read through them must equal the
    full parse — derived data can lag but never lie."""
    import os
    import threading

    from pyspark.sql import functions as F

    import house_price_etl_pipeline_spark.fsutil as fsu
    from house_price_etl_pipeline_spark.streaming.ingest import (
        _commits_dir, read_upsert_version, upsert_commit_batch)

    monkeypatch.setattr(fsu, "JOURNAL_CHECKPOINT_INTERVAL", 3)
    t = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([(k, 0, 0) for k in range(6)],
                                "k long, ord long, v long")
    upsert_commit_batch(df0, t, 0, key_cols=["k"], order_col="ord",
                        keep_versions=2)
    errors = []

    def writer(tag, ids):
        try:
            for bid in ids:
                df = spark.createDataFrame(
                    [((bid + j) % 6, bid, bid) for j in range(2)],
                    "k long, ord long, v long")
                upsert_commit_batch(df, t, bid, key_cols=["k"],
                                    order_col="ord", keep_versions=2,
                                    writer=tag, max_retries=16)
        except Exception as exc:  # pragma: no cover
            errors.append((tag, exc))

    ts = [threading.Thread(target=writer, args=("a", [1, 3, 5, 7])),
          threading.Thread(target=writer, args=("b", [2, 4, 6, 8]))]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert errors == []
    cdir = _commits_dir(t + "_versions")
    cks = [f for f in os.listdir(cdir) if f.startswith("_ckpt_")]
    assert cks, "no checkpoint landed despite the forced interval"
    assert len(cks) <= 2                     # pruned to the newest two
    # checkpointed read == brute-force parse of every commit file
    import json as _json
    brute = []
    for n in sorted(f for f in os.listdir(cdir)
                    if f.startswith("c") and f.endswith(".json")):
        with open(os.path.join(cdir, n)) as fh:
            brute.append(_json.load(fh))
    assert fsu.read_commit_journal(cdir) == brute
    assert [c["seq"] for c in brute] == list(range(9))
    # final state equals serial keep-latest application
    model = {}
    for bid in range(9):
        for j in range(2 if bid else 6):
            k = (bid + j) % 6
            model[k] = bid
    got = {r.k: r.v for r in read_upsert_version(spark, t).collect()}
    assert got == model
