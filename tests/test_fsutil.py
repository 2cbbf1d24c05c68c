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
