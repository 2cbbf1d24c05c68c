"""Streaming tests: the file-ingest pipeline (T1 replacement) end-to-end
with exactly-once re-run semantics, which the oracle queries can't cover."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from house_price_etl_pipeline_spark.streaming.ingest import run_ingest_available_now


@pytest.fixture()
def landing_dir(house_csv_fixture, tmp_path) -> str:
    """Private mutable copy of the fixture dir (simulates the GCS landing
    bucket the reference's Cloud Function watches)."""
    d = tmp_path / "landing"
    shutil.copytree(house_csv_fixture, d)
    return str(d)


def test_file_ingest_available_now_exactly_once(spark, landing_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    run_ingest_available_now(spark, landing_dir, out, ckpt)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 == 3  # building rows surviving the cleaning pipeline
    assert "unit_price_ping" in first.columns

    # re-run with the same checkpoint: no new files → nothing reprocessed
    run_ingest_available_now(spark, landing_dir, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # land a new file → only it is processed, rows appended (K3 semantics)
    shutil.copy(Path(landing_dir) / "101S4_g_lvr_land_a.csv",
                Path(landing_dir) / "102S1_e_lvr_land_a.csv")
    run_ingest_available_now(spark, landing_dir, out, ckpt)
    after = spark.read.parquet(out)
    assert after.count() == n1 + 2  # 2 building rows in the copied file
    assert after.filter("city = '高雄市'").count() == 2  # code 'e' from new name


def test_path_glob_filter_skips_non_matching_files(spark, landing_dir, tmp_path):
    """The *a.csv suffix predicate (reference cloud_function/main.py:8):
    a *_b.csv landing in the bucket must be invisible to the pipeline."""
    bogus = Path(landing_dir) / "101S4_g_lvr_land_b.csv"
    shutil.copy(Path(landing_dir) / "101S4_g_lvr_land_a.csv", bogus)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_ingest_available_now(spark, landing_dir, out, ckpt)
    assert spark.read.parquet(out).count() == 3  # unchanged by the b-file
