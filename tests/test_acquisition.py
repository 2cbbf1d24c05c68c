"""Acquisition-layer tests (reference web_crawler/crawler.py semantics):
download-completion polling, unzip layout, the season-rotation pairing
quirk, the {season}_{file} rename, and the full chain into the
streaming ingest pipeline."""

from __future__ import annotations

import os
import zipfile

import pytest

from house_price_etl_pipeline_spark.sources.acquisition import (
    extract_completed_downloads, publish_to_landing, wait_for_downloads)
from tests.conftest import HOUSE_HEADER_EN, HOUSE_HEADER_ZH

ROW_G = ("礁溪鄉,房地(土地+建物),大湖段572地號,100.5,82.64,0991231,"
         "1100718,5000000,60500")
ROW_A = ("大安區,房地(土地+建物),仁愛段100地號,120.0,165.29,1001010,"
         "1111111,30000000,181500")


def _make_zip(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, rows in members.items():
            zf.writestr(name, "﻿" + HOUSE_HEADER_ZH + "\n"
                        + HOUSE_HEADER_EN + "\n" + "\n".join(rows) + "\n")


def test_partial_download_blocks_then_extracts(tmp_path):
    dl = tmp_path / "downloads"
    dl.mkdir()
    _make_zip(dl / "101S4.zip", {"g_lvr_land_a.csv": [ROW_G],
                                 "g_lvr_land_b.csv": [ROW_G]})
    (dl / "102S1.zip.crdownload").write_bytes(b"partial")

    done, extracted = extract_completed_downloads(str(dl))
    assert done is False and extracted == []  # partial blocks the batch

    # download completes: partial marker becomes the real zip
    os.remove(dl / "102S1.zip.crdownload")
    _make_zip(dl / "102S1.zip", {"a_lvr_land_a.csv": [ROW_A]})
    extracted = wait_for_downloads(str(dl), poll_seconds=0.01, max_polls=3)
    assert sorted(extracted) == ["101S4", "102S1"]
    # reference layout: zip deleted, per-season dir with the members
    assert not (dl / "101S4.zip").exists()
    assert sorted(os.listdir(dl / "101S4")) == ["g_lvr_land_a.csv",
                                                "g_lvr_land_b.csv"]
    # idempotent re-poll: nothing new, nothing clobbered
    assert extract_completed_downloads(str(dl)) == (True, [])


def test_timeout_on_stuck_partial(tmp_path):
    dl = tmp_path / "stuck"
    dl.mkdir()
    (dl / "x.zip.crdownload").write_bytes(b"never finishes")
    with pytest.raises(TimeoutError):
        wait_for_downloads(str(dl), poll_seconds=0.01, max_polls=2)


def test_publish_rotation_and_rename(tmp_path):
    """The season list is rotated LEFT by one before pairing with the
    last-4-char-sorted dirs (crawler.py:75-80) and only *a.csv members
    publish, renamed {season}_{file} (crawler.py:82-87)."""
    dl = tmp_path / "dl"
    dl.mkdir()
    _make_zip(dl / "s1.zip", {"g_lvr_land_a.csv": [ROW_G],
                              "g_lvr_land_b.csv": [ROW_G]})
    _make_zip(dl / "s2.zip", {"a_lvr_land_a.csv": [ROW_A]})
    wait_for_downloads(str(dl), poll_seconds=0.01, max_polls=1)

    landing = tmp_path / "landing"
    published = publish_to_landing(str(dl), ["101S4", "102S1"], str(landing))
    # dirs sort s1 < s2 by last-4; rotation pairs s1->102S1, s2->101S4
    assert sorted(published) == ["101S4_a_lvr_land_a.csv",
                                 "102S1_g_lvr_land_a.csv"]
    assert sorted(os.listdir(landing)) == sorted(published)  # no b-files


def test_acquisition_chains_into_streaming_ingest(spark, tmp_path):
    """End-to-end: zip drop → completion poll → season publication →
    Structured-Streaming ingest → cleaned parquet; the published names
    carry the city code the pipeline's 7th-character read expects."""
    from house_price_etl_pipeline_spark.streaming.ingest import (
        run_ingest_available_now)

    dl = tmp_path / "dl"
    dl.mkdir()
    _make_zip(dl / "season.zip", {"g_lvr_land_a.csv": [ROW_G]})
    wait_for_downloads(str(dl), poll_seconds=0.01, max_polls=1)
    landing = tmp_path / "landing"
    publish_to_landing(str(dl), ["101S4"], str(landing))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_ingest_available_now(spark, str(landing), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0].city == "宜蘭縣"  # code 'g' at char 7 of 101S4_g_...


def test_publish_ignores_stray_dirs_and_asserts_count(tmp_path):
    """A crash-leftover '*._extracting' dir or hidden dir must not shift
    the positional season pairing; a genuine count mismatch raises
    instead of silently mis-pairing."""
    dl = tmp_path / "dl"
    dl.mkdir()
    _make_zip(dl / "s1.zip", {"g_lvr_land_a.csv": [ROW_G]})
    _make_zip(dl / "s2.zip", {"a_lvr_land_a.csv": [ROW_A]})
    wait_for_downloads(str(dl), poll_seconds=0.01, max_polls=1)
    # stray in-progress + hidden dirs that sort before/after the real ones
    (dl / "a000._extracting").mkdir()
    (dl / ".hidden").mkdir()

    landing = tmp_path / "landing"
    published = publish_to_landing(str(dl), ["101S4", "102S1"], str(landing))
    assert sorted(published) == ["101S4_a_lvr_land_a.csv",
                                 "102S1_g_lvr_land_a.csv"]

    # an unrelated completed dir breaks the 1:1 pairing -> explicit error
    (dl / "zzzz").mkdir()
    with pytest.raises(FileNotFoundError):
        publish_to_landing(str(dl), ["101S4", "102S1"],
                           str(tmp_path / "landing2"))
