"""Acquisition layer: download-completion handling + season-prefix
publication — the engine-portable form of the reference's crawler
(SURVEY §2.8 T3 / §2.7 K5, the last two non-ported inventory rows).

The reference (web_crawler/crawler.py) does four things after the
browser clicks: (1) poll the download dir until no ``.crdownload``
partial remains (crawler.py:44-50), (2) unzip each completed
``<season>.zip`` into a ``<season>/`` directory and delete the archive
(crawler.py:51-58), (3) sort the season directories by their last four
characters and ROTATE the season list by one before pairing
(crawler.py:75-80 — a quirk this port reproduces bit-for-bit, since the
filename convention downstream code consumes was produced under it),
and (4) publish only the ``*a.csv`` members renamed
``{season}_{filename}`` (crawler.py:82-87;
``g_lvr_land_a.csv → 101S4_g_lvr_land_a.csv``).

Everything network/browser-specific (selenium, the download clicks, the
GCS client) is out of engine scope; what IS engine-relevant — the
completion protocol, the unzip layout, the rename convention whose 7th
character the city dimension reads (functions/geo.py) and whose
``*a.csv`` suffix the streaming ingest filters on
(streaming/ingest.py:45) — is implemented and tested here, feeding the
same landing-directory contract ``stream_house_csv`` consumes.
"""

from __future__ import annotations

import os
import shutil
import zipfile

# browser/downloader partial-file markers (reference polls .crdownload;
# other stacks use .part/.tmp — same protocol)
PARTIAL_SUFFIXES = (".crdownload", ".part", ".tmp")


def extract_completed_downloads(download_dir: str) -> tuple[bool, list[str]]:
    """One poll step of the reference's completion loop
    (crawler.py:44-58): if any partial download remains, report
    not-ready; otherwise unzip every completed ``.zip`` into a directory
    named after it and delete the archive. Returns
    (all_complete, extracted_dir_names). Idempotent: an already-
    extracted season (dir exists, no zip) is left alone."""
    names = os.listdir(download_dir)
    if any(n.endswith(PARTIAL_SUFFIXES) for n in names):
        return False, []
    extracted = []
    for fname in sorted(names):
        if not fname.endswith(".zip") or fname == ".zip":
            # a zero-stem archive would make out_dir == download_dir and
            # the stale-dir rmtree below would destroy every pending
            # download (review r9)
            continue
        zpath = os.path.join(download_dir, fname)
        out_dir = os.path.join(download_dir, fname[:-4])
        tmp_dir = out_dir + "._extracting"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)  # half-extracted crash leftover
        os.makedirs(tmp_dir)
        with zipfile.ZipFile(zpath) as zf:
            zf.extractall(tmp_dir)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp_dir, out_dir)  # publish the dir atomically
        os.remove(zpath)  # reference deletes the archive (crawler.py:58)
        extracted.append(fname[:-4])
    return True, extracted


def wait_for_downloads(download_dir: str, poll_seconds: float = 2.0,
                       max_polls: int | None = None) -> list[str]:
    """The reference's blocking completion poll (crawler.py:44-50):
    sleep-and-rescan until NO partial download remains, then extract
    every completed archive in one pass — extraction is deliberately
    all-or-nothing per poll (matching the reference's behavior), NOT
    incremental while downloads are still in flight. ``max_polls``
    bounds the loop for tests / batch jobs (None = poll forever, the
    reference's behavior)."""
    import time

    extracted: list[str] = []
    polls = 0
    while True:
        done, new = extract_completed_downloads(download_dir)
        extracted.extend(new)
        if done:
            return extracted
        polls += 1
        if max_polls is not None and polls >= max_polls:
            raise TimeoutError(
                f"downloads still incomplete after {polls} polls")
        time.sleep(poll_seconds)


def publish_to_landing(download_dir: str, seasons: list[str],
                       landing_dir: str) -> list[str]:
    """Season-prefix publication (crawler.py:66-87): pair each extracted
    season directory (sorted by its LAST FOUR characters, crawler.py:78)
    with the season list ROTATED LEFT BY ONE (crawler.py:79-80 —
    reproduced verbatim; the reference's filename corpus was produced
    under this pairing), then copy only the ``*a.csv`` members into
    ``landing_dir`` as ``{season}_{filename}``. Returns the published
    file names. The landing dir is the directory
    ``streaming.ingest.stream_house_csv`` watches."""
    os.makedirs(landing_dir, exist_ok=True)
    # Guard the positional pairing: a stray dir (a crash-leftover
    # '*._extracting' never re-polled, hidden dirs, anything unrelated)
    # would shift every season/dir pairing or overrun rotated[i]. Skip
    # in-progress/hidden names outright and require exactly one
    # completed extraction per season before pairing — the rotation
    # quirk itself is preserved.
    season_dirs = sorted(
        (os.path.join(download_dir, n) for n in os.listdir(download_dir)
         if os.path.isdir(os.path.join(download_dir, n))
         and not n.endswith("._extracting") and not n.startswith(".")),
        key=lambda x: x[-4:])
    if len(season_dirs) != len(seasons):
        raise FileNotFoundError(
            f"expected {len(seasons)} extracted season dirs in "
            f"{download_dir}, found {len(season_dirs)}: "
            f"{[os.path.basename(d) for d in season_dirs]}")
    rotated = seasons[1:] + seasons[:1]
    published = []
    for i, d in enumerate(season_dirs):
        season = rotated[i]
        for fname in sorted(os.listdir(d)):
            if fname.endswith("a.csv"):
                out = f"{season}_{fname}"
                tmp = os.path.join(landing_dir, "." + out + ".tmp")
                shutil.copyfile(os.path.join(d, fname), tmp)
                os.replace(tmp, os.path.join(landing_dir, out))
                published.append(out)
    return published
