"""Engine-wide runtime knobs (env-driven, no code changes to deploy).

SPARK_GRAFT_EXACT_TWIN (default "1"): several approximate/sketch queries
(HLL distinct, approx percentiles, freqItems, MinHash/SimHash near-dup,
LSH/IVF ANN, streaming ingest dedup) follow the *exact-twin oracle*
pattern — the plan computes BOTH the production sketch path and its
exact ground truth, emits the DuckDB-reproducible exact rows plus an
in-plan quality boolean fed by the sketch path. That is the correctness
gate's shape, but the exact side is deliberately 100 TB-hostile (full
count-distinct expansion, uncapped inverted-index self-joins, brute-force
scoring). Setting SPARK_GRAFT_EXACT_TWIN=0 switches every such query to
its PRODUCTION plan: sketch/ANN/LSH output only, no exact sibling in the
plan — the mode a real deployment runs and the one `bench.py --production`
measures (BASELINE.md "production-mode bench").
"""

from __future__ import annotations

import os


def debug_checks_enabled() -> bool:
    """SPARK_GRAFT_DEBUG_CHECKS=1 re-enables invariant checks that
    production paths skip because the invariant holds by construction
    (e.g. the MERGE source-uniqueness pre-check under
    ``source_unique=True`` — ADVICE r14: an upstream dedup regression
    should fail loudly somewhere, and the test suite runs with this
    on)."""
    return os.environ.get("SPARK_GRAFT_DEBUG_CHECKS", "0") == "1"


def exact_twin_enabled() -> bool:
    """True (default) → twin-on: exact-ground-truth rows + in-plan quality
    boolean (the driver's value-hash gate). False → production plans."""
    return os.environ.get("SPARK_GRAFT_EXACT_TWIN", "1") != "0"


def incremental_commits_enabled() -> bool:
    """SPARK_GRAFT_INCREMENTAL_COMMITS (default "1"): upsert/DELETE/MERGE
    commits on the versioned table rewrite ONLY the data files that
    contain affected rows (computed per commit from ``_metadata.
    file_path``) and reuse every untouched file in the new snapshot via
    hard links — Delta's file-granular copy-on-write. "0" restores the
    full-snapshot rewrite per commit (the pre-round-10 behavior), useful
    for A/B and for filesystems without hard links where the copy
    fallback would negate the win."""
    return os.environ.get("SPARK_GRAFT_INCREMENTAL_COMMITS", "1") != "0"


def carry_mode() -> str:
    """SPARK_GRAFT_CARRY_MODE (default "link"): how incremental commits
    carry a base snapshot's untouched data files into the new version.
    "link" — hard links (copy fallback): every published version dir
    stays plain-``spark.read.parquet`` readable; the local-FS posture.
    "manifest" — a ``_CARRY.json`` pointer manifest per version
    (streaming/carry.py): zero link/copy syscalls per carried file, the
    object-store posture where reuse is a file-list reference, as in
    Delta/Iceberg; reads resolve through the engine's snapshot reader.
    Reading is always mode-independent — the flag governs writes only,
    so tables survive the flag flipping either way mid-history."""
    mode = os.environ.get("SPARK_GRAFT_CARRY_MODE", "link")
    if mode not in ("link", "manifest"):
        raise ValueError(
            f"SPARK_GRAFT_CARRY_MODE={mode!r} — expected 'link' or "
            f"'manifest'")
    return mode


def publish_mode() -> str:
    """SPARK_GRAFT_PUBLISH_MODE (default "symlink"): how a won commit is
    published as the table's readable head.
    "symlink" — atomically re-point a ``target_dir`` symlink at the head
    snapshot: the local-FS posture, where ``spark.read.parquet(target)``
    works without the engine.
    "pointer" — no symlink syscalls at all (object stores have none):
    publication writes the ``_LATEST.json`` pointer file (Delta's
    ``_last_checkpoint`` pattern) and engine reads resolve the commit
    journal's head — Delta's readers-resolve-the-log rule, so a stale
    or missing pointer can never regress a read.
    Reading is mode-independent (ingest.resolve_published_snapshot):
    the link is followed when present, the journal resolves otherwise —
    tables survive the flag flipping mid-history."""
    mode = os.environ.get("SPARK_GRAFT_PUBLISH_MODE", "symlink")
    if mode not in ("symlink", "pointer"):
        raise ValueError(
            f"SPARK_GRAFT_PUBLISH_MODE={mode!r} — expected 'symlink' "
            f"or 'pointer'")
    return mode


def cdf_split_bytes() -> int:
    """SPARK_GRAFT_CDF_SPLIT_BYTES (default 32 MiB): the change-feed
    stream reader sizes each version transition's partition count as
    ``ceil(changed_file_bytes / this)``, so one task never has to hold
    more than ~this much (compressed) changed data as Python objects —
    a full-rewrite commit on a big table fans out across workers
    instead of landing two whole snapshots in one Python heap
    (VERDICT r10 item 2). 32 MiB compressed ≈ a few hundred MB boxed,
    a comfortable per-worker bound; raise it to trade memory for fewer
    re-reads of the changed files (each split re-reads and filters)."""
    return int(os.environ.get("SPARK_GRAFT_CDF_SPLIT_BYTES",
                              str(32 * 1024 * 1024)))


def incremental_commit_min_bytes() -> int:
    """SPARK_GRAFT_INCREMENTAL_MIN_BYTES (default 64 MiB): snapshots
    smaller than this take the plain full rewrite even when incremental
    commits are enabled — the touched-file join costs a fixed extra
    Spark job per commit (~0.5 s locally), which beats rewriting a big
    table but LOSES to just rewriting a small one. The cost-based
    cutover a real engine makes; at the 100 TB target every snapshot
    clears it. Set to 0 to force the incremental plan regardless of
    size (tests and the oracled cow query do)."""
    return int(os.environ.get("SPARK_GRAFT_INCREMENTAL_MIN_BYTES",
                              str(64 * 1024 * 1024)))
