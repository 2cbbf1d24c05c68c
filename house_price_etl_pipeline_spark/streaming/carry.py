"""Link-less snapshot carries — the object-store commit posture.

The versioned table format's incremental commits reuse every untouched
data file of the base snapshot in the new version. The local-filesystem
mechanism for that reuse is a hard link (``ingest._stage_with_reuse``),
which keeps every published snapshot readable with a plain
``spark.read.parquet``. Object stores have no links, no renames, and no
inodes — there, Delta/Iceberg express reuse as *manifest references*: a
commit's file list simply points at files written by earlier commits.

This module is that mode. With ``SPARK_GRAFT_CARRY_MODE=manifest`` a
staged snapshot carries untouched files as entries in a ``_CARRY.json``
manifest (relative name → ``<owner version dir>/<relative name>``,
owner-relative to the table's ``_versions`` root) instead of linking
bytes. Pointer chains are collapsed at stage time — a carry of a carry
records the ORIGINAL physical owner, so resolution is always one hop,
never a walk of table history (Delta's add-file lists have the same
property: every add names the physical file, not the commit that first
added it).

Reading is mode-independent: every snapshot read resolves the manifest
if one exists, so a table written in manifest mode stays readable after
the flag flips back, and vice versa. What manifest mode deliberately
trades away is the plain-``spark.read.parquet`` readability of a
version DIRECTORY — the read contract moves to the engine's snapshot
reader, exactly as with Delta (a Delta table's directory is not
plain-readable either; the log is the table).

Retention interacts with carries: a retired version directory may still
physically own files that RETAINED versions' manifests reference.
``prune_version_dir`` therefore deletes file-granularly — unreferenced
files go, pinned files stay until the last referencing retained version
itself retires (Delta VACUUM's reachability rule). Link mode never pins
anything (inodes survive unlinking), so its prune degenerates to the
old rmtree.

Reference parity note: ashleycheng/house-price-etl-pipeline (the
reference ETL) has no table format at all — this mirrors Delta Lake's
public add/remove-file semantics, not any reference code.
"""

from __future__ import annotations

import json
import os

CARRY_MANIFEST = "_CARRY.json"

# Tombstone for a RETIRED version dir that could only be pruned
# partially (some of its physical files are still pinned by retained
# versions' carry manifests). The dir is then a byte store, NOT a
# snapshot — time travel must refuse to resolve it, or a reader would
# get silently PARTIAL data (the unpinned files are gone).
PRUNED_MARKER = "_PRUNED.json"


def is_pruned_remnant(snapshot_dir: str) -> bool:
    return os.path.exists(os.path.join(snapshot_dir, PRUNED_MARKER))


def manifest_carry_enabled() -> bool:
    from ..config import carry_mode
    return carry_mode() == "manifest"


def versions_root_of(snapshot_dir: str) -> str:
    """The ``<target>_versions`` root a snapshot dir lives in. The
    published table path is a symlink into the root, so realpath's
    parent is the root for published and version-dir paths alike."""
    return os.path.dirname(os.path.realpath(snapshot_dir))


def read_carry(snapshot_dir: str) -> dict[str, str]:
    """The snapshot's carry manifest: relative data-file name →
    versions_root-relative physical location (``vdir/rel``). Empty for
    link-mode snapshots (no manifest file)."""
    p = os.path.join(snapshot_dir, CARRY_MANIFEST)
    try:
        with open(p) as f:
            return json.load(f)["files"]
    except (FileNotFoundError, NotADirectoryError):
        return {}


def snapshot_files(snapshot_dir: str) -> list[str]:
    """LOGICAL data-file list of a snapshot: physically present files
    plus manifest-carried ones — the list every diff, listing, and
    read must use (a carried file is as much part of the snapshot as a
    physical one). Names are snapshot-relative, ``part=value/…`` for
    partitioned tables; carried files keep their original names, so
    the change-feed's name-set diffs stay valid across modes."""
    from .partitioning import _walk_data_files

    phys = _walk_data_files(snapshot_dir)
    carry = read_carry(snapshot_dir)
    if not carry:
        return phys
    return sorted(set(phys) | set(carry))


def resolve_data_file(snapshot_dir: str, rel: str,
                      carry: dict[str, str] | None = None,
                      vroot: str | None = None) -> str:
    """Absolute physical path of one logical data file. Physical
    presence wins (rewritten files); otherwise the carry target.
    Raises FileNotFoundError for a dangling name — the same signal the
    hard-link path raises when a concurrent publish prunes the base
    mid-stage, so callers' lost-race retry classification holds."""
    p = os.path.join(snapshot_dir, rel)
    if os.path.exists(p):
        return p
    if carry is None:
        carry = read_carry(snapshot_dir)
    t = carry.get(rel)
    if t is not None:
        tp = os.path.join(vroot or versions_root_of(snapshot_dir), t)
        if os.path.exists(tp):
            return tp
    raise FileNotFoundError(
        f"data file {rel!r} of snapshot {snapshot_dir} is neither "
        f"physical nor resolvable through its carry manifest "
        f"(target {t!r})")


def resolve_data_files(snapshot_dir: str, rels) -> list[str]:
    carry = read_carry(snapshot_dir)
    vroot = versions_root_of(snapshot_dir) if carry else None
    return [resolve_data_file(snapshot_dir, r, carry, vroot)
            for r in rels]


def owner_groups(snapshot_dir: str, rels,
                 carry: dict[str, str] | None = None
                 ) -> dict[str, list[str]]:
    """Group logical file names by the directory that physically owns
    them: {absolute owner dir: [snapshot-relative names]}. Ownership
    is decided by MANIFEST MEMBERSHIP, not filesystem stats — a name
    is either a carry entry (owned elsewhere) or physical in this dir
    (rewritten files get fresh UUID names, so the two sets are
    disjoint by construction); the read hot path therefore costs zero
    per-file stat calls, which is what survives 10⁵-file snapshots on
    an object store. The group count is bounded by the retention
    window (a carry can only point at retained history), so the
    per-owner read fan-out stays a handful of scan branches at any
    table size."""
    if carry is None:
        carry = read_carry(snapshot_dir)
    vroot = versions_root_of(snapshot_dir)
    own = os.path.realpath(snapshot_dir)
    groups: dict[str, list[str]] = {}
    for rel in rels:
        t = carry.get(rel)
        if t is None:
            groups.setdefault(own, []).append(rel)
            continue
        owner, orel = t.split("/", 1)
        if orel != rel:
            raise ValueError(
                f"carry manifest of {snapshot_dir} renames {rel!r} to "
                f"{orel!r} — carried files must keep their names (the "
                f"change-feed diff contract)")
        groups.setdefault(os.path.join(vroot, owner), []).append(rel)
    return groups


def write_carry_manifest(stage_dir: str, base_dir: str,
                         kept_files) -> None:
    """Record ``kept_files`` (names relative to ``base_dir``) as carry
    entries of the staged snapshot. Chains collapse: a file the base
    itself carries is recorded under its ORIGINAL owner. Every target
    is stat-checked so a base pruned mid-stage surfaces as the same
    FileNotFoundError the link path would have raised — a dangling
    pointer must never reach a committed manifest."""
    from ..fsutil import atomic_write_json

    base_carry = read_carry(base_dir)
    vroot = versions_root_of(base_dir)
    base_name = os.path.basename(os.path.realpath(base_dir))
    files = {}
    for rel in kept_files:
        t = base_carry.get(rel)
        if t is None or os.path.exists(os.path.join(base_dir, rel)):
            t = f"{base_name}/{rel}"
        if not os.path.exists(os.path.join(vroot, t)):
            raise FileNotFoundError(
                f"carry target {t} vanished while staging (base "
                f"snapshot pruned by a concurrent publish)")
        files[rel] = t
    os.makedirs(stage_dir, exist_ok=True)
    atomic_write_json(os.path.join(stage_dir, CARRY_MANIFEST),
                      {"files": files})


def pinned_targets(versions_root: str, names) -> set[str]:
    """versions_root-relative physical paths that the given snapshot
    dirs' carry manifests reference — the files retention pruning and
    VACUUM must NOT delete even when their owning directory retires.
    One small JSON read per retained version; link-mode tables return
    an empty set and pruning stays the plain rmtree."""
    pinned: set[str] = set()
    for name in names:
        pinned.update(
            read_carry(os.path.join(versions_root, name)).values())
    return pinned


def prune_version_dir(versions_root: str, name: str,
                      pinned: set[str], dry_run: bool = False) -> bool:
    """Remove a retired version directory, file-granularly when any of
    its physical files are pinned by a retained version's carry
    manifest: unpinned data files, markers, and manifests go; pinned
    files (and their partition dirs) stay until the pinning version
    itself retires — a later prune pass then removes the remnant
    (journal entries are permanent, so every publish revisits retired
    names). Returns True when the directory is fully gone."""
    import shutil

    path = os.path.join(versions_root, name)
    if not os.path.isdir(path):
        return True
    if not any(p.startswith(name + "/") for p in pinned):
        if not dry_run:
            shutil.rmtree(path, ignore_errors=True)
        return True
    if dry_run:
        return False
    removed_all = True
    for root, dirs, files in os.walk(path, topdown=False):
        rel_root = os.path.relpath(root, path)
        for f in files:
            rel = f if rel_root == "." else os.path.join(rel_root, f)
            if f"{name}/{rel}" in pinned:
                removed_all = False
                continue
            try:
                os.remove(os.path.join(root, f))
            except OSError:
                removed_all = False
        try:
            os.rmdir(root)          # succeeds only when emptied
        except OSError:
            pass
    if not removed_all:
        # the remnant is a pinned-byte store, not a readable snapshot:
        # tombstone it so time travel refuses it loudly instead of
        # returning the partial file set as if it were the version
        from ..fsutil import atomic_write_json
        try:
            atomic_write_json(os.path.join(path, PRUNED_MARKER),
                              {"pruned": True})
        except (FileNotFoundError, NotADirectoryError):
            # a concurrent pruner (publish-time retention vs VACUUM)
            # finished the dir off between our walk and the tombstone
            # write — same terminal state, nothing to mark
            return True
    return removed_all
