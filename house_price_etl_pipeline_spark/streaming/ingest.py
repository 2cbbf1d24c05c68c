"""Structured-Streaming file ingest — the idiomatic replacement for the
reference's event-driven plumbing (SURVEY §2.8 T1/T2, §3.3).

The reference needs three components to process a newly-landed file: a
GCS Finalize trigger, a Cloud Function issuing a Dataflow REST launch
(`cloud_function/main.py:4-37`), and a templated pipeline with a runtime
ValueProvider (`etl_pipeline_beam_auto.py:13-30`). Spark's file source
subsumes all of it: directory listing discovers new files, the checkpoint
gives exactly-once per-file processing, ``pathGlobFilter`` is the suffix
filter (`cloud_function/main.py:8`), and ``Trigger.AvailableNow`` drains
everything pending then stops — re-run on a schedule or keep a continuous
query for true streaming.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.etl import clean_building_transactions
from ..plans.catalog import register as _catalog_register

# All-string schema matching the raw house CSV header (streaming sources
# require an explicit schema — no inference on a stream).
RAW_HOUSE_SCHEMA = T.StructType([
    T.StructField(name, T.StringType())
    for name in (
        "鄉鎮市區", "交易標的", "土地位置建物門牌", "土地移轉總面積平方公尺",
        "建物移轉總面積平方公尺", "建築完成年月", "交易年月日", "總價元",
        "單價元平方公尺",
    )
])


def stream_house_csv(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming scan of a landing directory of raw house CSVs.

    ``pathGlobFilter='*a.csv'`` replicates the Cloud Function's suffix
    predicate (reference cloud_function/main.py:8); the embedded English
    header row and BOM handling match sources/csv_house.py.
    """
    raw = (
        spark.readStream.schema(RAW_HOUSE_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "*a.csv")
        .csv(src_dir)
    )
    raw = raw.withColumn("檔名", F.input_file_name())
    # NULL-safe header drop, same rule as sources/csv_house.py
    return raw.filter((F.col("交易標的") != "transaction sign")
                      | F.col("交易標的").isNull())


def run_ingest_available_now(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all pending files through the building-transactions pipeline
    into an APPEND parquet sink (reference K3 semantics,
    etl_pipeline_beam_auto.py:174-181), then stop. The checkpoint makes
    re-runs incremental: already-seen files are never reprocessed —
    exactly-once without the reference's external trigger machinery."""
    cleaned = clean_building_transactions(stream_house_csv(spark, src_dir))
    q = (
        cleaned.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _commits_dir(versions_root: str) -> str:
    import os
    return os.path.join(versions_root, "_commits")


def _resolve_version_dir(versions_root: str, version: int) -> str | None:
    """Map a public version number (= upsert batch id) to its retained
    snapshot directory via the commit journal; legacy layouts without a
    journal fall back to the ``v{N}`` naming convention."""
    import os

    from ..fsutil import read_commit_journal

    from .carry import is_pruned_remnant

    commits = read_commit_journal(_commits_dir(versions_root))
    for c in reversed(commits):
        if c.get("version") == version:
            d = os.path.join(versions_root, c["version_name"])
            # a partially-pruned remnant (retired dir still holding
            # files pinned by retained carries) is NOT a snapshot —
            # resolving it would time-travel into partial data
            return d if (os.path.isdir(d)
                         and not is_pruned_remnant(d)) else None
    legacy = os.path.join(versions_root, f"v{version}")
    return legacy if (os.path.isdir(legacy)
                      and not is_pruned_remnant(legacy)) else None


def resolve_published_snapshot(target_dir: str) -> str:
    """THE head resolver: the path of the table's published snapshot.

    Symlink publish mode leaves a ``target_dir`` link — follow it (one
    readlink, the local fast path, and what plain
    ``spark.read.parquet(target)`` users rely on). Pointer mode (or a
    link lost to an object-store migration) resolves the COMMIT
    JOURNAL's head instead — Delta's readers-resolve-the-log rule, so
    publication lag or a stale pointer can never regress a read; the
    journal read is O(tail) through its checkpoints. The
    ``_LATEST.json`` pointer file written at publish (Delta's
    ``_last_checkpoint`` pattern — on an object store it turns the
    journal LIST into one GET) is only the last resort here, for
    journal-less layouts.

    Returns ``target_dir`` unchanged when nothing resolves, preserving
    legacy flat-directory reads and downstream FileNotFound behavior."""
    import os

    # a BROKEN link (target pruned/migrated away) must not win over
    # the journal — isdir() follows the link, so it is False for a
    # dangling one and resolution falls through to the journal head
    if os.path.isdir(target_dir):
        return os.path.realpath(target_dir)
    versions_root = target_dir + "_versions"
    # journal_head, not a full journal read: resolution needs only the
    # newest entry, and the head read is O(1) files at any history
    # depth (the checkpointed full read is O(history) — r14 probe,
    # SCALE.md §head-resolution)
    from ..fsutil import journal_head

    from .carry import is_pruned_remnant
    head = journal_head(_commits_dir(versions_root))
    if head is not None:
        # the head entry carries its own version_name: no journal scan
        # (the version->name mapping _resolve_version_dir does is for
        # TIME-TRAVEL reads, where the number is all the caller has)
        d = os.path.join(versions_root, head["version_name"])
        if os.path.isdir(d) and not is_pruned_remnant(d):
            return d
    try:
        with open(os.path.join(versions_root, "_LATEST.json")) as f:
            name = json.load(f)["version_name"]
        cand = os.path.join(versions_root, name)
        if os.path.isdir(cand):
            return cand
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    return target_dir


def read_upsert_version(spark, target_dir: str,
                        version: int | None = None) -> DataFrame:
    """Time-travel read of a versioned upsert target (the mini table
    format ``stream_upsert_foreach_batch`` maintains): ``version=None``
    reads the published snapshot through the target symlink;
    ``version=N`` reads the journaled snapshot for version N if still
    retained (see ``keep_versions``). The commit journal lists every
    applied version; retained version dirs are the readable subset —
    exactly the Delta/Iceberg time-travel contract scaled down to plain
    parquet + a commit log."""
    import os

    if version is None:
        return _snapshot_read(spark, target_dir,
                              resolve_published_snapshot(target_dir))
    versions_root = target_dir + "_versions"
    vdir = _resolve_version_dir(versions_root, version)
    if vdir is None:
        from ..fsutil import read_commit_journal
        with open(os.path.join(versions_root, "_POINTER.json")) as f:
            ptr = json.load(f)
        retained = sorted(
            c["version"]
            for c in read_commit_journal(_commits_dir(versions_root))
            if _resolve_version_dir(versions_root, c["version"]) is not None)
        raise FileNotFoundError(
            f"version {version} not retained (applied={ptr['applied']}, "
            f"retained={retained}); raise keep_versions to retain more")
    return _snapshot_read(spark, target_dir, vdir)


def _commit_mtimes(versions_root: str) -> list[tuple[dict, float]]:
    """(entry, commit time) for every journal entry, in sequence
    order — THE clock behind TIMESTAMP AS OF, startingTimestamp
    resolution, and DESCRIBE HISTORY. Commit time is the IN-COMMIT
    timestamp stamped into the entry at publish (Delta ICT: it
    travels with the journal, surviving mtime-destroying copies and
    object-store migrations, and needs zero stat calls); entries
    written before ICT fall back to their commit file's mtime, the
    historical Delta convention."""
    from ..fsutil import commit_time_of, read_commit_journal

    cdir = _commits_dir(versions_root)
    out = []
    for c in read_commit_journal(cdir):
        ts = commit_time_of(cdir, c)
        if ts is None:
            continue   # pruned/in-flight legacy entry: no clock
        out.append((c, ts))
    return out


def read_upsert_as_of_timestamp(spark, target_dir: str, ts) -> DataFrame:
    """Delta's ``TIMESTAMP AS OF`` time travel: read the snapshot of
    the LAST versioning commit at or before ``ts``. ``ts`` is an epoch
    number, a ``datetime``, or an ISO-8601 string (naive values are
    local time, Delta/SQL session semantics). Raises ValueError if
    ``ts`` precedes the first commit (Delta's "timestamp before
    earliest version" error) and FileNotFoundError if the resolved
    version has been pruned past retention — raise ``keep_versions``
    to widen the travel window, the same contract as VERSION AS OF."""
    import datetime as dt

    if isinstance(ts, str):
        ts = dt.datetime.fromisoformat(ts)
    if isinstance(ts, dt.datetime):
        ts = ts.timestamp()
    versions_root = target_dir + "_versions"
    cand = [c for c, mt in _commit_mtimes(versions_root)
            if c.get("op") in _VERSIONING_OPS and mt <= ts]
    if not cand:
        first = next((mt for c, mt in _commit_mtimes(versions_root)
                      if c.get("op") in _VERSIONING_OPS), None)
        raise ValueError(
            f"timestamp {ts} precedes the table's earliest commit"
            + (f" ({dt.datetime.fromtimestamp(first).isoformat()})"
               if first is not None else " (empty table)"))
    return read_upsert_version(spark, target_dir, cand[-1]["version"])


def stream_upsert_foreach_batch(stream_df, spark, target_dir: str,
                                checkpoint_dir: str, key_cols: list[str],
                                order_col: str, keep_versions: int = 2):
    """Streaming keep-latest-per-key upsert sink via foreachBatch (CDC
    compaction — SURVEY K3's append sink upgraded to upsert semantics,
    which no built-in file sink offers), on the same versioned-snapshot +
    atomic-pointer-flip mechanism as ``streaming.foreach.upsert_batch``:

    - each micro-batch is first reduced to its per-key winners (a
      batch-sized window, cheap), then merged with the current snapshot —
      keep-latest is a monoid, so the merge is ONE hash shuffle over
      snapshot ∪ delta, and the snapshot is bounded by KEY cardinality,
      not stream length (the former implementation's full
      read-union-overwrite per batch was O(total data) with a non-atomic
      rmtree+rename swap — VERDICT r3 item 2);
    - the merged snapshot is written as a NEW ``v{batch_id}`` directory
      under ``<target>_versions`` and published by atomically re-pointing
      a ``target_dir`` symlink at it (fsutil.atomic_symlink_swap), so
      ``spark.read.parquet(target_dir)`` always sees one complete
      snapshot — a crash mid-write never corrupts the readable table;
    - replays are exactly-once: applied batch ids are journaled in an
      atomically-written pointer file AFTER the flip; a re-delivered
      batch id is a no-op, and the crash window between flip and journal
      is closed by detecting that the current snapshot already is
      ``v{batch_id}``.

    Multi-writer safety (VERDICT r4 item 2): the commit itself is an
    optimistic CAS on a sequence-numbered journal (``_commits/``,
    fsutil.try_commit — Delta's rename-without-overwrite protocol). A
    writer snapshots the journal head, merges against that base, stages
    the result, and only publishes if it wins the O_EXCL create of the
    next journal slot; a lost race discards the stale merge and retries
    against the new base, so two racing committers serialize and the
    final state equals serial application.

    At cluster scale the same contract comes from a transactional table
    format (Delta/Iceberg MERGE) or partition-overwrite-dynamic keyed on
    the batch's touched partitions; this is the plain-parquet analog."""

    def merge_batch(batch_df, batch_id: int) -> None:
        upsert_commit_batch(batch_df, target_dir, batch_id,
                            key_cols=key_cols, order_col=order_col,
                            keep_versions=keep_versions)

    return (stream_df.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


# journal ops that introduce a NEW table version (OPTIMIZE rewrites an
# existing version in place and shares its number, so it is excluded
# from exactly-once replay detection and the applied-versions pointer)
_VERSIONING_OPS = ("upsert", "delete", "update", "merge", "overwrite")


def _min_bytes_cutoff(override: int | None) -> int:
    """Per-call incremental-commit size cutover: an explicit argument
    (tests, the oracled COW query) wins over the env-driven config
    default — threading it as a parameter keeps catalog queries from
    mutating process-global os.environ (VERDICT r10 item 5), which is
    racy the moment two queries share a process."""
    from ..config import incremental_commit_min_bytes
    return override if override is not None \
        else incremental_commit_min_bytes()


def _journal_state(versions_root: str) -> tuple[list[dict], set[int]]:
    from ..fsutil import read_commit_journal
    commits = read_commit_journal(_commits_dir(versions_root))
    applied = {c["version"] for c in commits
               if c.get("op") in _VERSIONING_OPS}
    return commits, applied


def _retained_names(commits: list[dict], keep_versions: int) -> set[str]:
    """Version names belonging to the last ``keep_versions`` DISTINCT
    versions. Retention counts VERSIONS, not journal commits: an
    OPTIMIZE entry shares its version number with the upsert snapshot
    it rewrote, so counting raw commits would silently shrink the
    time-travel window every time maintenance ran (keep_versions=2
    plus one OPTIMIZE would retain a single distinct version) — the
    Delta contract is that maintenance never costs you history."""
    keep = max(keep_versions, 1)
    names: set[str] = set()
    versions: list = []
    for c in reversed(commits):
        if c["version"] not in versions:
            if len(versions) == keep:
                break
            versions.append(c["version"])
        names.add(c["version_name"])
    return names


# Converge-loop bound for _publish_commit: each extra round requires
# ANOTHER writer to have committed during ours, so this many rounds of
# republishing means pathological sustained contention (or a livelock
# bug) — surface it as an error instead of spinning silently (ADVICE
# r8). Progress is WARN-logged every 50 rounds so a long converge is
# observable before the bound trips.
PUBLISH_CONVERGE_MAX_ROUNDS = 512


def _publish_commit(target_dir: str, versions_root: str,
                    commits: list[dict], keep_versions: int,
                    _pre_swap_hook=None) -> None:
    """Derived state after a won CAS (or repair after a crash between
    commit and publication): point the symlink at the journal head,
    refresh the compat pointer file, prune snapshots beyond retention
    plus any staging/orphan dirs no retained commit references.

    Publication itself races (stale-publish regression): a writer that
    won seq N can be preempted between its post-CAS journal re-read and
    its symlink swap while the seq N+1 writer publishes first — the
    stale swap would then REGRESS the readable table to the older
    snapshot, and with no further commits it would stay regressed
    forever. So publication is a converge loop: publish the head we
    know, re-read the journal, and republish if it moved. The last
    publisher to finish always leaves the symlink on the newest
    journaled head — any commit landing after our final check has its
    own live writer responsible for publishing it. (Delta sidesteps
    this class entirely because its readers resolve the log, not a
    pointer; the loop is the pointer-file analog of that property.)
    ``_pre_swap_hook`` is a test seam invoked once per loop iteration
    before the swap so a conflicting publisher can be interleaved
    deterministically."""
    import logging
    import os
    import shutil

    from ..fsutil import (atomic_symlink_swap, atomic_write_json,
                          read_commit_journal)

    log = logging.getLogger(__name__)
    max_rounds = PUBLISH_CONVERGE_MAX_ROUNDS
    for _round in range(max_rounds):
        head = commits[-1]
        if _round and _round % 50 == 0:
            log.warning("upsert publish still converging after %d "
                        "rounds (head seq %s) — sustained concurrent "
                        "commit traffic on %s",
                        _round, head["seq"], target_dir)
        if _pre_swap_hook is not None:
            _pre_swap_hook(head)
        from ..config import publish_mode
        if publish_mode() == "symlink":
            atomic_symlink_swap(
                target_dir,
                os.path.join(versions_root, head["version_name"]))
        else:
            # pointer publication: zero symlink syscalls (object stores
            # have none) — the _LATEST pointer below and the journal
            # itself ARE the publication. Drop any stale link left by
            # an earlier symlink-mode publish so the head resolver
            # can't regress to it after the mode flip.
            if os.path.islink(target_dir):
                try:
                    os.unlink(target_dir)
                except OSError:
                    pass
        applied = sorted(c["version"] for c in commits
                         if c.get("op") in _VERSIONING_OPS)
        # the pointer file (Delta's _last_checkpoint pattern): written
        # in BOTH modes — derived data, one GET instead of a journal
        # LIST for object-store readers; the journal stays authoritative
        atomic_write_json(os.path.join(versions_root, "_LATEST.json"),
                          {"version": head["version"],
                           "version_name": head["version_name"],
                           "seq": head["seq"], "ts": head.get("ts")})
        atomic_write_json(os.path.join(versions_root, "_POINTER.json"),
                          {"version": head["version"], "applied": applied})
        # Prune ONLY snapshots referenced by commits now outside the
        # retention window — provably retired. Unreferenced dirs are NOT
        # touched here: one may be a concurrent writer's staged snapshot
        # that is about to win the next CAS; reclaiming those is VACUUM's
        # job, behind an age threshold (vacuum_upsert_target). The
        # window counts distinct VERSIONS, not commits (_retained_names)
        # so OPTIMIZE runs never shrink time travel.
        retained = _retained_names(commits, keep_versions)
        # a retired dir may still physically own files that RETAINED
        # versions' carry manifests reference (manifest carry mode) —
        # prune file-granularly, never a pinned byte (carry.py);
        # link-mode tables pin nothing and this stays the old rmtree
        from .carry import pinned_targets, prune_version_dir
        pinned = pinned_targets(versions_root, retained)
        for c in commits:
            if c["version_name"] not in retained:
                prune_version_dir(versions_root, c["version_name"],
                                  pinned)
        latest = read_commit_journal(_commits_dir(versions_root))
        if not latest or latest[-1]["seq"] == head["seq"]:
            # journal checkpoint ride-along (Delta's log checkpoints):
            # the publisher already holds the full entry list, so
            # consolidating it every N commits costs one JSON write
            # and keeps every journal READ O(tail) instead of
            # O(history) — derived data, crash-safe, last-writer-wins
            from ..fsutil import maybe_checkpoint_journal
            maybe_checkpoint_journal(_commits_dir(versions_root),
                                     latest or commits)
            return
        commits = latest  # journal moved: our swap may have regressed
        #                   over a newer publish — republish and recheck
    raise RuntimeError(
        f"upsert publish on {target_dir} failed to converge after "
        f"{max_rounds} rounds — journal advanced every round "
        f"(pathological sustained commit traffic or a livelock bug)")


# --- file-granular copy-on-write (round 10) --------------------------------
#
# A commit that touches 1 GB of keys in a 100 TB table must not rewrite
# 100 TB. Delta solves this with add/remove file actions: the MERGE plan
# first computes the TOUCHED file set (an inner join of the source keys
# against the table scan's _metadata.file_path), rewrites only those
# files, and carries every other file into the new version by reference.
# This format's versions are materialized directories rather than log
# manifests (so a published snapshot stays readable with a plain
# ``spark.read.parquet``), which makes "carry by reference" a hard link:
# the new version dir links the untouched files' inodes instead of
# copying bytes. Retention pruning and VACUUM keep working unchanged —
# rmtree unlinks names, and a shared inode lives until its last
# referencing version is pruned. On an object store the same plan ships
# as manifest references instead of links; the hard link is the local-FS
# analog, and the part that matters at scale — staging cost proportional
# to the CHANGED data, not the table — is in the plan shape, not the
# link.

def _snapshot_data_files(snapshot_dir: str) -> list[str]:
    """Relative paths of a snapshot's LOGICAL data files — physically
    present files plus manifest-carried ones (carry.snapshot_files);
    basenames for flat snapshots, ``part=value/…`` paths for
    partitioned ones. Carried files keep their original names, so
    name-set diffs (the change feed, read_upsert_changes) are valid
    across carry modes."""
    from .carry import snapshot_files
    return snapshot_files(snapshot_dir)


def _file_paths_to_relpaths(rows, base_dir: str) -> set[str]:
    """``_metadata.file_path`` values are URIs (``file:///…``); map
    them to paths RELATIVE to the snapshot dir for comparison against
    ``_snapshot_data_files`` — relative (not basename) so a partitioned
    snapshot's ``part=value/part-….parquet`` names compare correctly.
    Spark reports the path as given to the reader, but tolerate a
    canonicalized (symlink-resolved) form too. A manifest-carried
    file's scan path lives in ANOTHER version dir under the same
    ``_versions`` root — its owner-relative path IS its logical name
    (carries never rename), so strip the root plus one dir segment. A
    path under none of these falls back to its basename (the flat
    pre-partitioning behavior)."""
    import os
    from urllib.parse import unquote, urlparse

    bases = {os.path.abspath(base_dir), os.path.realpath(base_dir)}
    vroot = os.path.dirname(os.path.realpath(base_dir))
    out = set()
    for r in rows:
        p = unquote(urlparse(r[0]).path)
        for b in bases:
            pre = b.rstrip(os.sep) + os.sep
            if p.startswith(pre):
                out.add(p[len(pre):])
                break
        else:
            vpre = vroot.rstrip(os.sep) + os.sep
            rest = p[len(vpre):] if p.startswith(vpre) else ""
            if os.sep in rest:
                out.add(rest.split(os.sep, 1)[1])
            else:
                out.add(os.path.basename(p))
    return out


# Physical parquet schema per committed snapshot dir, keyed by
# (applicationId, snap_dir). Snapshot dirs are IMMUTABLE once committed
# (staged under a fresh uuid name, CAS-published, never rewritten in
# place), and every file within a snapshot shares one schema (evolution
# forces a full rewrite) — so the first read's inferred schema is the
# dir's schema forever. Passing it explicitly on repeat reads skips
# Spark's driver-side footer-read inference, which measures ~65 ms per
# ``spark.read.parquet`` call (78 ms inferred vs 13 ms with schema) —
# a steady CDC/MV/maintenance query performs 6-12 snapshot reads, so
# this is a plan-construction cost, not data. Schema is METADATA (the
# same thing Delta's snapshot state caches), never query results.
_FLAT_SCHEMA_CACHE: "OrderedDict[tuple[str, str], object]" = \
    __import__("collections").OrderedDict()
# Bounded LRU (VERDICT r14 item 4): snapshot dirs are created per
# COMMIT, so in a long-lived session the key space is unbounded — cap
# the cache at the working set a steady query needs (a handful of live
# versions per table) times a generous table count. Eviction only costs
# one ~65 ms re-inference on a dir that has since left the working set.
_FLAT_SCHEMA_CACHE_CAP = 512


def _flat_parquet_read(spark, snap_dir: str, paths: list[str]):
    """Flat-table scan of ``paths`` (full dir or file subset) with the
    snapshot's cached physical schema when this session has read the
    dir before; first read infers and populates the cache."""
    key = (spark.sparkContext.applicationId, snap_dir)
    schema = _FLAT_SCHEMA_CACHE.get(key)
    if schema is not None:
        _FLAT_SCHEMA_CACHE.move_to_end(key)
        return spark.read.schema(schema).parquet(*paths)
    df = spark.read.parquet(*paths)
    _FLAT_SCHEMA_CACHE[key] = df.schema
    if len(_FLAT_SCHEMA_CACHE) > _FLAT_SCHEMA_CACHE_CAP:
        _FLAT_SCHEMA_CACHE.popitem(last=False)
    return df


def _snapshot_read(spark, target_dir: str, snap_dir: str,
                   files: list[str] | None = None,
                   file_col: str | None = None):
    """THE snapshot read path: plain ``spark.read.parquet`` for flat
    tables; for partitioned tables an explicit-schema read that types
    the partition columns from the table's declaration instead of
    Spark's per-scan inference (partitioning.read_snapshot), with
    ``basePath`` anchoring so changed-file-subset reads keep their
    partition columns. ``files`` are relative to ``snap_dir``.
    ``file_col`` names a column to fill with ``_metadata.file_path`` —
    it must be attached INSIDE each scan (``_metadata`` is a per-scan
    pseudo-column that does not exist above the union a manifest-
    carried snapshot's read builds), so callers that need the
    touched-file constant request it here instead of withColumn-ing
    on the result."""
    import os

    from .colmap import table_column_mapping, to_logical
    from .partitioning import (check_table_readable, read_snapshot,
                               table_partitioning)

    # protocol gate: refuse features this build can't interpret rather
    # than silently misreading (Delta's reader-version contract)
    check_table_readable(target_dir)
    parts = table_partitioning(target_dir)
    from .carry import owner_groups, read_carry, snapshot_files
    carry = read_carry(snap_dir)
    if carry:
        # manifest-carried snapshot: the version dir is a file LIST,
        # not a directory of bytes — group the logical files by the
        # dir that physically owns them and union the per-owner scans
        # (Spark's partition discovery needs one basePath per scan;
        # owner count is bounded by the retention window, so this is
        # a handful of branches at any table size, each with its own
        # pushdown/pruning)
        rels = files if files is not None else snapshot_files(snap_dir)
        from functools import reduce

        from pyspark.sql import functions as F

        groups = owner_groups(snap_dir, rels, carry)
        if not parts:
            # FLAT table: no basePath anchoring needed, so every owner
            # group collapses into ONE multi-path scan — the read
            # fan-out at deep retention (r12 VERDICT item 4 probe: 26
            # owner dirs -> 16x read wall as a union) simply does not
            # apply; one scan keeps whole-stage codegen, pushdown and
            # _metadata.file_path intact at any owner count
            paths = [os.path.join(owner, f)
                     for owner, g in sorted(groups.items()) for f in g]
            df = _flat_parquet_read(spark, snap_dir, paths)
            if file_col is not None:
                df = df.withColumn(file_col,
                                   F.col("_metadata.file_path"))
            return to_logical(df, table_column_mapping(target_dir))
        dfs = [read_snapshot(spark, owner, parts, g)
               for owner, g in sorted(groups.items())]
        if file_col is not None:
            dfs = [b.withColumn(file_col, F.col("_metadata.file_path"))
                   for b in dfs]
        df = reduce(lambda a, b: a.unionByName(b), dfs)
    else:
        if parts:
            df = read_snapshot(spark, snap_dir, parts, files)
        elif files is not None:
            df = _flat_parquet_read(
                spark, snap_dir,
                [os.path.join(snap_dir, f) for f in files])
        else:
            df = _flat_parquet_read(spark, snap_dir, [snap_dir])
        if file_col is not None:
            from pyspark.sql import functions as F
            df = df.withColumn(file_col, F.col("_metadata.file_path"))
    # column mapping: physical file names → the table's logical schema
    # (renames applied, dropped columns hidden) — no-op without mapping
    return to_logical(df, table_column_mapping(target_dir))


def _stage_partition_bytes() -> int:
    """Compressed input bytes each staging shuffle partition should
    carry. 32 MiB of zstd parquet unpacks to roughly the 100 MB-1 GB
    row band guide §2.2 wants per reduce partition; override for a
    cluster via SPARK_GRAFT_STAGE_PARTITION_BYTES."""
    import os
    return int(os.environ.get("SPARK_GRAFT_STAGE_PARTITION_BYTES",
                              str(32 << 20)))


def _stage_width(spark, input_bytes: int) -> int:
    """Shuffle width for a staging computation whose input size is
    KNOWN (touched-file bytes, base snapshot bytes): a copy-on-write
    commit that rewrites 2 MB must not fan its merge shuffle out to
    the session's compute width — 32 reduce tasks plus 32 task commits
    for one tiny output file is pure per-task overhead (guide §1.2/§6;
    the r14 'delta-scaled staging width' prototype). Scale-adaptive by
    construction: width grows with the delta, capped at the session's
    configured width so a big rewrite keeps full parallelism."""
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(cap, -(-int(input_bytes)
                             // max(_stage_partition_bytes(), 1))))


# Staging writes mutate session-global SQL confs around the write
# action (coalescing mode + delta-scaled width). The lock keeps two
# CONCURRENT staged writes in one session from restoring each other's
# overrides mid-flight (VERDICT r14 item 7); a concurrent COMPUTE query
# planned inside the window still sees the staging settings — perf-only
# (size-first coalescing / narrower shuffle), never correctness.
_STAGE_CONF_LOCK = __import__("threading").RLock()


@__import__("contextlib").contextmanager
def _staging_conf(spark, input_bytes_hint: int | None):
    """The staging-write conf window, shared by every snapshot/state
    writer: size-first AQE coalescing (64 MB+ output files, guide §6)
    plus the delta-scaled shuffle width when the input size is known."""
    with _STAGE_CONF_LOCK:
        prev = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "true")
        prev_width = spark.conf.get("spark.sql.shuffle.partitions", None)
        try:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
            if input_bytes_hint is not None:
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(_stage_width(spark, input_bytes_hint)))
            yield
        finally:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst",
                prev)
            if input_bytes_hint is not None and prev_width is not None:
                spark.conf.set("spark.sql.shuffle.partitions",
                               prev_width)


def _staged_write(df, target_dir: str, stage_path: str,
                  max_records_per_file: int | None = None,
                  input_bytes_hint: int | None = None) -> None:
    """Staged snapshot write honoring the table's PARTITIONED BY spec
    (Hive layout via ``partitionBy``) and its column mapping (logical →
    physical names, so renames never change the on-disk schema and
    hard-link carries stay valid); the one write path every full
    rewrite shares. ``input_bytes_hint`` — the staging computation's
    known input size (compressed bytes) — scales the shuffle width to
    the delta instead of the session's compute width (_stage_width)."""
    from .colmap import table_column_mapping, to_physical
    from .partitioning import table_partitioning

    df = to_physical(df, table_column_mapping(target_dir))
    parts = table_partitioning(target_dir)
    if parts:
        missing = [c for c in parts if c not in df.columns]
        if missing:
            raise ValueError(
                f"staged write is missing partition column(s) "
                f"{missing} — every batch for a PARTITIONED BY table "
                f"must supply them")
        types = dict(df.dtypes)
        bad = {c: types[c] for c, t in parts.items() if types[c] != t}
        if bad:
            raise ValueError(
                f"partition column type mismatch vs the PARTITIONED BY "
                f"declaration {parts}: got {bad} — cast the batch "
                f"before writing (partition types are table metadata, "
                f"never per-batch)")
        # genuine-sentinel string values -> surrogate, so on disk only
        # real NULLs carry __HIVE_DEFAULT_PARTITION__ (decoded back by
        # read_snapshot / partition_values_of)
        from .partitioning import encode_partition_sentinels
        df = encode_partition_sentinels(df, parts)
    w = df.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if parts:
        w = w.partitionBy(*parts)
    # staged writes coalesce to ADVISORY-SIZED partitions, not to core
    # count: for a write job "more parallelism" means more small output
    # files + more task overhead, while advisory sizing yields the
    # 64 MB+ parquet files guide §6 wants at any scale. Scoped to the
    # write action (set/restore): the global default stays
    # parallelism-first for compute stages, where an A/B showed the
    # opposite trade (clean_winsorize +0.53 s under size-first vs
    # commit paths −0.3 s).
    spark = df.sparkSession
    with _staging_conf(spark, input_bytes_hint):
        w.parquet(stage_path)
    if parts:
        from .partitioning import write_empty_marker_if_needed
        # a DELETE/drop that empties a PARTITIONED table writes ZERO
        # part files (partitionBy creates files per live partition
        # value), which would leave the snapshot schemaless; the
        # marker preserves the physical schema so the typed read
        # returns an empty, correctly-typed frame
        write_empty_marker_if_needed(stage_path, df, parts)


# Touched-file partition pruning collects the delta's distinct
# partition tuples driver-side; above this many it skips pruning (the
# filter expression would dwarf the listing saved).
PARTITION_PRUNE_CAP = 1024


def _touched_files_by_keys(spark, base_dir: str, keys_df,
                           key_cols: list[str],
                           target_dir: str | None = None,
                           part_tuples: list[dict] | None = None
                           ) -> set[str]:
    """Relative paths of the base snapshot's data files holding at
    least one row whose key appears in ``keys_df`` — Delta's
    touched-file join. The scan reads ONLY the key columns (parquet
    column pruning) plus the free ``_metadata.file_path`` constant; the
    join is null-safe so a NULL-keyed delta row claims the file holding
    the NULL-keyed base row (the window in keep_latest groups NULLs as
    a real key, and the join must agree or the carried twin would
    duplicate the key). The collect is bounded by the touched-file
    count — the same driver-side file list every Delta MERGE
    materializes.

    When the table is partitioned AND the partition columns are a
    subset of the merge key, the scan first prunes to the DELTA'S OWN
    partitions (a matching base row must share the delta row's key,
    hence its partition values) — directory-level pruning, so a delta
    touching 3 of 10⁴ partitions lists and scans 3. Partition columns
    outside the key get no pruning: a key's old row may then live in a
    different partition than its replacement, and the join must see
    the whole table to find it."""
    from pyspark.sql import functions as F

    from .partitioning import (partition_tuple_filter, table_partitioning)

    snap = (_snapshot_read(spark, target_dir or base_dir, base_dir,
                           file_col="_file")
            .select(*key_cols, "_file")
            .alias("t"))
    parts = table_partitioning(target_dir) if target_dir else {}
    if parts and set(parts) <= set(key_cols):
        tuples = part_tuples if part_tuples is not None else [
            r.asDict() for r in
            keys_df.select(*parts).dropDuplicates()
            .limit(PARTITION_PRUNE_CAP + 1).collect()]
        if len(tuples) <= PARTITION_PRUNE_CAP:
            snap = snap.filter(partition_tuple_filter(parts, tuples))
    keys = keys_df.select(*key_cols).dropDuplicates().alias("d")
    cond = None
    for k in key_cols:
        term = F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = term if cond is None else (cond & term)
    rows = (snap.join(keys, cond, "leftsemi")
            .select("_file").distinct().collect())
    return _file_paths_to_relpaths(rows, base_dir)


def _stage_with_reuse(snapshot_dir: str, stage_dir: str,
                      kept_files: list[str], rewritten_df,
                      target_dir: str | None = None) -> None:
    """Materialize a staged snapshot as ``rewritten_df``'s output plus
    the base snapshot's untouched data files, carried either as hard
    links (copy fallback — the local-FS default) or, under
    SPARK_GRAFT_CARRY_MODE=manifest, as ``_CARRY.json`` pointer
    entries with zero per-file syscalls (carry.py — the object-store
    posture). The Spark write runs FIRST (mode=overwrite clears the
    dir), carries after. ``kept_files`` are snapshot-relative paths —
    for a partitioned table they carry their ``part=value/``
    directories, recreated in the stage (link mode) so the carried
    files land in the same Hive layout."""
    import os
    import shutil

    from .carry import (manifest_carry_enabled, read_carry,
                        resolve_data_file, versions_root_of,
                        write_carry_manifest)

    if rewritten_df is not None:
        # the rewrite's input is the TOUCHED subset of the base (plus a
        # delta of comparable size): size the staging shuffle to it —
        # a tiny copy-on-write commit gets a 1-2 task write, a big one
        # keeps the session width (_stage_width)
        kept = set(kept_files)
        base_carry0 = read_carry(snapshot_dir)
        vroot0 = versions_root_of(snapshot_dir) if base_carry0 else None
        touched_bytes = 0
        for f in _snapshot_data_files(snapshot_dir):
            if f in kept:
                continue
            try:
                touched_bytes += os.path.getsize(
                    resolve_data_file(snapshot_dir, f, base_carry0,
                                      vroot0))
            except OSError:
                continue    # pruned mid-walk: sizing is best-effort
        _staged_write(rewritten_df, target_dir or snapshot_dir,
                      stage_dir, input_bytes_hint=2 * touched_bytes)
    else:
        os.makedirs(stage_dir, exist_ok=True)
        if not kept_files:
            # carrying NOTHING from an already-empty partitioned base
            # (e.g. a second DELETE on an emptied table): keep the
            # schema marker alive or the snapshot becomes unreadable
            from .partitioning import _EMPTY_MARKER
            src_marker = os.path.join(snapshot_dir, _EMPTY_MARKER)
            if os.path.exists(src_marker):
                shutil.copy2(src_marker,
                             os.path.join(stage_dir, _EMPTY_MARKER))
    if kept_files and manifest_carry_enabled():
        # link-less carry: record pointers, move no bytes, touch no
        # inodes — collisions are impossible (nothing lands in the
        # stage), dangling bases raise FileNotFoundError inside (the
        # callers' lost-race retry signal). Gate the table FIRST: a
        # build without carry support would silently read only the
        # physical subset of a carried snapshot
        if target_dir is not None:
            from .partitioning import register_table_feature
            register_table_feature(target_dir, "carry_manifest")
        write_carry_manifest(stage_dir, snapshot_dir, kept_files)
    else:
        base_carry = read_carry(snapshot_dir)
        vroot = versions_root_of(snapshot_dir) if base_carry else None
        for name in kept_files:
            # resolve through the base's own carry manifest so a
            # link-mode commit on a manifest-carried base materializes
            # the real bytes, not a missing path
            try:
                src = resolve_data_file(snapshot_dir, name, base_carry,
                                        vroot)
            except FileNotFoundError:
                src = os.path.join(snapshot_dir, name)  # classic ENOENT
            dst = os.path.join(stage_dir, name)
            if os.path.dirname(name):        # partition subdirectory
                os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):          # freak part-name collision
                root, ext = os.path.splitext(name)
                dst = os.path.join(stage_dir, f"{root}-linked{ext}")
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
    if target_dir is not None:
        # keep data skipping alive across incremental commits: carry
        # kept files' manifest entries, footer-read only the rewritten
        # files — O(changed data), Delta's per-commit add.stats cost.
        # No-op when the base never had a manifest.
        from .partitioning import table_partitioning
        from .skipping import carry_stats_manifest
        carry_stats_manifest(snapshot_dir, stage_dir, kept_files,
                             parts=table_partitioning(target_dir))


def _schemas_match(a, b) -> bool:
    """Incremental reuse requires the delta to neither add, drop, nor
    retype columns vs the snapshot — linked files can't be evolved in
    place, and a mixed-schema dir would break the plain-parquet read
    contract. Name order and nullability don't matter."""
    return ({(f.name, f.dataType) for f in a.fields}
            == {(f.name, f.dataType) for f in b.fields})


def _touched_partition_claim(target_dir: str,
                             touched) -> list[str] | None:
    """Partition-dir scope claim from a touched-file set, recorded in
    the journal entry for the disjoint-writer classifier
    (_rebase_disjoint_stage). Valid ONLY when the op's rewritten rows
    cannot leave the touched partitions — true for DELETE (rows only
    vanish) and for UPDATE whose SET targets no partition column; the
    callers enforce that. None for flat tables, oversized claims, and
    any touched name WITHOUT a partition dir (the relpath mapper's
    basename fallback for paths outside the expected roots — an
    under-claimed scope would let a real conflict rebase, so decline
    instead). An EMPTY claim is valid: the op touched nothing."""
    import os

    from .partitioning import table_partitioning
    if not table_partitioning(target_dir):
        return None
    dirs = {os.path.dirname(f) for f in touched}
    if "" in dirs or len(dirs) > PARTITION_PRUNE_CAP:
        return None
    return sorted(dirs)


def _delta_partition_scope(df, target_dir: str, key_cols: list[str]):
    """(partition tuples, partition dirs) of a delta/source frame —
    the one delta-sized distinct+collect that feeds BOTH the
    touched-file scan's pruning filter and the journal entry's
    ``touched_partitions`` claim (upsert and MERGE writers share it).
    (None, None) when the table is flat, the partition columns aren't
    a key subset, or the delta spans more than PARTITION_PRUNE_CAP
    partitions (unrecorded scope = conflicting, the safe default)."""
    from .partitioning import partition_dir_of, table_partitioning

    parts = table_partitioning(target_dir)
    if not parts or not set(parts) <= set(key_cols):
        return None, None
    tuples = [r.asDict() for r in
              df.select(*parts).dropDuplicates()
              .limit(PARTITION_PRUNE_CAP + 1).collect()]
    if len(tuples) > PARTITION_PRUNE_CAP:
        return None, None
    pdirs = sorted({partition_dir_of({c: t[c] for c in parts})
                    for t in tuples})
    return tuples, pdirs


def _rebase_disjoint_stage(target_dir: str, versions_root: str,
                           stage_name: str, old_kept: list[str],
                           touched: set[str], delta_pdirs: list[str],
                           base_seq: int, batch_id: int, writer: str,
                           keep_versions: int, files_rewritten: int,
                           max_rounds: int = 8) -> str | None:
    """Disjoint-writer lost-race fast path (VERDICT r11 item 5): a
    loser whose commit scope is PARTITION-disjoint from every commit
    that beat it re-links its already-staged output onto the new head
    instead of re-running the merge — pure filesystem work, zero Spark
    jobs.

    Safe iff every journal entry past our base (a) is a versioning
    commit that (b) recorded ``touched_partitions`` (only the
    incremental upsert path writes the field, so its presence also
    certifies an unchanged schema) and (c) is disjoint from ours:
    partition columns ⊆ merge key means key sets are then disjoint
    too, so serial application commutes and rebased-state ≡ re-merged
    state. Any other entry (full rewrite, OPTIMIZE, DELETE/UPDATE/
    MERGE/drop — none record the field) returns None and the caller
    pays the full re-stage, as before. Identity tables never get here
    (allocation ranges could collide).

    The rebase: move OUR rewritten files out of the dead stage, carry
    the new head's files minus our touched set (same link/manifest
    mechanism as any stage — stats manifests carry along), CAS at the
    new sequence; a further lost race re-checks and re-rebases against
    the newer head, bounded by ``max_rounds``. Returns the journal
    status string on success, None when the caller must re-stage."""
    import os
    import shutil
    import uuid

    from ..fsutil import cas_backoff, try_commit
    from .partitioning import _walk_data_files

    cur_name, cur_kept = stage_name, list(old_kept)
    try:
        for _round in range(max_rounds):
            if _round:
                cas_backoff(_round)
            commits, applied = _journal_state(versions_root)
            if batch_id in applied:        # someone replayed our batch
                return None
            newer = [c for c in commits if c["seq"] > base_seq]
            ours = set(delta_pdirs)
            for c in newer:
                # scope claims: touched_partitions (upsert/merge/
                # delete/update/overwrite incremental paths, and
                # incremental OPTIMIZE — content-identical packing
                # confined to its partitions) or dropped_partitions
                # (the metadata drop — exact by construction); absence
                # means unclassifiable
                tp = c.get("touched_partitions")
                if tp is None:
                    tp = c.get("dropped_partitions")
                claimable = (c.get("op") in _VERSIONING_OPS
                             or c.get("op") == "optimize")
                if not claimable or tp is None or ours & set(tp):
                    return None            # logical conflict: re-stage
            head = commits[-1]
            new_base = os.path.join(versions_root, head["version_name"])
            try:
                new_kept = [f for f in _snapshot_data_files(new_base)
                            if f not in touched]
                fresh = os.path.join(
                    versions_root,
                    f"_stage_{writer}_{uuid.uuid4().hex[:8]}")
                os.makedirs(fresh)
                cur_dir = os.path.join(versions_root, cur_name)
                kept_set = set(cur_kept)
                for f in _walk_data_files(cur_dir):
                    if f in kept_set:
                        continue           # stale carry of the old base
                    dst = os.path.join(fresh, f)
                    if os.path.dirname(f):
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(os.path.join(cur_dir, f), dst)
                _stage_with_reuse(new_base, fresh, new_kept, None,
                                  target_dir=target_dir)
            except FileNotFoundError:
                # new head pruned under us mid-carry. Our rewritten
                # files were already MOVED into `fresh`, so another
                # rebase round would find an empty stage and commit a
                # data-losing snapshot — bail to the caller's full
                # re-stage (it re-runs the merge from the batch).
                shutil.rmtree(fresh, ignore_errors=True)
                return None
            shutil.rmtree(os.path.join(versions_root, cur_name),
                          ignore_errors=True)
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(fresh, os.path.join(versions_root, perm))
            cur_name, cur_kept = perm, new_kept
            entry = {"op": "upsert", "version": batch_id,
                     "version_name": perm, "writer": writer,
                     "files_rewritten": files_rewritten,
                     "files_reused": len(new_kept),
                     "touched_partitions": sorted(delta_pdirs),
                     "rebased": True}
            if try_commit(_commits_dir(versions_root), head["seq"] + 1,
                          entry):
                commits, _ = _journal_state(versions_root)
                _publish_commit(target_dir, versions_root, commits,
                                keep_versions)
                return "applied-after-retry"
        return None
    finally:
        if cur_name != stage_name:
            # we renamed the stage; on fallback the caller's rmtree of
            # the ORIGINAL name would miss it — only reached when this
            # helper returns None after at least one rebase round
            commits, applied = _journal_state(versions_root)
            if not any(c.get("version_name") == cur_name
                       for c in commits):
                shutil.rmtree(os.path.join(versions_root, cur_name),
                              ignore_errors=True)


def upsert_commit_batch(batch_df, target_dir: str, batch_id: int,
                        key_cols: list[str], order_col: str,
                        keep_versions: int = 2, writer: str = "w0",
                        max_retries: int = 24,
                        incremental_min_bytes: int | None = None,
                        _race_hook=None, _pre_stage_hook=None,
                        _pre_swap_hook=None) -> str:
    """One keep-latest merge committed through the optimistic journal.
    Returns "applied", "replayed" (exactly-once no-op), or
    "applied-after-retry" (lost at least one CAS race).

    Order semantics: per key the row with the greatest ``order_col``
    survives; on an exact ORDER TIE between a stored row and an
    incoming one, the INCOMING row wins (deterministic — see
    keep_latest_merge). Ties WITHIN one batch remain caller's
    responsibility (supply a unique order, e.g. an event sequence).

    When the batch's schema matches the snapshot's, the stage is
    file-granular copy-on-write: a key semi-join against the snapshot
    scan's ``_metadata.file_path`` finds the files holding keys the
    batch touches, only those are re-merged and rewritten, and every
    other file carries into the new version by hard link — commit cost
    proportional to the CHANGED data, not the table (see the module
    block comment above _snapshot_data_files). Schema-evolving batches
    take the full mergeSchema rewrite. ``_race_hook``
    is a test seam invoked between base-read and CAS attempt so a
    conflicting writer can be interleaved deterministically;
    ``_pre_stage_hook`` fires just before the staging write (the window
    where concurrent commits can retire and prune our base snapshot
    under the running merge scan); ``_pre_swap_hook`` threads into
    ``_publish_commit`` (the stale-publish regression window)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..config import (incremental_commit_min_bytes,
                          incremental_commits_enabled)
    from ..fsutil import cas_backoff, try_commit
    from .index import _input_vanished

    versions_root = target_dir + "_versions"
    os.makedirs(versions_root, exist_ok=True)
    spark = batch_df.sparkSession

    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    defaults = table_column_defaults(target_dir)
    if defaults:
        # DEFAULT before generated: a generated expression may
        # reference a defaulted input
        batch_df = _apply_defaults(batch_df, defaults,
                                   _current_table_types(spark, target_dir))
    gens = table_generated_columns(target_dir)
    if gens:
        # generated columns first (a CHECK may reference one): omitted
        # columns computed, supplied ones validated
        batch_df = _apply_generated(batch_df, gens, "the incoming batch")
    ident = table_identity_column(target_dir)
    if ident and ident["name"] in batch_df.columns:
        raise ValueError(
            f"column {ident['name']!r} is GENERATED ALWAYS AS IDENTITY "
            f"— it cannot be supplied by a batch (Delta's contract); "
            f"drop it from the batch and let allocation assign it")
    cons = table_check_constraints(target_dir)
    if cons:
        # CHECK enforcement on the INCOMING rows (one delta-sized pass,
        # never the table) — before any staging work is spent
        _validate_constraints(batch_df, cons, "the incoming batch")

    def keep_latest(df):
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))

    def keep_latest_merge(existing, incoming):
        """Cross-commit keep-latest with DETERMINISTIC order ties: the
        incoming row wins when its order_col EQUALS the stored row's
        (SQL upsert intuition); strictly newer stored rows still
        survive late replays. Without the tie column, row_number over
        a tied window picks arbitrarily — the same merge could produce
        different tables on different runs, which silently weakens the
        rebase-equivalence and change-feed determinism contracts
        (found by the model-based DML fuzzer, round 14)."""
        u = (existing.withColumn("__kl_src", F.lit(0)).unionByName(
            incoming.withColumn("__kl_src", F.lit(1)),
            allowMissingColumns=True))
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col("__kl_src").desc())
        return (u.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn", "__kl_src"))

    # Commit-scope classification for the disjoint-writer fast path:
    # the batch's distinct partition tuples are BOTH the touched-file
    # scan's pruning filter and the journal entry's
    # ``touched_partitions`` claim other writers classify conflicts
    # against. One delta-sized collect, computed LAZILY on first use —
    # full-rewrite commits (incremental off / tiny base / schema
    # evolution) never need it and must not pay the extra job.
    _scope_cache: list = []

    def _scope():
        if not _scope_cache:
            _scope_cache.append(
                _delta_partition_scope(batch_df, target_dir, key_cols))
        return _scope_cache[0]

    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if batch_id in applied:
            # replayed batch: exactly-once no-op — but repair the
            # published view if a crash landed between CAS and publish
            if commits:
                _publish_commit(target_dir, versions_root, commits,
                                keep_versions)
            return "replayed"
        base = commits[-1]["version_name"] if commits else None
        seq = commits[-1]["seq"] + 1 if commits else 0

        if _pre_stage_hook is not None:
            _pre_stage_hook(_attempt, base)
        # stage under a unique name BEFORE the CAS: the journal must
        # only ever reference fully-written data (Delta's ordering)
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        reuse_stats = None
        ident_hwm = None
        ident_carried: list[str] = []   # hard-linked files the hwm scan skips
        try:
            delta = keep_latest(batch_df)
            if ident:
                # allocation is CAS-serialized for free: the range base
                # comes off the journal head we are about to CAS against
                ident_hwm = _identity_high_water(commits, ident)
            # the schema gate compares the delta AS IT WILL BE STAGED —
            # with the identity column it doesn't have yet (assignment
            # happens inside the branches so existing keys can inherit
            # their ids from the rows the branch reads anyway)
            delta_schema = (delta.withColumn(
                ident["name"], F.lit(None).cast("bigint")).schema
                if ident else delta.schema)
            base_dir = (os.path.join(versions_root, base)
                        if base is not None else None)
            snapshot = (_snapshot_read(spark, target_dir, base_dir)
                        if base is not None else None)
            if (snapshot is not None
                    and incremental_commits_enabled()
                    and _data_file_bytes(base_dir)
                    >= _min_bytes_cutoff(incremental_min_bytes)
                    and _schemas_match(snapshot.schema, delta_schema)):
                # file-granular copy-on-write: rewrite only the files
                # holding keys the delta touches; hard-link the rest
                touched = _touched_files_by_keys(
                    spark, base_dir, delta, key_cols, target_dir,
                    part_tuples=_scope()[0])
                kept = [f for f in _snapshot_data_files(base_dir)
                        if f not in touched]
                if touched:
                    sub = _snapshot_read(spark, target_dir, base_dir,
                                         files=sorted(touched))
                    if ident:
                        # touched files hold every key the delta can
                        # match — inheritance stays change-sized
                        delta = _inherit_or_assign_identity(
                            delta, sub, ident, ident_hwm, key_cols)
                    merged = keep_latest_merge(sub, delta)
                else:
                    if ident:
                        delta = _assign_identity(delta, ident,
                                                 ident_hwm)
                    merged = delta
                _stage_with_reuse(base_dir,
                                  os.path.join(versions_root, stage),
                                  kept, merged, target_dir=target_dir)
                reuse_stats = (len(touched), len(kept))
                ident_carried = kept
            else:
                if snapshot is not None:
                    if ident:
                        delta = _inherit_or_assign_identity(
                            delta, snapshot, ident, ident_hwm,
                            key_cols)
                    # schema evolution (VERDICT r5 item 3): a batch may
                    # ADD columns vs the current snapshot (or arrive
                    # without columns the snapshot has) — union to the
                    # merged schema with nulls, Delta mergeSchema
                    # semantics, not an error. Evolution forces a full
                    # rewrite: linked files can't change schema.
                    merged = keep_latest_merge(snapshot, delta)
                else:
                    if ident:
                        delta = _assign_identity(delta, ident,
                                                 ident_hwm)
                    merged = delta
                # full rewrite over a known base: size the staging
                # shuffle to its bytes (first commits have no base and
                # an unknown batch size — keep the session width)
                _staged_write(merged, target_dir,
                              os.path.join(versions_root, stage),
                              input_bytes_hint=(
                                  2 * _data_file_bytes(base_dir)
                                  if snapshot is not None else None))
        except Exception as exc:
            # The merge scans the base snapshot lazily; if concurrent
            # writers advance the journal by keep_versions commits while
            # we stage, their publish prunes our base UNDER the running
            # scan (FAILED_READ_FILE). That is a lost CAS race observed
            # one step early — journal moved past our base means discard
            # and retry against the new head; journal UNMOVED means a
            # real error (corrupt input) and propagates.
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            base_seq = commits[-1]["seq"] if commits else -1
            # vanished-base signature: a Spark scan error on the
            # pruned layout, OR a Python ENOENT from the hard-link pass
            # (_stage_with_reuse links base files by absolute path; a
            # concurrent publish can retire them mid-link). Either is a
            # lost race IFF the journal moved; journal unmoved means a
            # real error and propagates.
            if now_seq != base_seq and (
                    _input_vanished(exc)
                    or isinstance(exc, FileNotFoundError)):
                retried = True
                continue
            raise
        # snapshot dirs keep the public v{version} name when free (the
        # common single-writer case); a racing same-version writer gets
        # a unique suffix — readers resolve through the journal anyway
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        if _race_hook is not None:
            _race_hook(_attempt)
        entry = {"op": "upsert", "version": batch_id,
                 "version_name": perm, "writer": writer}
        if reuse_stats is not None:
            entry["files_rewritten"], entry["files_reused"] = reuse_stats
            if _scope()[1] is not None:
                # scope claim for concurrent writers' conflict
                # classification — only valid on the incremental path
                # (a full rewrite touches everything)
                entry["touched_partitions"] = _scope()[1]
        if ident:
            entry["identity_hwm"] = _staged_identity_hwm(
                spark, os.path.join(versions_root, perm), ident,
                ident_hwm, skip_files=ident_carried)
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions, _pre_swap_hook=_pre_swap_hook)
            return "applied-after-retry" if retried else "applied"
        # lost the race: our merge is based on a stale snapshot
        retried = True
        if (reuse_stats is not None and _scope()[1] is not None
                and not ident):
            # disjoint-writer fast path: if every commit that beat us
            # is partition-disjoint, rebase the stage we already built
            # (file moves + carries, no Spark) instead of re-merging
            status = _rebase_disjoint_stage(
                target_dir, versions_root, perm, kept, touched,
                _scope()[1], commits[-1]["seq"] if commits else -1,
                batch_id, writer, keep_versions, reuse_stats[0])
            if status is not None:
                return status
        # conflict (or fast path inapplicable): discard and re-merge
        # against the new journal head
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"upsert commit for version {batch_id} lost {max_retries} "
        f"consecutive CAS races — livelocked writer set?")


def upsert_delete_where(spark, target_dir: str, batch_id: int,
                        condition, keep_versions: int = 2,
                        writer: str = "w0",
                        max_retries: int = 24,
                        incremental_min_bytes: int | None = None) -> str:
    """Delta-style ``DELETE WHERE`` committed through the same
    optimistic journal as the upserts: stages the current snapshot
    MINUS the matching rows as the next version, CAS-claims the journal
    slot, publishes. SQL DELETE semantics — a row is removed iff the
    predicate is TRUE; FALSE and NULL (three-valued logic) keep the
    row. ``condition`` is a Column or a SQL expression string.

    This is what makes the change feed's ``delete`` rows reachable
    (read_upsert_changes emits one per key present in v_from but absent
    in v_to), and with them the −1 legs of the incremental-MV fold.
    Exactly-once by ``batch_id`` like the upserts. At 100 TB the stage
    rewrites ONLY the files that contain rows the predicate deletes
    (one pushed-down scan finds them via ``_metadata.file_path``);
    every untouched file carries into the new version by hard link —
    Delta's file-granular copy-on-write, so a selective DELETE costs
    the changed files, not the table."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..config import (incremental_commit_min_bytes,
                          incremental_commits_enabled)
    from ..fsutil import cas_backoff, try_commit
    from .index import _input_vanished

    if isinstance(condition, str):
        condition = F.expr(condition)
    from .partitioning import check_table_writable, table_partitioning
    check_table_writable(target_dir)
    # Delta's partition-predicate DELETE fast path: a predicate whose
    # references are ALL partition columns never needs to read a row —
    # route to the metadata-only drop (same journal op, same 3VL, same
    # exactly-once domain), zero data I/O at any table size
    _parts = table_partitioning(target_dir)
    if _parts:
        # a predicate that ANALYZES against a partition-columns-only
        # frame references nothing else — same probe trick the drop
        # path uses for its own validation
        try:
            ddl = ", ".join(f"`{c}` {t}" for c, t in _parts.items())
            spark.createDataFrame([], ddl).filter(condition).schema
            partition_only = True
        except Exception:
            partition_only = False
        if partition_only:
            return upsert_drop_partitions(
                spark, target_dir, batch_id, condition,
                keep_versions=keep_versions, writer=writer,
                max_retries=max_retries)
    versions_root = target_dir + "_versions"
    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if not commits:
            raise FileNotFoundError(f"no upsert table at {target_dir}")
        if batch_id in applied:
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "replayed"
        base = commits[-1]["version_name"]
        seq = commits[-1]["seq"] + 1
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        reuse_stats = None
        try:
            base_dir = os.path.join(versions_root, base)
            snapshot = _snapshot_read(spark, target_dir, base_dir)
            if (incremental_commits_enabled()
                    and _data_file_bytes(base_dir)
                    >= _min_bytes_cutoff(incremental_min_bytes)):
                # touched = files holding at least one row the predicate
                # actually deletes (predicate pushed to the scan — a
                # partition-column predicate prunes whole directories
                # before any file opens); every other file carries into
                # the new version as a hard link
                rows = (_snapshot_read(spark, target_dir, base_dir,
                                       file_col="_file")
                        .filter(condition)
                        .select("_file").distinct().collect())
                touched = _file_paths_to_relpaths(rows, base_dir)
                kept_files = [f for f in _snapshot_data_files(base_dir)
                              if f not in touched]
                rewritten = None
                if touched:
                    rewritten = (_snapshot_read(
                        spark, target_dir, base_dir,
                        files=sorted(touched))
                        .filter(F.coalesce(~condition, F.lit(True))))
                _stage_with_reuse(base_dir,
                                  os.path.join(versions_root, stage),
                                  kept_files, rewritten,
                                  target_dir=target_dir)
                reuse_stats = (len(touched), len(kept_files))
            else:
                kept = snapshot.filter(
                    F.coalesce(~condition, F.lit(True)))
                _staged_write(kept, target_dir,
                              os.path.join(versions_root, stage),
                              input_bytes_hint=_data_file_bytes(base_dir))
        except Exception as exc:
            # same stale-base window as the upsert merge: a concurrent
            # publish can prune our base under the running scan
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            # vanished-base signature: a Spark scan error on the
            # pruned layout, OR a Python ENOENT from the hard-link pass
            # (_stage_with_reuse links base files by absolute path; a
            # concurrent publish can retire them mid-link). Either is a
            # lost race IFF the journal moved; journal unmoved means a
            # real error and propagates.
            if now_seq != commits[-1]["seq"] and (
                    _input_vanished(exc)
                    or isinstance(exc, FileNotFoundError)):
                retried = True
                continue
            raise
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        entry = {"op": "delete", "version": batch_id,
                 "version_name": perm, "writer": writer}
        if reuse_stats is not None:
            entry["files_rewritten"], entry["files_reused"] = reuse_stats
            # DELETE rows only vanish — rewrites stay in the touched
            # partitions, so the claim is exact
            claim = _touched_partition_claim(target_dir, touched)
            if claim is not None:
                entry["touched_partitions"] = claim
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "applied-after-retry" if retried else "applied"
        retried = True
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"delete commit for version {batch_id} lost {max_retries} "
        f"consecutive CAS races — livelocked writer set?")


def upsert_update_where(spark, target_dir: str, batch_id: int,
                        condition, set_exprs: dict,
                        key_cols: list[str] | None = None,
                        keep_versions: int = 2, writer: str = "w0",
                        max_retries: int = 24,
                        incremental_min_bytes: int | None = None) -> str:
    """Delta-style ``UPDATE ... SET ... WHERE ...`` committed through
    the same optimistic journal — the third leg of the DML triad
    (keep-latest upsert / MERGE INTO, DELETE WHERE, UPDATE WHERE). SQL
    UPDATE semantics: a row is rewritten iff the predicate is TRUE;
    FALSE and NULL (three-valued logic) leave it untouched.
    ``set_exprs`` maps column name → SQL expression string (or Column)
    evaluated against the OLD row — standard SQL UPDATE, every SET
    sees pre-update values, so ``{"a": "b", "b": "a"}`` swaps. Each
    SET result is cast to the column's existing type (Delta's ANSI
    store-assignment: an UPDATE never evolves the schema). Pass the
    table's merge keys as ``key_cols`` to REFUSE a SET on a key
    column — rewriting keys can silently break the format's
    unique-keys invariant (use DELETE + upsert, or MERGE, to re-key).

    CHECK constraints are validated on the POST-IMAGE of the matching
    rows only (delta-sized pass) before any staging work — the
    partial-update gap flagged in the round-10 review: commit-time
    validation of incoming batches never sees rows an UPDATE rewrites
    in place. Exactly-once by ``batch_id``. At 100 TB the stage
    rewrites ONLY the files containing at least one TRUE-predicate row
    (one pushed-down scan via ``_metadata.file_path``); every other
    file carries by hard link — file-granular copy-on-write, cost
    proportional to the touched data. The change feed sees an UPDATE
    as update_preimage/postimage pairs for rows the SET actually
    changed (a touched file's untouched rows diff equal and emit
    nothing)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..config import incremental_commits_enabled
    from ..fsutil import cas_backoff, try_commit
    from .index import _input_vanished

    if isinstance(condition, str):
        condition = F.expr(condition)
    sets = {c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in set_exprs.items()}
    if not sets:
        raise ValueError("UPDATE requires at least one SET column")
    bad_keys = sorted(set(sets) & set(key_cols or ()))
    if bad_keys:
        raise ValueError(
            f"UPDATE SET on key column(s) {bad_keys} refused — "
            f"rewriting merge keys breaks the unique-keys invariant; "
            f"re-key with DELETE + upsert or MERGE INTO")
    gens = table_generated_columns(target_dir)
    bad_gen = sorted(set(sets) & set(gens))
    if bad_gen:
        raise ValueError(
            f"UPDATE SET on generated column(s) {bad_gen} refused — "
            f"GENERATED ALWAYS AS columns recompute from their "
            f"expression when an UPDATE touches their inputs (Delta's "
            f"contract); SET the inputs instead")
    ident = table_identity_column(target_dir)
    if ident and ident["name"] in sets:
        raise ValueError(
            f"UPDATE SET on identity column {ident['name']!r} refused "
            f"— GENERATED ALWAYS AS IDENTITY values are "
            f"allocation-owned")
    hit = F.coalesce(condition, F.lit(False))
    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    cons = table_check_constraints(target_dir)
    versions_root = target_dir + "_versions"
    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if not commits:
            raise FileNotFoundError(f"no upsert table at {target_dir}")
        if batch_id in applied:
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "replayed"
        base = commits[-1]["version_name"]
        seq = commits[-1]["seq"] + 1
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        reuse_stats = None
        try:
            base_dir = os.path.join(versions_root, base)
            snapshot = _snapshot_read(spark, target_dir, base_dir)
            missing = sorted(set(sets) - set(snapshot.columns))
            if missing:
                raise ValueError(
                    f"UPDATE SET on column(s) {missing} absent from the "
                    f"table (columns: {snapshot.columns}) — an UPDATE "
                    f"never adds columns; evolve the schema with an "
                    f"upsert or MERGE first")
            types = dict(snapshot.dtypes)

            def apply_update(df):
                # SETs evaluate against the OLD row (select is
                # simultaneous), cast back to the column's type;
                # generated columns then recompute on the UPDATED row
                # (their inputs may have just changed — Delta's
                # recompute-on-update contract)
                tagged = df.withColumn("_upd_hit", hit)
                out = tagged.select(*[
                    (F.when(F.col("_upd_hit"), sets[c].cast(types[c]))
                     .otherwise(F.col(c)).alias(c)
                     if c in sets else F.col(c))
                    for c in df.columns], "_upd_hit")
                for g, gexpr in gens.items():
                    if g in out.columns:
                        out = out.withColumn(
                            g, F.when(F.col("_upd_hit"),
                                      F.expr(gexpr).cast(types[g]))
                            .otherwise(F.col(g)))
                return out.drop("_upd_hit")

            if (incremental_commits_enabled()
                    and _data_file_bytes(base_dir)
                    >= _min_bytes_cutoff(incremental_min_bytes)):
                rows = (_snapshot_read(spark, target_dir, base_dir,
                                       file_col="_file")
                        .filter(condition)
                        .select("_file").distinct().collect())
                touched = _file_paths_to_relpaths(rows, base_dir)
                kept_files = [f for f in _snapshot_data_files(base_dir)
                              if f not in touched]
                rewritten = None
                if touched:
                    sub = _snapshot_read(spark, target_dir, base_dir,
                                         files=sorted(touched))
                    if cons:
                        # post-image validation on the TOUCHED subset —
                        # every predicate-matching row lives there by
                        # construction, so this covers exactly what a
                        # snapshot-wide pass would without the second
                        # full-table scan (the delta-sized check
                        # commit-time batch validation can't cover)
                        _validate_constraints(
                            apply_update(sub.filter(hit)), cons,
                            "the UPDATE post-image")
                    rewritten = apply_update(sub)
                _stage_with_reuse(base_dir,
                                  os.path.join(versions_root, stage),
                                  kept_files, rewritten,
                                  target_dir=target_dir)
                reuse_stats = (len(touched), len(kept_files))
            else:
                if cons:
                    # full-rewrite path: the snapshot scan is the
                    # stage's own cost anyway
                    _validate_constraints(
                        apply_update(snapshot.filter(hit)), cons,
                        "the UPDATE post-image")
                _staged_write(apply_update(snapshot), target_dir,
                              os.path.join(versions_root, stage),
                              input_bytes_hint=_data_file_bytes(base_dir))
        except Exception as exc:
            # same stale-base window as the upsert merge: a concurrent
            # publish can prune our base under the running scan
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            if now_seq != commits[-1]["seq"] and (
                    _input_vanished(exc)
                    or isinstance(exc, FileNotFoundError)):
                retried = True
                continue
            raise
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        entry = {"op": "update", "version": batch_id,
                 "version_name": perm, "writer": writer}
        if reuse_stats is not None:
            entry["files_rewritten"], entry["files_reused"] = reuse_stats
            from .partitioning import table_partitioning as _tp
            if not (set(sets) & set(_tp(target_dir))) and not (
                    set(gens) & set(_tp(target_dir))):
                # no SET targets a partition column AND no partition
                # column is GENERATED (apply_update recomputes
                # generated columns from SET inputs — a generated
                # partition column could move rows out of the claimed
                # dirs) → updated rows stay put, the claim is exact
                claim = _touched_partition_claim(target_dir, touched)
                if claim is not None:
                    entry["touched_partitions"] = claim
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "applied-after-retry" if retried else "applied"
        retried = True
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"update commit for version {batch_id} lost {max_retries} "
        f"consecutive CAS races — livelocked writer set?")


def upsert_drop_partitions(spark, target_dir: str, batch_id: int,
                           condition, keep_versions: int = 2,
                           writer: str = "w0",
                           max_retries: int = 24) -> str:
    """METADATA-ONLY partition drop: ``DELETE WHERE <partition
    predicate>`` where the predicate references ONLY the table's
    PARTITIONED BY columns, so the whole operation is a journal commit
    whose staging is pure hard links — zero rows read, zero rows
    written, at any table size. This is Delta's partition-predicate
    DELETE fast path (file-level action, no data scan) on the mini
    format.

    The predicate is evaluated ONCE per distinct partition tuple
    (driver-assembled from the directory listing — a pure metadata
    read), through Spark itself so its semantics are exactly SQL
    three-valued logic: a partition is dropped iff the predicate is
    TRUE; FALSE and NULL (e.g. the Hive default-partition tuple
    against a ``>`` comparison) keep it. A predicate referencing a
    NON-partition column fails loudly — use ``upsert_delete_where``
    for row-level predicates.

    Exactly-once by ``batch_id``; journal op is ``delete`` (the change
    feed emits the dropped partitions' rows as ``delete`` events — it
    diffs the snapshots, so a metadata drop and a row-level delete are
    indistinguishable downstream, as they should be)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..fsutil import cas_backoff, try_commit
    from .partitioning import list_partition_dirs, table_partitioning

    parts = table_partitioning(target_dir)
    if not parts:
        raise ValueError(
            f"{target_dir} is not PARTITIONED BY — "
            f"upsert_drop_partitions needs partition columns; use "
            f"upsert_delete_where for row-level deletes")
    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    versions_root = target_dir + "_versions"
    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if not commits:
            raise FileNotFoundError(f"no upsert table at {target_dir}")
        if batch_id in applied:
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "replayed"
        base = commits[-1]["version_name"]
        seq = commits[-1]["seq"] + 1
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        try:
            base_dir = os.path.join(versions_root, base)
            # one row per live partition tuple — bounded by the
            # partition count, never the data; evaluating the predicate
            # on THIS tiny frame is what guarantees it references only
            # partition columns (anything else fails analysis)
            pdirs = list_partition_dirs(base_dir, parts)
            ddl = ", ".join(f"`{c}` {t}" for c, t in parts.items())
            tuples = spark.createDataFrame(
                [tuple(v[c] for c in parts) for v in pdirs.values()],
                ddl)
            try:
                dropped_vals = {
                    tuple(r[c] for c in parts)
                    for r in tuples.filter(cond).collect()}
            except Exception as exc:
                if "UNRESOLVED_COLUMN" in str(exc):
                    raise ValueError(
                        f"drop-partitions predicate {condition!r} "
                        f"references a non-partition column (partition "
                        f"columns: {list(parts)}) — use "
                        f"upsert_delete_where for row predicates"
                    ) from exc
                raise
            dropped_dirs = {
                d for d, v in pdirs.items()
                if tuple(v[c] for c in parts) in dropped_vals}
            kept = [f for f in _snapshot_data_files(base_dir)
                    if os.path.dirname(f) not in dropped_dirs]
            # dropping EVERY partition leaves zero data files: stage an
            # empty typed write so the snapshot keeps its schema (the
            # _EMPTY marker path in _staged_write)
            rewritten = (None if kept
                         else _snapshot_read(spark, target_dir,
                                             base_dir).limit(0))
            _stage_with_reuse(base_dir,
                              os.path.join(versions_root, stage),
                              kept, rewritten, target_dir=target_dir)
        except Exception as exc:
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            if now_seq != commits[-1]["seq"] and isinstance(
                    exc, FileNotFoundError):
                retried = True      # base pruned mid-link: lost race
                continue
            raise
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        entry = {"op": "delete", "version": batch_id,
                 "version_name": perm, "writer": writer,
                 "files_rewritten": 0, "files_reused": len(kept),
                 "dropped_partitions": sorted(dropped_dirs)}
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "applied-after-retry" if retried else "applied"
        retried = True
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"drop-partitions commit for version {batch_id} lost "
        f"{max_retries} consecutive CAS races — livelocked writer set?")


def upsert_overwrite_partitions(spark, target_dir: str, batch_id: int,
                                batch_df, key_cols: list[str],
                                keep_versions: int = 2,
                                writer: str = "w0",
                                max_retries: int = 24) -> str:
    """DYNAMIC PARTITION OVERWRITE as a journal commit: replace exactly
    the partitions PRESENT in the batch with the batch's rows, carry
    every other partition by hard link — Spark's
    ``partitionOverwriteMode=dynamic`` re-expressed on the versioned
    format, with time travel, exactly-once batch ids, and the change
    feed seeing precisely the replaced partitions' row diffs.

    The touched set is the batch's own distinct partition tuples (one
    delta-sized aggregate); the carried files are found by LISTING, so
    the base table's data is never read — staging cost is O(batch) at
    any table size.

    Contract: the PARTITIONED BY columns must be part of ``key_cols``.
    The format's unique-keys invariant is per-table, and an overwrite
    only sees its own partitions — keys that could live in multiple
    partitions (partition col outside the key) could silently
    duplicate across an overwrite boundary. With the partition columns
    in the key, a key names its partition and the invariant reduces to
    per-partition uniqueness, which the batch-side dup check enforces.
    Identity-column tables are refused (overwrite semantics have no
    matched/new distinction to inherit ids through — Delta's dynamic
    overwrite has the same restriction in spirit: it is a whole-
    partition replace, not a merge)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..fsutil import cas_backoff, try_commit
    from .partitioning import table_partitioning

    parts = table_partitioning(target_dir)
    if not parts:
        raise ValueError(
            f"{target_dir} is not PARTITIONED BY — dynamic partition "
            f"overwrite needs partition columns")
    if not set(parts) <= set(key_cols):
        raise ValueError(
            f"PARTITIONED BY columns {list(parts)} must be part of "
            f"key_cols {key_cols} for dynamic overwrite — otherwise a "
            f"key could live in an untouched partition AND the batch, "
            f"breaking the unique-keys invariant")
    if table_identity_column(target_dir):
        raise ValueError(
            "dynamic partition overwrite is not supported on identity "
            "tables — a whole-partition replace has no matched rows to "
            "inherit ids through; use MERGE INTO")
    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    defaults = table_column_defaults(target_dir)
    if defaults:
        # the snapshot-types read is only needed to type the fills —
        # skip it (journal parse + footer read) on default-free tables
        batch_df = _apply_defaults(
            batch_df, defaults,
            _current_table_types(batch_df.sparkSession, target_dir))
    dup = (batch_df.groupBy(*key_cols).count()
           .filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise ValueError(
            "overwrite batch has multiple rows for at least one key — "
            "reduce it (e.g. keep-latest) first")
    gens = table_generated_columns(target_dir)
    if gens:
        batch_df = _apply_generated(batch_df, gens, "the overwrite batch")
    cons = table_check_constraints(target_dir)
    if cons:
        _validate_constraints(batch_df, cons, "the overwrite batch")

    versions_root = target_dir + "_versions"
    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if not commits:
            raise FileNotFoundError(
                f"no upsert table at {target_dir} — dynamic overwrite "
                f"needs an existing table (first write goes through "
                f"upsert_commit_batch)")
        if batch_id in applied:
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "replayed"
        base = commits[-1]["version_name"]
        seq = commits[-1]["seq"] + 1
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        try:
            base_dir = os.path.join(versions_root, base)
            # the batch's own partitions — delta-sized distinct
            replaced = {
                tuple(r[c] for c in parts)
                for r in batch_df.select(*parts).dropDuplicates()
                .collect()}
            from .partitioning import partition_values_of
            kept = []
            touched_n = 0
            for f in _snapshot_data_files(base_dir):
                vals = partition_values_of(f, parts)
                if tuple(vals[c] for c in parts) in replaced:
                    touched_n += 1
                else:
                    kept.append(f)
            _stage_with_reuse(base_dir,
                              os.path.join(versions_root, stage),
                              kept, batch_df, target_dir=target_dir)
        except Exception as exc:
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            if now_seq != commits[-1]["seq"] and isinstance(
                    exc, FileNotFoundError):
                retried = True
                continue
            raise
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        entry = {"op": "overwrite", "version": batch_id,
                 "version_name": perm, "writer": writer,
                 "files_rewritten": touched_n,
                 "files_reused": len(kept),
                 "replaced_partitions": len(replaced)}
        if len(replaced) <= PARTITION_PRUNE_CAP and _schemas_match(
                _snapshot_read(spark, target_dir, base_dir).schema,
                batch_df.schema):
            # exact scope by construction: a dynamic overwrite touches
            # precisely its batch's partitions (requires parts ⊆ key).
            # The schema gate matters: a claim certifies an UNCHANGED
            # schema to the rebase classifier (a loser re-links its
            # old-schema stage verbatim) — a schema-evolving overwrite
            # must stay unclassifiable. Lazy schema, no Spark job.
            from .partitioning import partition_dir_of
            entry["touched_partitions"] = sorted(
                partition_dir_of(dict(zip(parts, t))) for t in replaced)
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "applied-after-retry" if retried else "applied"
        retried = True
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"overwrite commit for version {batch_id} lost {max_retries} "
        f"consecutive CAS races — livelocked writer set?")


def _merge_result(snapshot, source, key_cols: list[str],
                  matched_update, matched_delete, not_matched_insert,
                  source_meta_cols: tuple = (),
                  matched_update_set: dict | None = None,
                  not_matched_by_source_update=None,
                  not_matched_by_source_set: dict | None = None,
                  not_matched_by_source_delete=None,
                  insert_defaults: dict | None = None):
    """The relational core of MERGE INTO (separated so the CAS loop can
    re-stage it against a new base on a lost race). Returns the merged
    DataFrame in the combined schema: target columns first (in table
    order), source-only columns appended. ``source_meta_cols`` names
    source columns usable in clause CONDITIONS but never written to
    the target (no schema evolution, no SET) — standard SQL MERGE,
    where the source may carry arbitrary columns the clauses consult
    (e.g. a CDC op code) without the UPDATE/INSERT * touching them.

    ``matched_update_set`` switches the matched-update clause from
    ``UPDATE SET *`` to an explicit ``SET {col: expr}`` map (exprs see
    the joined row via ``t.``/``s.`` aliases, evaluated simultaneously
    against OLD values, cast to the column's type — SQL UPDATE
    store-assignment); source-only columns then evolve only through
    INSERTs. The ``not_matched_by_source_*`` parameters are Delta's
    ``WHEN NOT MATCHED BY SOURCE`` clauses over target-only rows:
    DELETE tests first, then UPDATE with its own SET map (exprs over
    ``t.`` — there is no source row). NULL conditions never fire a
    clause (3VL)."""
    from pyspark.sql import functions as F

    def cond(c):
        if c is None:
            return F.lit(False)
        if isinstance(c, bool):
            return F.lit(c)
        if isinstance(c, str):
            return F.expr(c)
        return c

    def set_map(m):
        return {c: (F.expr(e) if isinstance(e, str) else e)
                for c, e in (m or {}).items()}

    upd = cond(matched_update)
    dele = cond(matched_delete)
    ins = cond(not_matched_insert)
    nmbs_del = cond(not_matched_by_source_delete)
    nmbs_upd = cond(not_matched_by_source_update)
    upd_set = set_map(matched_update_set)
    nmbs_set = set_map(not_matched_by_source_set)

    t = snapshot.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    on = None
    for k in key_cols:
        # null-safe ON: the table format treats NULL as ONE key group
        # (keep_latest windows group NULLs; the touched-file join is
        # eqNullSafe), so MERGE must match a NULL-keyed source row to
        # the NULL-keyed target row — a plain-equality ON would INSERT
        # a second NULL-key row and break the unique-keys invariant
        # every reader (CDC diff, MV fold) relies on. Deliberate
        # divergence from Delta, whose tables have no key invariant.
        term = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        on = term if on is None else (on & term)
    j = t.join(s, on, "full_outer")
    matched = F.col("t._t_present").isNotNull() \
        & F.col("s._s_present").isNotNull()
    s_only = F.col("t._t_present").isNull()
    # clause order is Delta's: a matched row tests DELETE first, then
    # UPDATE, else carries unchanged; a source-only row tests INSERT;
    # a target-only row tests NOT MATCHED BY SOURCE DELETE first, then
    # its UPDATE, else carries
    keep = F.when(matched & dele, F.lit(False)) \
        .when(matched, F.lit(True)) \
        .when(s_only, ins) \
        .when(F.coalesce(nmbs_del, F.lit(False)), F.lit(False)) \
        .otherwise(F.lit(True))
    # ~dele must treat a NULL delete condition as "not deleted" (SQL
    # MERGE: an unsatisfied — including NULL — DELETE clause falls
    # through to UPDATE); raw ~NULL is NULL and would swallow a
    # satisfied UPDATE, carrying the row unchanged instead
    not_deleted = ~F.coalesce(dele, F.lit(False))
    apply_upd = matched & not_deleted & F.coalesce(upd, F.lit(False))
    t_only = ~matched & ~s_only
    apply_nmbs = (t_only
                  & ~F.coalesce(nmbs_del, F.lit(False))
                  & F.coalesce(nmbs_upd, F.lit(False)))
    take_source = F.when(apply_upd, F.lit(True)) \
        .when(s_only, F.lit(True)).otherwise(F.lit(False))

    meta = set(source_meta_cols)
    t_cols = [f.name for f in snapshot.schema.fields]
    t_types = {f.name: f.dataType for f in snapshot.schema.fields}
    s_fields = {f.name: f for f in source.schema.fields
                if f.name not in meta}
    out = []
    for c in t_cols:
        if c in key_cols:
            out.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
                       .alias(c))
            continue
        if matched_update_set is not None:
            upd_val = (upd_set[c].cast(t_types[c]) if c in upd_set
                       else F.col(f"t.{c}"))
        else:
            upd_val = (F.col(f"s.{c}") if c in s_fields
                       else F.col(f"t.{c}"))
        if c in s_fields:
            ins_val = F.col(f"s.{c}")
        elif insert_defaults and c in insert_defaults:
            # column DEFAULT: an INSERT whose source lacks the column
            # gets the declared expression, not NULL (SQL DEFAULT)
            ins_val = F.expr(insert_defaults[c]).cast(t_types[c])
        else:
            ins_val = F.lit(None).cast(t_types[c])
        nmbs_val = (nmbs_set[c].cast(t_types[c]) if c in nmbs_set
                    else F.col(f"t.{c}"))
        out.append(F.when(apply_upd, upd_val)
                   .when(s_only, ins_val)
                   .when(apply_nmbs, nmbs_val)
                   .otherwise(F.col(f"t.{c}")).alias(c))
    # SET-map updates never pull source-only columns (Delta: explicit
    # assignments only); evolution columns then arrive via INSERTs.
    # With SET maps AND the insert clause disabled, no row can ever
    # receive a source-only value — appending the column would evolve
    # the schema with pure NULL noise, so don't.
    ins_enabled = not (not_matched_insert is None
                       or not_matched_insert is False)
    evolve = matched_update_set is None or ins_enabled
    evo_take = take_source if matched_update_set is None else s_only
    if evolve:
        for c in (f.name for f in source.schema.fields):
            if c not in t_cols and c != "_s_present" and c not in meta:
                # source-only column: NULL on carried target rows — the
                # mergeSchema evolution the upsert path also applies
                out.append(
                    F.when(evo_take, F.col(f"s.{c}"))
                    .otherwise(F.lit(None).cast(s_fields[c].dataType))
                    .alias(c))
    return j.filter(keep).select(*out)


def upsert_merge_into(spark, target_dir: str, batch_id: int, source,
                      key_cols: list[str],
                      matched_update="true",
                      matched_delete=None,
                      not_matched_insert="true",
                      keep_versions: int = 2, writer: str = "w0",
                      max_retries: int = 24,
                      incremental_min_bytes: int | None = None,
                      source_meta_cols: tuple = (),
                      matched_update_set: dict | None = None,
                      not_matched_by_source_update=None,
                      not_matched_by_source_set: dict | None = None,
                      not_matched_by_source_delete=None,
                      source_unique: bool = False) -> str:
    """Delta-style ``MERGE INTO`` committed through the optimistic CAS
    journal — the general conditional form of which upsert_commit_batch
    (keep-latest) and upsert_delete_where are the two fixed special
    cases. Per key-matched row, clauses apply in Delta's order:

      WHEN MATCHED AND <matched_delete>  THEN DELETE
      WHEN MATCHED AND <matched_update>  THEN UPDATE SET *
      WHEN NOT MATCHED AND <not_matched_insert> THEN INSERT *

    Conditions are SQL strings (or Columns/bools) over the aliases
    ``t`` (target) and ``s`` (source), e.g. ``"s.price > t.price"``;
    None/False disables a clause, "true" makes it unconditional.
    UPDATE SET * takes every source column (missing source columns
    retain the target value); INSERT * fills missing columns with
    NULL; source-only columns evolve the schema with NULLs on carried
    rows — the same mergeSchema contract as the upsert path.

    ``source_meta_cols`` names source columns the clause CONDITIONS
    may consult but UPDATE/INSERT * never writes (standard SQL MERGE —
    e.g. a CDC op code steering DELETE vs UPDATE without evolving the
    target schema).

    ``matched_update_set`` replaces UPDATE SET * with an explicit
    ``{col: sql_expr}`` map (exprs over ``t.``/``s.``, simultaneous,
    store-assignment casts). ``not_matched_by_source_delete`` /
    ``not_matched_by_source_update`` (+ ``_set``) are Delta's WHEN NOT
    MATCHED BY SOURCE clauses over target rows whose key is absent
    from the source — DELETE tests first, then UPDATE. NMBS merges
    scan and rewrite the FULL target (the clause can hit any row, so
    the touched-file fast path is semantically unavailable — the same
    full-target scan Delta pays for these clauses); SET maps are
    refused on tables with generated columns (recompute-on-update
    through arbitrary assignments is not wired) and on key/identity
    columns.

    The source must have at most ONE row per key (Delta's multiple-
    source-rows-match error) — enforced with one aggregate; pre-reduce
    with keep-latest if the feed has duplicates. ``source_unique=True``
    skips that enforcement job when the caller can PROVE uniqueness by
    construction (keep-latest window, per-version change feed, unique-
    column filter) — the engine's internal replication paths do. Exactly-once by
    ``batch_id``. At 100 TB the stage first computes the TOUCHED file
    set (a key semi-join against the snapshot scan's ``_metadata.
    file_path`` — Delta's touched-file join), full-outer-joins only
    those files' rows with the source, and carries every untouched
    file into the new version by hard link — so a MERGE whose source
    hits 1 GB of keys rewrites ~1 GB, not the table. Schema-evolving
    merges (source-only or retyped columns) fall back to the full
    rewrite, since linked files can't be evolved in place."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ..config import (incremental_commit_min_bytes,
                          incremental_commits_enabled)
    from ..fsutil import cas_backoff, try_commit
    from .index import _input_vanished

    # ``source_unique=True`` is the caller's declaration that the
    # source has at most one row per key BY CONSTRUCTION (a keep-latest
    # window over the keys, a per-version change feed of a keyed table,
    # a filter on a unique column) — it skips the eager duplicate-key
    # pre-check below, which costs one whole Spark job (a source-sized
    # group-count) per MERGE before any staging work starts. The
    # engine's own CDC/replication paths all qualify; external callers
    # keep the default guarded behavior (Delta's multiple-source-rows
    # error). SPARK_GRAFT_DEBUG_CHECKS=1 re-arms the check even for
    # source_unique callers (ADVICE r14: a future upstream dedup
    # regression should fail loudly, and the suite pins the invariant
    # under that flag instead of paying the job on every production
    # MERGE).
    from ..config import debug_checks_enabled
    if not source_unique or debug_checks_enabled():
        dup = (source.groupBy(*key_cols).count()
               .filter(F.col("count") > 1).limit(1).count())
        if dup:
            raise ValueError(
                "MERGE source has multiple rows for at least one key — "
                "reduce it (e.g. keep-latest) before merging, as Delta "
                "requires")
    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    has_nmbs = (not_matched_by_source_delete is not None
                or not_matched_by_source_update is not None)
    set_cols = set(matched_update_set or {}) \
        | set(not_matched_by_source_set or {})
    bad_keys = sorted(set_cols & set(key_cols))
    if bad_keys:
        raise ValueError(
            f"MERGE SET on key column(s) {bad_keys} refused — "
            f"rewriting merge keys breaks the unique-keys invariant")
    gens = table_generated_columns(target_dir)
    if gens and set_cols:
        raise ValueError(
            "MERGE SET maps are not supported on tables with GENERATED"
            " ALWAYS AS columns — an assignment could stale a generated"
            " value without recompute; use UPDATE SET * semantics or "
            "upsert_update_where (which recomputes)")
    if gens:
        source = _apply_generated(source, gens, "the MERGE source")
    ident = table_identity_column(target_dir)
    if ident and ident["name"] in source.columns:
        raise ValueError(
            f"column {ident['name']!r} is GENERATED ALWAYS AS IDENTITY "
            f"— a MERGE source cannot supply it; matched rows keep the "
            f"target's value, inserted rows get fresh allocations")
    if ident and ident["name"] in set_cols:
        raise ValueError(
            f"MERGE SET on identity column {ident['name']!r} refused "
            f"— GENERATED ALWAYS AS IDENTITY values are "
            f"allocation-owned")
    cons = table_check_constraints(target_dir)
    merge_defaults = table_column_defaults(target_dir)
    # a NOT NULL column ABSENT from the source is fine when a DEFAULT
    # will fill it on INSERT (updates retain the target's non-null
    # value) — validating the raw source would refuse it wrongly; the
    # post-image pass below still covers a NULL-producing default
    nn_absent_defaulted = {
        n for n, e in cons.items()
        if isinstance(e, dict) and e.get("kind") == "not_null"
        and e["col"] not in source.columns
        and e["col"] in merge_defaults}
    src_cons = {n: e for n, e in cons.items()
                if n not in nn_absent_defaulted}
    if src_cons:
        _validate_constraints(source, src_cons, "the MERGE source")
    versions_root = target_dir + "_versions"
    os.makedirs(versions_root, exist_ok=True)

    def fill_identity(merged, commits):
        """Inserted rows (NULL identity after the full-outer merge —
        or every row when merging into an empty table) get fresh
        allocations above the journal head's mark; matched/carried
        rows keep the target's value."""
        if not ident:
            return merged, None
        hwm = _identity_high_water(commits, ident)
        name = ident["name"]
        if name not in merged.columns:
            return _assign_identity(merged, ident, hwm), hwm
        has = merged.filter(F.col(name).isNotNull())
        needs = merged.filter(F.col(name).isNull()).drop(name)
        return has.unionByName(
            _assign_identity(needs, ident, hwm)), hwm

    # disjoint-writer scope claim (shared mechanics with
    # upsert_commit_batch via _delta_partition_scope): the source's
    # distinct partition tuples bound BOTH the touched files and every
    # INSERTed row's partition (parts ⊆ key, and SET maps are refused
    # on key columns), so the claim is exact for the incremental path.
    # Lazy: full-rewrite merges never pay the collect.
    _scope_cache: list = []

    def _scope():
        if not _scope_cache:
            _scope_cache.append(
                _delta_partition_scope(source, target_dir, key_cols))
        return _scope_cache[0]

    retried = False
    for _attempt in range(max_retries):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if batch_id in applied:
            if commits:
                _publish_commit(target_dir, versions_root, commits,
                                keep_versions)
            return "replayed"
        base = commits[-1]["version_name"] if commits else None
        seq = commits[-1]["seq"] + 1 if commits else 0
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        reuse_stats = None
        ident_hwm = None
        ident_carried: list[str] = []
        try:
            if base is None:
                # MERGE into an empty table: only the INSERT clause
                # can produce rows
                ins = not_matched_insert
                if ins is None or ins is False:
                    merged = source.limit(0)
                else:
                    c = (F.expr(ins) if isinstance(ins, str)
                         else F.lit(True) if ins is True else ins)
                    merged = source.alias("s").filter(c)
                merged = merged.drop(*source_meta_cols)
                merged = _apply_defaults(merged, merge_defaults)
                merged, ident_hwm = fill_identity(merged, commits)
                _staged_write(merged, target_dir,
                              os.path.join(versions_root, stage))
            else:
                base_dir = os.path.join(versions_root, base)
                snapshot = _snapshot_read(spark, target_dir, base_dir)
                t_types = {f.name: f.dataType
                           for f in snapshot.schema.fields}
                s_types = {f.name: f.dataType
                           for f in source.schema.fields
                           if f.name not in set(source_meta_cols)}
                bad_set = sorted(set_cols - set(snapshot.columns))
                if bad_set:
                    raise ValueError(
                        f"MERGE SET on column(s) {bad_set} absent from "
                        f"the table (columns: {snapshot.columns}) — a "
                        f"SET map never adds columns; evolve the "
                        f"schema with UPDATE SET * or an upsert first")
                # incremental reuse needs the merge to neither evolve
                # the schema (source-only columns) nor widen a shared
                # column's type — either would leave linked files on a
                # schema the rewritten files no longer share; meta
                # columns never reach the target, so they don't count.
                # NOT MATCHED BY SOURCE clauses can hit ANY target row,
                # so the touched-file fast path is semantically
                # unavailable (Delta pays the same full-target scan).
                ins_on = not (not_matched_insert is None
                              or not_matched_insert is False)
                if matched_update_set is not None and not ins_on:
                    # SET-map assignments cast to target types and no
                    # INSERT can land source columns: the staged schema
                    # is provably the target schema
                    no_evolution = True
                else:
                    no_evolution = all(
                        c in t_types and t_types[c] == s_types[c]
                        for c in s_types)
                clause_kwargs = dict(
                    source_meta_cols=source_meta_cols,
                    insert_defaults=merge_defaults,
                    matched_update_set=matched_update_set,
                    not_matched_by_source_update=(
                        not_matched_by_source_update),
                    not_matched_by_source_set=not_matched_by_source_set,
                    not_matched_by_source_delete=(
                        not_matched_by_source_delete))
                if (incremental_commits_enabled() and no_evolution
                        and not has_nmbs
                        and _data_file_bytes(base_dir)
                        >= _min_bytes_cutoff(incremental_min_bytes)):
                    touched = _touched_files_by_keys(
                        spark, base_dir, source, key_cols, target_dir,
                        part_tuples=_scope()[0])
                    kept = [f for f in _snapshot_data_files(base_dir)
                            if f not in touched]
                    sub = (_snapshot_read(spark, target_dir, base_dir,
                                          files=sorted(touched))
                           if touched else snapshot.limit(0))
                    merged = _merge_result(sub, source, key_cols,
                                           matched_update, matched_delete,
                                           not_matched_insert,
                                           **clause_kwargs)
                    if cons and (set_cols or nn_absent_defaulted):
                        # SET maps (and defaulted NOT NULL columns the
                        # source omits) produce post-images the
                        # source-row validation can't see; the merged
                        # frame is touched-data-sized here
                        _validate_constraints(merged, cons,
                                              "the MERGE post-image")
                    merged, ident_hwm = fill_identity(merged, commits)
                    _stage_with_reuse(base_dir,
                                      os.path.join(versions_root, stage),
                                      kept, merged,
                                      target_dir=target_dir)
                    reuse_stats = (len(touched), len(kept))
                    ident_carried = kept
                else:
                    merged = _merge_result(snapshot, source, key_cols,
                                           matched_update, matched_delete,
                                           not_matched_insert,
                                           **clause_kwargs)
                    if cons and (set_cols or has_nmbs
                                 or nn_absent_defaulted):
                        _validate_constraints(merged, cons,
                                              "the MERGE post-image")
                    merged, ident_hwm = fill_identity(merged, commits)
                    # full rewrite: output ≈ base snapshot — size the
                    # staging shuffle to the base's known bytes
                    _staged_write(merged, target_dir,
                                  os.path.join(versions_root, stage),
                                  input_bytes_hint=(
                                      2 * _data_file_bytes(base_dir)))
        except Exception as exc:
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            now_seq = now[-1]["seq"] if now else -1
            base_seq = commits[-1]["seq"] if commits else -1
            # vanished-base signature: a Spark scan error on the
            # pruned layout, OR a Python ENOENT from the hard-link pass
            # (_stage_with_reuse links base files by absolute path; a
            # concurrent publish can retire them mid-link). Either is a
            # lost race IFF the journal moved; journal unmoved means a
            # real error and propagates.
            if now_seq != base_seq and (
                    _input_vanished(exc)
                    or isinstance(exc, FileNotFoundError)):
                retried = True
                continue
            raise
        perm = f"v{batch_id}"
        try:
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        except OSError:
            perm = f"v{batch_id}_{writer}_{uuid.uuid4().hex[:8]}"
            os.rename(os.path.join(versions_root, stage),
                      os.path.join(versions_root, perm))
        entry = {"op": "merge", "version": batch_id,
                 "version_name": perm, "writer": writer}
        if reuse_stats is not None:
            entry["files_rewritten"], entry["files_reused"] = reuse_stats
            if _scope()[1] is not None:
                entry["touched_partitions"] = _scope()[1]
        if ident:
            entry["identity_hwm"] = _staged_identity_hwm(
                spark, os.path.join(versions_root, perm), ident,
                ident_hwm, skip_files=ident_carried)
        if try_commit(_commits_dir(versions_root), seq, entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return "applied-after-retry" if retried else "applied"
        retried = True
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"merge commit for version {batch_id} lost {max_retries} "
        f"consecutive CAS races — livelocked writer set?")


# --- snapshot maintenance: OPTIMIZE / VACUUM / change feed -----------------

def _interleave_bits(bucket_cols, bits: int):
    """Morton (Z-curve) interleave of per-dimension bucket ranks: bit b
    of dimension j lands at position ``b*k + j``, so files that are
    adjacent in z-value are simultaneously narrow in EVERY dimension —
    the property that lets parquet min/max stats prune a scan on ANY
    zorder column, not just the leading sort key. Static expression
    tree (bits × dims shift/mask/or terms), fully whole-stage-codegen;
    the same kernel serves OPTIMIZE ZORDER and the oracled
    ``maintenance_zorder_interleave`` query."""
    from functools import reduce

    from pyspark.sql import functions as F

    k = len(bucket_cols)
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j)
        for b in range(bits) for j, c in enumerate(bucket_cols)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def _zorder_value(df, cols: list[str], bits: int):
    """Z-value column over EQUI-DEPTH bucket ranks of ``cols``.

    Per-column cut points come from one ``approxQuantile`` stats pass
    (driver collect bounded at ``2^bits - 1`` doubles per column —
    scale-safe), so skewed columns still spread across all buckets:
    Delta's OPTIMIZE ZORDER makes the same equi-depth choice (its
    range_partition_id sampling) precisely because min/max linear
    scaling collapses under outliers. Bucketing is a balanced
    ``when``-tree binary search over the cuts — log2(2^bits)
    comparisons per row inside whole-stage codegen, no extra shuffle;
    NULLs compare null and land in bucket 0 (nulls first, the Delta
    convention). Numeric/timestamp/date columns only:
    string zordering needs order-preserving range ids (a sampling
    shuffle per column) and is deliberately not offered — hash
    bucketing would destroy the range-pruning property that justifies
    zordering at all."""
    from pyspark.sql import functions as F

    cut_arrays = {}
    probes = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt in ("string", "binary", "boolean"):
            raise ValueError(
                f"zorder_by column {c!r} has type {dt}: zorder needs an "
                f"order-preserving numeric rank; cast or derive a "
                f"numeric key first")
        probes.append(F.col(c).cast("double").alias(c))
    dbl = df.select(*probes)
    n_cuts = (1 << bits) - 1
    # ONE stats scan for every zorder column (approxQuantile is
    # multi-column), not one scan per column
    all_cuts = dbl.stat.approxQuantile(
        list(cols), [i / (n_cuts + 1) for i in range(1, n_cuts + 1)], 1e-3)
    for c, qs in zip(cols, all_cuts):
        cut_arrays[c] = qs

    def _dbl_literal(v: float) -> str:
        import math
        if math.isfinite(v):
            # repr() is the shortest round-trip decimal: parsing it (in
            # Python or in Spark's double-literal lexer) recovers the
            # identical IEEE double, so the string form evaluates
            # bit-for-bit like F.lit(float(v)) did
            return f"{float(v)!r}D"
        return f"CAST('{float(v)}' AS DOUBLE)"  # Infinity/-Infinity/NaN

    def bucket_rank(c: str):
        # balanced when-tree binary search: log2(cuts) comparisons per
        # row, whole-stage codegen — NOT size(filter(cuts_array, ...)),
        # whose per-element lambda runs interpreted and costs 2^bits
        # comparisons per row (measured: the HOF form made the whole
        # zordered rewrite 7x the plain one at 10M rows; the tree form
        # is shuffle-bound like plain). Rank = count of cuts <= value
        # (bisect_right); a NULL value fails every >= branch and lands
        # in bucket 0 (nulls first, the Delta convention).
        #
        # The tree is assembled as ONE nested-CASE SQL string parsed by
        # a single F.expr: building it from Column operators cost ~250
        # recursive py4j constructions (~0.7 s of pure driver time per
        # OPTIMIZE ZORDER call, measured round 14); CASE WHEN/ELSE is
        # operator-identical to when/otherwise, so evaluation is
        # unchanged.
        cuts = cut_arrays[c]
        dcol = f"CAST(`{c}` AS DOUBLE)"

        def tree(lo: int, hi: int) -> str:
            if lo >= hi:
                return str(lo)
            mid = (lo + hi) // 2
            return (f"CASE WHEN {dcol} >= {_dbl_literal(cuts[mid])} "
                    f"THEN {tree(mid + 1, hi)} ELSE {tree(lo, mid)} END")

        return F.expr(tree(0, len(cuts)))

    return _interleave_bits([bucket_rank(c) for c in cols], bits)


def _data_file_bytes(path: str) -> int:
    """Total bytes of a snapshot's LOGICAL data files (markers and
    hidden files excluded; manifest-carried files resolved to their
    physical owners) — the local-fs analog of the table format's
    per-snapshot size statistics that drive OPTIMIZE target sizing."""
    import os

    from .carry import read_carry, resolve_data_file, versions_root_of

    carry = read_carry(path)
    vroot = versions_root_of(path) if carry else None
    total = 0
    for f in _snapshot_data_files(path):
        try:
            total += os.path.getsize(
                resolve_data_file(path, f, carry, vroot))
        except OSError:
            # a concurrent publish pruned the snapshot mid-walk
            # (Python-side ENOENT, not a Spark error signature):
            # sizing stats are best-effort — the read below will
            # classify the lost race properly if it matters
            continue
    return total


def optimize_upsert_target(spark, target_dir: str,
                           max_records_per_file: int = 1_000_000,
                           keep_versions: int = 2,
                           writer: str = "optimize",
                           target_file_bytes: int = 128 * 1024 * 1024,
                           zorder_by: list[str] | None = None,
                           stats_cols: list[str] | None = None,
                           min_file_bytes: int | None = None,
                           _pre_stage_hook=None) -> str | None:
    """OPTIMIZE: rewrite the journal-head snapshot into sized files
    (small-file compaction — the lakehouse maintenance op that keeps
    scan task counts proportional to data, not to commit history). The
    rewrite is itself a journal commit (op='optimize', same version
    number as the head), so it serializes with concurrent upserts via
    the same CAS: losing the race simply means a newer snapshot exists
    and the compaction of the stale one is discarded. Returns the new
    snapshot dir name, or None if there is nothing to compact.

    The rewrite parallelism is sized from the snapshot's own stats
    (VERDICT r5 item 2): ``ceil(snapshot_bytes / target_file_bytes)``
    shuffle partitions, so a 1 TB snapshot compacts on ~8000 tasks at
    the 128 MB default rather than serializing through one
    ``coalesce(1)`` task; ``maxRecordsPerFile`` stays as the per-file
    row cap within each task.

    ``zorder_by`` additionally CLUSTERS the rewrite on the Morton
    z-value of the named columns (Delta's OPTIMIZE ZORDER BY): one
    equi-depth stats pass per column, then range-partition + sort on
    the interleaved bucket ranks, so parquet min/max stats prune scans
    filtered on ANY zorder column — the multi-column data-skipping
    property a single-key sort cannot give. The zorder column set is
    recorded in the journal entry for observability.

    ``stats_cols`` (default: the zorder columns) additionally writes a
    per-file min/max manifest into the rewritten snapshot
    (skipping.write_stats_manifest — Delta's add.stats analog), which
    ``skipping.read_skipping`` uses to drop whole files before the
    scan; pass [] to disable.

    ``min_file_bytes`` switches to INCREMENTAL compaction — Delta's
    actual OPTIMIZE contract (its minFileSize): only files SMALLER
    than the threshold are bin-packed and rewritten; every
    already-sized file carries into the compacted snapshot by hard
    link, and a partition (or flat table) holding fewer than two small
    files has nothing to pack and is carried whole. At 100 TB this is
    the difference between maintenance costing O(small-file debt) —
    typically the last few commits' worth — and costing O(table) per
    run; the default full rewrite stays available for re-clustering
    (and is what ``zorder_by`` requires, since clustering is a global
    property — the two options are mutually exclusive). Small files
    are packed per partition directory, so the rewrite never moves a
    row across Hive partitions. Returns None when there is no
    small-file debt to pay."""
    import math
    import os
    import shutil
    import uuid

    from ..fsutil import cas_backoff, try_commit
    from .index import _input_vanished
    from .partitioning import table_partitioning

    if min_file_bytes is not None and zorder_by:
        raise ValueError(
            "zorder_by requires the full rewrite — clustering is a "
            "global property of the snapshot; drop min_file_bytes or "
            "zorder_by")
    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    versions_root = target_dir + "_versions"
    for _attempt in range(24):
        if _attempt:
            cas_backoff(_attempt)
        commits, _ = _journal_state(versions_root)
        if not commits:
            return None
        head = commits[-1]
        src = os.path.join(versions_root, head["version_name"])
        if _pre_stage_hook is not None:
            _pre_stage_hook(_attempt, head["version_name"])
        stage = f"_stage_{writer}_{uuid.uuid4().hex[:8]}"
        reuse_stats = None
        try:
            if min_file_bytes is not None:
                # incremental compaction: bin-pack ONLY the small-file
                # debt, per partition directory; carry the rest by link
                from .carry import read_carry, resolve_data_file
                src_carry = read_carry(src)
                small_by_dir: dict[str, list[str]] = {}
                sizes: dict[str, int] = {}
                kept: list[str] = []
                for f in _snapshot_data_files(src):
                    try:
                        sz = os.path.getsize(
                            resolve_data_file(src, f, src_carry))
                    except OSError:
                        raise FileNotFoundError(src)  # pruned mid-walk
                    if sz < min_file_bytes:
                        small_by_dir.setdefault(
                            os.path.dirname(f), []).append(f)
                        sizes[f] = sz
                    else:
                        kept.append(f)
                to_pack: list[str] = []
                for fs in small_by_dir.values():
                    if len(fs) >= 2:
                        to_pack.extend(fs)
                    else:
                        kept.extend(fs)     # a lone small file: no bin
                if not to_pack:
                    return None             # no small-file debt
                pack_bytes = sum(sizes[f] for f in to_pack)
                n_parts = max(1, math.ceil(
                    pack_bytes / max(target_file_bytes, 1)))
                sub = _snapshot_read(spark, target_dir, src,
                                     files=sorted(to_pack))
                parts = table_partitioning(target_dir)
                # hash-cluster on the partition columns so each Hive
                # partition's small files collapse into ~one output
                # file instead of splintering across every task
                rewritten = (sub.repartition(n_parts, *parts)
                             if parts else sub.repartition(n_parts))
                _stage_with_reuse(src,
                                  os.path.join(versions_root, stage),
                                  kept, rewritten, target_dir=target_dir)
                reuse_stats = (len(to_pack), len(kept))
                manifest_cols = []          # incremental runs keep the
                #                             layout; stats manifests
                #                             are the full rewrite's job
            else:
                n_parts = max(1, math.ceil(
                    _data_file_bytes(src) / max(target_file_bytes, 1)))
                snap = _snapshot_read(spark, target_dir, src)
                if zorder_by:
                    # OPTIMIZE ZORDER: range-partition + sort on the
                    # Morton z-value so every output file is narrow in
                    # EVERY zorder dimension — parquet min/max stats
                    # then prune scans filtered on ANY of them, where a
                    # plain sort prunes only the leading key. Bit depth
                    # scales with the rewrite width: granularity just
                    # has to exceed the file count (2 extra bits of
                    # headroom), capped at 8 bits/dim so the cuts array
                    # stays tiny.
                    bits = min(8, max(4, n_parts.bit_length() + 2))
                    rewritten = (
                        snap.withColumn("_z", _zorder_value(
                            snap, zorder_by, bits))
                        .repartitionByRange(n_parts, "_z")
                        .sortWithinPartitions("_z")
                        .drop("_z"))
                else:
                    rewritten = snap.repartition(n_parts)
                _staged_write(rewritten, target_dir,
                              os.path.join(versions_root, stage),
                              max_records_per_file=max_records_per_file)
                manifest_cols = (list(zorder_by or [])
                                 if stats_cols is None
                                 else list(stats_cols))
            if manifest_cols:
                from .skipping import write_stats_manifest
                # partition columns in the manifest get exact stats
                # from their Hive paths (min = max = value), so one
                # manifest prunes on partition AND data columns
                write_stats_manifest(
                    os.path.join(versions_root, stage), manifest_cols,
                    spark=spark, parts=table_partitioning(target_dir))
        except Exception as exc:
            # Same stale-input window as the upsert merge: concurrent
            # commits can retire the head we are compacting and prune it
            # under the running rewrite scan. Journal moved past our
            # head → routine lost race, re-read and compact the new
            # head; journal unmoved → real error, propagate.
            shutil.rmtree(os.path.join(versions_root, stage),
                          ignore_errors=True)
            now, _ = _journal_state(versions_root)
            if (now[-1]["seq"] if now else -1) != head["seq"] \
                    and (_input_vanished(exc)
                         or isinstance(exc, FileNotFoundError)):
                continue
            raise
        perm = f"v{head['version']}_compact_{uuid.uuid4().hex[:8]}"
        os.rename(os.path.join(versions_root, stage),
                  os.path.join(versions_root, perm))
        entry = {"op": "optimize", "version": head["version"],
                 "version_name": perm, "writer": writer}
        if zorder_by:
            entry["zorder"] = list(zorder_by)
        if reuse_stats is not None:
            entry["files_rewritten"], entry["files_reused"] = reuse_stats
            # incremental compaction packs per partition dir and the
            # repartition keys on the partition columns, so rewrites
            # never leave the packed partitions — exact scope claim for
            # the disjoint-writer classifier (a writer racing an
            # autoCompact of OTHER partitions rebases instead of
            # re-merging)
            claim = _touched_partition_claim(target_dir, to_pack)
            if claim is not None:
                entry["touched_partitions"] = claim
        if try_commit(_commits_dir(versions_root), head["seq"] + 1,
                      entry):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions=keep_versions)
            return perm
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    return None


# Default VACUUM retention: a staged-but-not-yet-committed snapshot is
# only in this window for the duration of one write + CAS attempt, so
# minutes of retention closes the stage→commit race; Delta's analog is
# the retentionDurationCheck floor (hours there, scaled to the local
# mini format's commit latency here).
def describe_upsert_history(spark, target_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for the versioned upsert target: one row per
    journal commit — (seq, timestamp, op, version, version_name,
    writer, retained) — newest first, where ``retained`` marks
    snapshots still readable via time travel and ``timestamp`` is the
    commit-file mtime (the same clock TIMESTAMP AS OF resolves
    against, Delta's log-mtime convention). The Delta
    `DESCRIBE HISTORY` analog; driver-side journal read (commit
    metadata is tiny by construction), returned as a DataFrame so it
    composes with the rest of the API."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    versions_root = target_dir + "_versions"

    schema = T.StructType([
        T.StructField("seq", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("version_name", T.StringType()),
        T.StructField("writer", T.StringType()),
        T.StructField("retained", T.BooleanType()),
        T.StructField("files_rewritten", T.LongType()),
        T.StructField("files_reused", T.LongType()),
    ])
    # A commit missing version_name must report retained=False: joining
    # '' onto versions_root yields versions_root itself, which always
    # exists and would mislabel the row retained=True.
    rows = [(c["seq"],
             dt.datetime.fromtimestamp(mt, dt.timezone.utc),
             c.get("op"), c.get("version"),
             c.get("version_name"), c.get("writer"),
             bool(c.get("version_name"))
             and os.path.isdir(os.path.join(versions_root,
                                            c["version_name"])),
             c.get("files_rewritten"), c.get("files_reused"))
            for c, mt in reversed(_commit_mtimes(versions_root))]
    return spark.createDataFrame(rows, schema)


def restore_upsert_target(spark, target_dir: str, version: int,
                          as_version: int, keep_versions: int = 2,
                          writer: str = "restore",
                          enforce_constraints: bool = True) -> str:
    """RESTORE: make a retained historical version the CURRENT table
    state again, as a NEW journal commit (Delta's `RESTORE TABLE ...
    VERSION AS OF` contract — a restore is history-preserving, never a
    rewind of the log). The restored snapshot is COPIED to a new
    version dir (the source stays retained for its own window), staged
    fully before the CAS, and committed/published through the same
    optimistic protocol as any upsert — concurrent writers serialize
    against it and the converge-loop publication applies. Raises if
    ``version`` is no longer retained (same contract as time-travel
    reads: VACUUM'd history cannot be restored) or if ``as_version``
    is already applied (restore ids are exactly-once like batch ids)."""
    import os
    import shutil
    import uuid

    from ..fsutil import cas_backoff, try_commit

    from .partitioning import check_table_writable
    check_table_writable(target_dir)
    versions_root = target_dir + "_versions"
    for _attempt in range(24):
        if _attempt:
            cas_backoff(_attempt)
        commits, applied = _journal_state(versions_root)
        if as_version in applied:
            # A racing restore of the SAME (version, as_version) that
            # just won the CAS is an exactly-once replay, not a
            # conflict — the table already sits in exactly the
            # requested state, so mirror upsert_commit_batch's
            # "replayed" no-op (repairing publication if the winner
            # crashed pre-publish). Only an as_version claimed by a
            # DIFFERENT source commit is a genuine id conflict.
            same = [c for c in commits
                    if c.get("version") == as_version
                    and c.get("restored_from") == version]
            if same:
                _publish_commit(target_dir, versions_root, commits,
                                keep_versions)
                return same[-1]["version_name"]
            raise ValueError(
                f"as_version {as_version} already applied by a "
                f"different commit (applied={sorted(applied)})")
        src = _resolve_version_dir(versions_root, version)
        if src is None:
            raise FileNotFoundError(
                f"version {version} not retained — cannot restore "
                f"(see describe_upsert_history)")
        # A constraint added AFTER `version` was written validated only
        # the then-current head — restoring a PRE-constraint version
        # would otherwise publish violating rows through a path no
        # commit-time check covers (VERDICT r10 item 6). Re-validate
        # the restored snapshot against the CURRENT constraint set;
        # enforce_constraints=False is the deliberate operator override
        # (restore first, repair data second), mirrored on Delta's
        # constraint-vs-restore escape hatch.
        cons = table_check_constraints(target_dir)
        if cons and enforce_constraints:
            _validate_constraints(
                _snapshot_read(spark, target_dir, src), cons,
                f"version {version} being restored (pass "
                f"enforce_constraints=False to restore anyway)")
        # Generated columns are write-path invariants of the same
        # class: a snapshot written BEFORE a declaration (or before the
        # expression changed) can violate name <=> expr, and a restore
        # is the one publish no commit-time computation covers.
        # Absent columns are also a refusal — a restored snapshot
        # missing the generated column would break every reader that
        # selects it.
        gens = table_generated_columns(target_dir)
        if gens and enforce_constraints:
            snap = _snapshot_read(spark, target_dir, src)
            for gname, gexpr in gens.items():
                if gname not in snap.columns:
                    raise GeneratedColumnViolation(
                        f"version {version} predates generated column "
                        f"{gname!r} — restoring would publish a "
                        f"snapshot without it (pass "
                        f"enforce_constraints=False to restore anyway)")
                bad = snap.filter(~F.col(gname).eqNullSafe(
                    F.expr(gexpr))).limit(1).collect()
                if bad:
                    raise GeneratedColumnViolation(
                        f"version {version} violates {gname!r} ALWAYS "
                        f"AS {gexpr}: first offending row "
                        f"{bad[0].asDict()!r} (pass "
                        f"enforce_constraints=False to restore anyway)")
        seq = commits[-1]["seq"] + 1 if commits else 0
        stage = os.path.join(versions_root,
                             f"_stage_{writer}_{uuid.uuid4().hex[:8]}")
        try:
            shutil.copytree(src, stage)
        except (FileNotFoundError, shutil.Error):
            # source pruned mid-copy by a concurrent publish: re-check
            # retention on the next attempt (raises cleanly if gone)
            shutil.rmtree(stage, ignore_errors=True)
            continue
        perm = f"v{as_version}_restore_{uuid.uuid4().hex[:8]}"
        os.rename(stage, os.path.join(versions_root, perm))
        if try_commit(_commits_dir(versions_root), seq,
                      {"op": "upsert", "version": as_version,
                       "version_name": perm, "writer": writer,
                       "restored_from": version}):
            commits, _ = _journal_state(versions_root)
            _publish_commit(target_dir, versions_root, commits,
                            keep_versions)
            return perm
        shutil.rmtree(os.path.join(versions_root, perm),
                      ignore_errors=True)
    raise RuntimeError(
        f"restore of version {version} lost 24 consecutive CAS races")


VACUUM_RETENTION_FLOOR_S = 300.0


def vacuum_upsert_target(target_dir: str,
                         older_than_seconds: float = VACUUM_RETENTION_FLOOR_S,
                         keep_versions: int = 2,
                         force: bool = False,
                         dry_run: bool = False) -> list[str]:
    """VACUUM: reclaim snapshot dirs no retained commit references —
    crash-orphaned staging dirs, lost-race leftovers, and snapshots of
    retired commits. Age-gated (mtime) so a concurrent writer's staged
    snapshot that has not yet won its CAS is never deleted while
    in-flight — the same retention contract as Delta's VACUUM. Returns
    the removed dir names. ``dry_run=True`` returns what WOULD be
    removed without touching anything — Delta's ``VACUUM ... DRY RUN``.

    Retention below the floor requires ``force=True`` (VERDICT r5
    item 5 — Delta's retentionDurationCheck): a default call can never
    reclaim a snapshot another writer staged seconds ago.

    ``force`` waives the floor for RETIRED history only (dirs some
    journal entry names): reclaiming those early breaks at worst a
    time-travel reader. A dir NO journal entry names is different — it
    is either a crashed leftover or a LIVE transaction (a stage mid-
    write, or a renamed snapshot between its rename and its CAS), and
    deleting a live one corrupts a writer, so journal-unreferenced
    dirs keep the full floor regardless of ``force`` (r12 VERDICT item
    5 stress: an age-0 force VACUUM racing disjoint writers reaped
    their stages mid-write). Crashed leftovers still reclaim once they
    age past the floor. Delta draws the same line: only files the log
    doesn't reference wait out the retention period, because they may
    belong to an uncommitted transaction."""
    import os
    import shutil
    import time

    if older_than_seconds < VACUUM_RETENTION_FLOOR_S and not force:
        raise ValueError(
            f"VACUUM retention {older_than_seconds}s is below the "
            f"{VACUUM_RETENTION_FLOOR_S:.0f}s floor — a concurrent "
            f"writer's just-staged snapshot could be reclaimed mid-"
            f"commit; pass force=True to override deliberately")
    from .carry import pinned_targets, prune_version_dir

    versions_root = target_dir + "_versions"
    commits, _ = _journal_state(versions_root)
    referenced = _retained_names(commits, keep_versions)
    journaled = {c["version_name"] for c in commits}
    # published head: resolver handles both publish modes (symlink or
    # pointer/journal); only a head INSIDE the versions root pins a
    # dir. realpath BOTH sides — the resolver returns a fully-resolved
    # path in symlink mode, and a symlinked parent (e.g. /tmp on some
    # systems) would otherwise silently unpin the live head
    _pub = resolve_published_snapshot(target_dir)
    published = os.path.basename(_pub) \
        if os.path.realpath(os.path.dirname(os.path.abspath(_pub))) == \
        os.path.realpath(versions_root) else None
    # manifest-carry reachability (Delta VACUUM's rule): a retired
    # dir's physical file stays as long as any retained version's (or
    # the published head's) carry manifest references it — deleting it
    # would corrupt live snapshots, not just history
    pinned = pinned_targets(
        versions_root,
        referenced | ({published} if published else set()))
    removed = []
    now = time.time()
    for name in sorted(os.listdir(versions_root)):
        if name.startswith("_commits") or name.endswith(".json"):
            continue
        if name in referenced or name == published:
            continue
        path = os.path.join(versions_root, name)
        if not os.path.isdir(path):
            continue
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue          # a concurrent reclaim beat us to it
        if age < older_than_seconds:
            continue
        if name not in journaled and age < VACUUM_RETENTION_FLOOR_S:
            continue          # possibly in-flight — see docstring
        if prune_version_dir(versions_root, name, pinned,
                             dry_run=dry_run):
            removed.append(name)
    return removed


def read_upsert_changes(spark, target_dir: str, v_from: int, v_to: int,
                        key_cols: list[str]) -> DataFrame:
    """Change-feed read: row-level changes between two retained versions
    — Delta CDF's `table_changes(v_from, v_to)` contract on the mini
    format. One key-equi FULL OUTER join of the two snapshots (the
    cdc_snapshot_diff plan shape: shuffle on the key, payload compared
    in-plan), emitting `insert` / `delete` rows and
    `update_preimage`/`update_postimage` row PAIRS for changed keys;
    unchanged keys emit nothing. At 100 TB both sides partition on the
    same key and the join never broadcasts (snapshots are table-sized);
    the output is change-sized.

    Schema evolution (VERDICT r5 item 3): ``v_from`` and ``v_to`` may
    have different payload schemas — the upsert sink accepts batches
    with added columns — so both sides are projected to the MERGED
    payload schema with typed nulls for absent columns (post's column
    order first, pre-only columns appended; post's type wins on a
    widened column), the Delta CDF contract.

    Changed-files-only scan (round 10): incremental commits carry
    untouched files into the next version under their original names
    (hard links), so a file whose NAME appears in BOTH version dirs is
    byte-identical and can contribute no change rows — the diff reads
    only each side's name-unique files, the streaming CDF source's
    trick applied to the batch feed. A full-rewrite chain (or an
    OPTIMIZE between the versions) shares no names and degrades to the
    full two-snapshot diff, which is what it rewrote anyway."""
    import os

    from pyspark.sql import functions as F

    pre = read_upsert_version(spark, target_dir, v_from)
    post = read_upsert_version(spark, target_dir, v_to)
    versions_root = target_dir + "_versions"
    d_from = _resolve_version_dir(versions_root, v_from)
    d_to = _resolve_version_dir(versions_root, v_to)
    if d_from and d_to:
        f_from = set(_snapshot_data_files(d_from))
        f_to = set(_snapshot_data_files(d_to))
        u_from = sorted(f_from - f_to)
        u_to = sorted(f_to - f_from)
        # keep the full-dir frames' schemas (snapshots are
        # schema-uniform — evolution forces a full rewrite), read only
        # the name-unique files; an empty unique side means that side
        # contributes nothing (pure-insert / pure-delete transitions)
        pre = (_snapshot_read(spark, target_dir, d_from, files=u_from)
               if u_from else pre.limit(0))
        post = (_snapshot_read(spark, target_dir, d_to, files=u_to)
                if u_to else post.limit(0))
    pre_t, post_t = dict(pre.dtypes), dict(post.dtypes)
    payload = [c for c in post.columns if c not in key_cols]
    payload += [c for c in pre.columns
                if c not in key_cols and c not in payload]
    ptype = {c: post_t.get(c, pre_t.get(c)) for c in payload}

    def side_cols(df, tag):
        return [
            (F.col(c).cast(ptype[c]) if c in df.columns
             else F.lit(None).cast(ptype[c])).alias(f"_{tag}_{c}")
            for c in payload]

    p = pre.select(*key_cols, F.lit(True).alias("_pre_exists"),
                   *side_cols(pre, "pre"))
    q = post.select(*key_cols, F.lit(True).alias("_post_exists"),
                    *side_cols(post, "post"))
    j = p.join(q, key_cols, "full_outer")
    pre_struct = F.struct(*[F.col(f"_pre_{c}").alias(c) for c in payload])
    post_struct = F.struct(*[F.col(f"_post_{c}").alias(c) for c in payload])
    has_pre = F.col("_pre_exists").isNotNull()
    has_post = F.col("_post_exists").isNotNull()
    changes = (
        F.when(~has_pre, F.array(
            F.struct(F.lit("insert").alias("change_type"),
                     post_struct.alias("img"))))
        .when(~has_post, F.array(
            F.struct(F.lit("delete").alias("change_type"),
                     pre_struct.alias("img"))))
        .when(~pre_struct.eqNullSafe(post_struct), F.array(
            F.struct(F.lit("update_preimage").alias("change_type"),
                     pre_struct.alias("img")),
            F.struct(F.lit("update_postimage").alias("change_type"),
                     post_struct.alias("img"))))
        .otherwise(F.array().cast(
            f"array<struct<change_type:string,img:struct<"
            + ",".join(f"{c}:{ptype[c]}" for c in payload)
            + ">>>"))
    )
    return (
        j.select(*key_cols, F.explode(changes).alias("ch"))
        .select(*key_cols, F.col("ch.change_type").alias("change_type"),
                *[F.col(f"ch.img.{c}").alias(c) for c in payload])
    )


def _zorder_oracle_sql() -> str:
    """DuckDB restatement of the Morton interleave over (user_id%256,
    event_id%256) — unrolled shift/mask/or terms mirroring
    ``_interleave_bits`` bit-for-bit (dimension j's bit b lands at
    ``b*k + j``), so the oracle pins the production kernel's exact bit
    layout, not just some z-like ordering."""
    terms = []
    for b in range(8):
        terms.append(f"((((user_id % 256) >> {b}) & 1) << {2 * b})")
        terms.append(f"((((event_id % 256) >> {b}) & 1) << {2 * b + 1})")
    z = " | ".join(terms)
    return f"""
    SELECT event_id, user_id, CAST({z} AS BIGINT) AS zval
    FROM events
    ORDER BY zval, event_id
    LIMIT 64
    """


@_catalog_register("maintenance_zorder_interleave",
                   oracle=_zorder_oracle_sql())
def maintenance_zorder_interleave(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The OPTIMIZE ZORDER clustering kernel as an oracled relation:
    Morton-interleave two 8-bit ranks derived from events (user_id%256,
    event_id%256) through the SAME ``_interleave_bits`` expression tree
    the snapshot rewrite sorts by, and return the curve's first 64
    points. The equi-depth cut selection is pinned separately by
    ``test_optimize_zorder_clusters_files`` (a file-stats clustering
    assertion — quantile sketches aren't bit-reproducible across
    engines, bit interleaving is)."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    z = _interleave_bits([(F.col("user_id") % 256).cast("long"),
                          (F.col("event_id") % 256).cast("long")], 8)
    return (ev.select("event_id", "user_id",
                      z.cast("long").alias("zval"))
            .orderBy("zval", "event_id").limit(64))


def _cdc_target_root(sf_dir: str) -> str:
    from ..fsutil import query_workspace

    return query_workspace("cdc_upsert", sf_dir)


@_catalog_register(
    "cdc_upsert_changes",
    oracle="""
    WITH pre AS (
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0 AND user_id < 100)
      WHERE rn = 1
    ),
    post AS (
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    )
    SELECT * FROM (
      SELECT p.user_id, 'insert' AS change_type,
             p.event_id, p.event_type, p.value
      FROM post p LEFT JOIN pre q USING (user_id)
      WHERE q.user_id IS NULL
      UNION ALL
      SELECT q.user_id, 'update_preimage', q.event_id, q.event_type, q.value
      FROM pre q JOIN post p USING (user_id) WHERE p.event_id <> q.event_id
      UNION ALL
      SELECT p.user_id, 'update_postimage', p.event_id, p.event_type, p.value
      FROM pre q JOIN post p USING (user_id) WHERE p.event_id <> q.event_id
    ) ORDER BY user_id, change_type
    """,
)
def cdc_upsert_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed read between two committed upsert versions, with an
    OPTIMIZE compaction in between (the compacted snapshot must serve
    the same version number through the journal): version 0 upserts the
    keep-latest state of even-id events for user_id < 100; version 1
    upserts everything else; the feed v0→v1 is `insert` rows for users
    first seen in v1 and update pre/post image pairs for users whose
    latest event is odd — which the oracle restates directly from the
    events table with arg_max. Version 0 is a session-cached shared
    base (identical every run) SHALLOW-CLONEd into the run workspace;
    the v1 commit, the OPTIMIZE, and the feed read — the operators
    under test — run fresh each time."""
    import os
    import shutil

    from ..sources.tables import load_table

    root = _cdc_target_root(sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    is_b0 = (F.col("event_id") % 2 == 0) & (F.col("user_id") < 100)
    b1 = ev.filter(~is_b0)

    def _build(base: str) -> None:
        upsert_commit_batch(ev.filter(is_b0), base, 0,
                            key_cols=["user_id"], order_col="event_id",
                            keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "cdc_upsert", _build),
                       target)
    upsert_commit_batch(b1, target, 1, key_cols=["user_id"],
                        order_col="event_id", keep_versions=4)
    optimize_upsert_target(spark, target, keep_versions=4)
    return (
        read_upsert_changes(spark, target, 0, 1, ["user_id"])
        .select("user_id", "change_type", "event_id", "event_type", "value")
        .orderBy("user_id", "change_type")
    )


@_catalog_register(
    "cdc_schema_evolution_changes",
    oracle="""
    WITH pre AS (
      SELECT user_id, event_id, event_type,
             CAST(NULL AS DOUBLE) AS value FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0 AND user_id < 100)
      WHERE rn = 1
    ),
    win AS (
      SELECT user_id, max(event_id) AS event_id FROM events GROUP BY user_id
    ),
    post AS (
      SELECT e.user_id, e.event_id, e.event_type,
             CASE WHEN e.event_id % 2 = 0 AND e.user_id < 100
                  THEN CAST(NULL AS DOUBLE) ELSE e.value END AS value
      FROM events e JOIN win ON e.user_id = win.user_id
                            AND e.event_id = win.event_id
    )
    SELECT * FROM (
      SELECT p.user_id, 'insert' AS change_type,
             p.event_id, p.event_type, p.value
      FROM post p LEFT JOIN pre q USING (user_id)
      WHERE q.user_id IS NULL
      UNION ALL
      SELECT q.user_id, 'update_preimage', q.event_id, q.event_type, q.value
      FROM pre q JOIN post p USING (user_id) WHERE p.event_id <> q.event_id
      UNION ALL
      SELECT p.user_id, 'update_postimage', p.event_id, p.event_type, p.value
      FROM pre q JOIN post p USING (user_id) WHERE p.event_id <> q.event_id
    ) ORDER BY user_id, change_type
    """,
)
def cdc_schema_evolution_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed ACROSS a schema evolution (VERDICT r5 item 3 as an
    oracled relation): version 0 upserts even-id events for
    user_id < 100 WITHOUT the ``value`` column; version 1 upserts the
    remaining events WITH it — the merge unions schemas (old rows get
    null value), and the feed projects both versions to the evolved
    payload schema, so pre-images carry a typed null ``value``. The
    oracle restates it from the events table: a user's pre row is their
    latest even event (null value); their post row is their overall
    latest event, whose value is visible only when the winning row
    arrived in the evolved batch. Version 0 (pre-evolution schema) is a
    session-cached shared base cloned per run; the schema-evolving v1
    commit and the feed read run fresh each time."""
    import os
    import shutil

    from ..sources.tables import load_table

    root = _cdc_target_root(sf_dir) + "_sev"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    is_b0 = (F.col("event_id") % 2 == 0) & (F.col("user_id") < 100)
    b1 = ev.filter(~is_b0)                    # evolved: adds `value`

    def _build(base: str) -> None:
        # pre-evolution schema: no `value` column
        upsert_commit_batch(ev.filter(is_b0).drop("value"), base, 0,
                            key_cols=["user_id"], order_col="event_id",
                            keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "cdc_sev", _build),
                       target)
    upsert_commit_batch(b1, target, 1, key_cols=["user_id"],
                        order_col="event_id", keep_versions=4)
    return (
        read_upsert_changes(spark, target, 0, 1, ["user_id"])
        .select("user_id", "change_type", "event_id", "event_type", "value")
        .orderBy("user_id", "change_type")
    )


MERGE_INTO_CUTOFF = "1999-01-01 00:00:00"


@_catalog_register(
    "merge_into_conditional_orders",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey AS k, o_totalprice AS price,
             o_orderdate >= TIMESTAMP '{MERGE_INTO_CUTOFF}' AS is_src,
             row_number() OVER (
               PARTITION BY o_custkey,
                            o_orderdate >= TIMESTAMP '{MERGE_INTO_CUTOFF}'
               ORDER BY o_orderkey DESC) AS rn
      FROM orders
    ),
    base AS (SELECT k, price FROM ranked WHERE rn = 1 AND NOT is_src),
    src  AS (SELECT k, price FROM ranked WHERE rn = 1 AND is_src),
    merged AS (
      SELECT COALESCE(b.k, s.k) AS k,
             CASE
               WHEN b.k IS NOT NULL AND s.k IS NOT NULL THEN
                 CASE WHEN s.price < 50000 THEN NULL          -- DELETE
                      WHEN s.price > b.price THEN s.price     -- UPDATE
                      ELSE b.price END                        -- carry
               WHEN b.k IS NULL THEN
                 CASE WHEN s.price >= 100000 THEN s.price END -- INSERT?
               ELSE b.price END AS price                      -- target-only
      FROM base b FULL OUTER JOIN src s ON b.k = s.k
    )
    SELECT CAST(FLOOR(price / 100000) AS BIGINT) AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST((price) AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM merged WHERE price IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def merge_into_conditional_orders(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """General MERGE INTO on the table format under the value-hash
    gate: the latest pre-cutoff order per customer is committed as the
    table, the latest post-cutoff order per customer is the MERGE
    source, and the three conditional clauses all fire —

      WHEN MATCHED AND s.price < 50000          THEN DELETE
      WHEN MATCHED AND s.price > t.price        THEN UPDATE SET *
      WHEN NOT MATCHED AND s.price >= 100000    THEN INSERT *

    — through upsert_merge_into's CAS-journaled copy-on-write commit
    (the general form of which the keep-latest upsert and DELETE WHERE
    are fixed special cases). The published table is then banded by
    price and aggregated; the oracle replays the identical clause
    cascade as a CASE over the full-outer join. Clause misfires
    (deleting on the wrong side of the threshold, updating downward,
    inserting below the floor) shift rows between bands and fail the
    hash. The pre-cutoff target table is a session-cached shared base
    cloned per run; the MERGE itself — the operator under test — runs
    fresh each time."""
    import os
    import shutil

    from pyspark.sql import Window

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("merge_into", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    cutoff = F.lit(MERGE_INTO_CUTOFF).cast("timestamp")

    def _build(base: str) -> None:
        upsert_commit_batch(
            o.filter(F.col("o_orderdate") < cutoff)
            .select("o_custkey", "o_orderkey", "o_totalprice"),
            base, 0, key_cols=["o_custkey"], order_col="o_orderkey",
            keep_versions=2)

    clone_upsert_table(shared_base_table(sf_dir, "merge_into", _build),
                       target)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    src = (o.filter(F.col("o_orderdate") >= cutoff)
           .withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select("o_custkey", "o_totalprice"))
    upsert_merge_into(
        spark, target, 1, src, key_cols=["o_custkey"],
        source_unique=True,  # keep-latest window over the key
        matched_delete="s.o_totalprice < 50000",
        matched_update="s.o_totalprice > t.o_totalprice",
        not_matched_insert="s.o_totalprice >= 100000",
        keep_versions=2)
    return (
        read_upsert_version(spark, target)
        .groupBy(F.floor(F.col("o_totalprice") / 100000)
                 .alias("price_band"))
        .agg(F.count("*").cast("bigint").alias("n_customers"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .orderBy("price_band")
    )


def _update_where_oracle_sql() -> str:
    from ..functions.numeric import dec_sum_expr
    return f"""
    WITH e AS (SELECT event_id, user_id, event_type, value
               FROM events WHERE event_id % 4 = 1),
    h AS (SELECT *,
                 (CASE WHEN event_id % 10 = 0 THEN NULL
                       ELSE event_type END) = 'click' AS is_hit
          FROM e),
    u AS (SELECT event_type,
                 CASE WHEN is_hit THEN 0 - value ELSE value END AS value,
                 CASE WHEN is_hit THEN user_id + 7
                      ELSE user_id END AS user_id
          FROM h)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dec_sum_expr('value')} AS sum_value,
           CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM u GROUP BY event_type ORDER BY event_type
    """


@_catalog_register("dml_update_where_events",
                   oracle=_update_where_oracle_sql())
def dml_update_where_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... SET ... WHERE on the table format under the
    value-hash gate — the DML triad's third leg next to
    merge_into_conditional_orders and the DELETE legs. A quarter slice
    of events is the committed table (session-cached shared base,
    cloned per run); the per-run UPDATE negates ``value`` and shifts
    ``user_id`` for click events, through a predicate that is NULL for
    every 10th event_id — SQL three-valued UPDATE must leave those
    clicks untouched (the oracle's CASE falls to ELSE on NULL). Both
    SETs read the OLD row; a sequential-assignment bug (user_id seeing
    the updated value) or a NULL-predicate update shifts the sums and
    fails the hash."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..functions.numeric import dec_sum
    from ..sources.tables import load_table

    root = query_workspace("update_where", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 4 == 1)
          .select("event_id", "user_id", "event_type", "value")
          .withColumn("ord", F.lit(0)))

    def _build(base: str) -> None:
        upsert_commit_batch(ev, base, 0, key_cols=["event_id"],
                            order_col="ord", keep_versions=2)

    clone_upsert_table(shared_base_table(sf_dir, "upd_where", _build),
                       target)
    upsert_update_where(
        spark, target, 1,
        "CASE WHEN event_id % 10 = 0 THEN NULL "
        "ELSE event_type END = 'click'",
        {"value": "0 - value", "user_id": "user_id + 7"},
        key_cols=["event_id"], keep_versions=2)
    return (
        read_upsert_version(spark, target)
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_rows"),
             dec_sum("value").alias("sum_value"),
             F.sum("user_id").cast("bigint").alias("sum_users"))
        .orderBy("event_type")
    )


def _generated_col_oracle_sql() -> str:
    return """
    WITH o AS (
      SELECT o_custkey, o_totalprice FROM (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders WHERE o_custkey <= 300) WHERE rn = 1
    ),
    upd AS (
      SELECT o_custkey,
             CASE WHEN o_totalprice < 50000 THEN o_totalprice * 4
                  ELSE o_totalprice END AS o_totalprice
      FROM o
    ),
    final AS (
      SELECT o_custkey, o_totalprice,
             CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS price_band
      FROM upd
    )
    SELECT price_band, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price,
           TRUE AS generation_enforced
    FROM final GROUP BY price_band ORDER BY price_band
    """


@_catalog_register("table_generated_column_bands",
                   oracle=_generated_col_oracle_sql())
def table_generated_column_bands(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns under the value-hash gate:
    ``price_band = floor(o_totalprice / 100000)`` is declared before
    the first commit, the committed batch OMITS the column (the write
    path must compute it), an UPDATE WHERE quadruples sub-50k prices
    (the band must RECOMPUTE on the updated rows — Delta's
    recompute-on-update contract), and a batch supplying a WRONG band
    value must be refused with the journal unmoved. The output groups
    by the generated column itself, so a stale band after the UPDATE
    or a skipped computation shifts rows between groups and fails the
    hash; the enforcement flag pins the wrong-value refusal."""
    import os
    import shutil

    from pyspark.sql import Window

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("gen_col", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") <= 300)
         .select("o_custkey", "o_orderkey", "o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").desc())
    latest = (o.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))

    def _build(base: str) -> None:
        set_table_generated_column(
            spark, base, "price_band",
            "cast(floor(o_totalprice / 100000) as bigint)")
        upsert_commit_batch(latest, base, 0, key_cols=["o_custkey"],
                            order_col="o_orderkey", keep_versions=2)

    clone_upsert_table(shared_base_table(sf_dir, "gen_col", _build),
                       target)
    upsert_update_where(spark, target, 1, "o_totalprice < 50000",
                        {"o_totalprice": "o_totalprice * 4"},
                        key_cols=["o_custkey"], keep_versions=2)
    enforced = False
    try:
        upsert_commit_batch(
            latest.limit(20).withColumn("price_band", F.lit(-1)),
            target, 2, key_cols=["o_custkey"], order_col="o_orderkey",
            keep_versions=2)
    except GeneratedColumnViolation:
        enforced = True
    return (
        read_upsert_version(spark, target)
        .groupBy("price_band")
        .agg(F.count("*").cast("bigint").alias("n_customers"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .withColumn("generation_enforced", F.lit(enforced))
        .orderBy("price_band")
    )


IDENTITY_START, IDENTITY_STEP = 1000, 2


@_catalog_register(
    "table_identity_column_ids",
    oracle="""
    SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_rows,
           TRUE AS ids_unique, TRUE AS above_start,
           TRUE AS step_aligned, TRUE AS disjoint_allocations
    FROM events WHERE event_id % 6 = 3
    """,
)
def table_identity_column_ids(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY under the value-hash gate. The
    VALUES are deliberately not pinned — identity allocation is
    sparse and partitioning-dependent (Delta's documented contract:
    unique, gap-tolerant, not consecutive) — so the oracle pins the
    INVARIANTS that make the feature correct: every row got an id,
    ids are globally unique across two commits (the second allocated
    on a SHALLOW CLONE, whose journal entry must carry the source's
    high-water mark), every id respects START WITH, every id is
    STEP-aligned, and the second commit's allocations all sit above
    the first commit's maximum (ranges never overlap). A collision,
    a rewound mark after the clone, or a misaligned allocation flips
    a flag and fails the hash."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("identity_col", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 6 == 3)
          .select("event_id", "user_id", "event_type")
          .withColumn("ord", F.lit(0)))
    # halves of the slice by event_id % 12 ∈ {3, 9} — a modular split
    # so BOTH commits are non-empty at every scale factor
    b0 = ev.filter(F.col("event_id") % 12 == 3)

    def _build(base: str) -> None:
        set_table_identity_column(base, "row_uid",
                                  start=IDENTITY_START,
                                  step=IDENTITY_STEP)
        upsert_commit_batch(b0, base, 0, key_cols=["event_id"],
                            order_col="ord", keep_versions=4)

    clone_upsert_table(
        shared_base_table(sf_dir, "identity_col", _build), target)
    upsert_commit_batch(ev.join(b0.select("event_id"), "event_id",
                                "left_anti"),
                        target, 1, key_cols=["event_id"],
                        order_col="ord", keep_versions=4)
    v0 = read_upsert_version(spark, target, 0)
    tbl = read_upsert_version(spark, target)
    v0_max = v0.agg(F.max("row_uid")).first()[0]
    new_min = (tbl.join(v0.select("event_id"), "event_id", "left_anti")
               .agg(F.min("row_uid")).first()[0])
    return (
        tbl.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.count("*") == F.countDistinct("row_uid"))
            .alias("ids_unique"),
            (F.min("row_uid") >= IDENTITY_START).alias("above_start"),
            (F.max((F.col("row_uid") - IDENTITY_START)
                   % IDENTITY_STEP) == 0).alias("step_aligned"))
        .withColumn("disjoint_allocations",
                    F.lit(bool(new_min is not None and v0_max is not None
                               and new_min > v0_max)))
        .select("n_rows", "ids_unique", "above_start", "step_aligned",
                "disjoint_allocations")
    )


def _as_of_ts_oracle_sql() -> str:
    from ..functions.numeric import dec_sum_expr
    return f"""
    WITH e AS (SELECT user_id, event_id, value FROM events
               WHERE event_id % 5 = 0),
    v0 AS (
      SELECT user_id, event_id, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY event_id DESC) AS rn
        FROM e WHERE event_id % 2 = 0) WHERE rn = 1
    ),
    head AS (
      SELECT user_id, event_id, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY event_id DESC) AS rn
        FROM e) WHERE rn = 1
    )
    SELECT snapshot, n_rows, sum_events, sum_value FROM (
      SELECT 'asof_v0' AS snapshot, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(event_id) AS BIGINT) AS sum_events,
             {dec_sum_expr('value')} AS sum_value
      FROM v0
      UNION ALL
      SELECT 'head', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(event_id) AS BIGINT), {dec_sum_expr('value')}
      FROM head
    ) ORDER BY snapshot
    """


@_catalog_register("time_travel_as_of_timestamp",
                   oracle=_as_of_ts_oracle_sql())
def time_travel_as_of_timestamp(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel under the value-hash gate: version
    0 (keep-latest of the even-event half of a fifth-slice) lands,
    version 1 upserts the rest, and the table is read back twice — AS
    OF a timestamp cut strictly between the two commit times (must
    resolve to v0's state) and AS OF now (must be the head). The cut
    is the midpoint of the two commit files' mtimes — the same clock
    the resolver uses, so the check is deterministic while the times
    themselves are not. A resolver that rounds the wrong way, compares
    against the wrong journal file, or counts maintenance entries
    lands on the wrong snapshot and shifts every aggregate."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..functions.numeric import dec_sum
    from ..sources.tables import load_table

    root = query_workspace("as_of_ts", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 5 == 0)
          .select("user_id", "event_id", "value"))

    def _build(base: str) -> None:
        upsert_commit_batch(ev.filter(F.col("event_id") % 2 == 0),
                            base, 0, key_cols=["user_id"],
                            order_col="event_id", keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "as_of_ts", _build),
                       target)
    upsert_commit_batch(ev.filter(F.col("event_id") % 2 == 1),
                        target, 1, key_cols=["user_id"],
                        order_col="event_id", keep_versions=4)
    mts = [mt for _, mt in _commit_mtimes(target + "_versions")]
    cut = (mts[0] + mts[1]) / 2

    def agg(df, tag: str) -> DataFrame:
        return (df.agg(F.count("*").cast("bigint").alias("n_rows"),
                       F.sum("event_id").cast("bigint")
                       .alias("sum_events"),
                       dec_sum("value").alias("sum_value"))
                .select(F.lit(tag).alias("snapshot"), "n_rows",
                        "sum_events", "sum_value"))

    import time
    return (
        agg(read_upsert_as_of_timestamp(spark, target, cut), "asof_v0")
        .unionAll(agg(read_upsert_as_of_timestamp(spark, target,
                                                  time.time()), "head"))
        .orderBy("snapshot")
    )


def _incremental_cow_oracle_sql() -> str:
    from ..functions.numeric import dec_sum_expr
    return f"""
    WITH e AS (SELECT event_id, event_type, value
               FROM events WHERE event_id % 4 = 0),
    b AS (SELECT MIN(event_id)
                 + (MAX(event_id) - MIN(event_id)) * 15 // 16 AS hi_cut
          FROM e),
    final AS (
      SELECT event_type,
             CASE WHEN event_id >= b.hi_cut THEN value * 2
                  ELSE value END AS value
      FROM e, b
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dec_sum_expr('value')} AS sum_value,
           TRUE AS files_reused
    FROM final GROUP BY event_type ORDER BY event_type
    """


@_catalog_register("maintenance_incremental_cow",
                   oracle=_incremental_cow_oracle_sql())
def maintenance_incremental_cow(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """File-granular copy-on-write under the value-hash gate: a quarter
    slice of events lands in two key-disjoint batches (the second must
    rewrite NOTHING — every first-batch file carries by hard link),
    then a third batch doubles the value of the top 1/16th of event_ids
    (confined to the second batch's files — the first batch's files
    must link again). The published table is aggregated by event_type;
    the oracle replays the update over the slice. ``files_reused`` is
    fed by the journal's per-commit rewrite/reuse split: it is TRUE
    only if batch 1 rewrote zero files while reusing ≥1 AND batch 2
    both rewrote ≥1 and reused ≥1 — a misrouted touched-file join
    (rewriting everything, or linking a file it should have rewritten)
    fails the flag or the hash respectively."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..functions.numeric import dec_sum
    from ..sources.tables import load_table

    root = query_workspace("incremental_cow", sf_dir)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 4 == 0)
          .select("event_id", "event_type", "value")
          .withColumn("ord", F.lit(0)))

    # the COW commit sequence (clone base → disjoint commit → confined
    # update) is the operator under test: every call re-runs it against
    # a clone of the session-cached version-0 base (run_serialized,
    # VERDICT r13 item 1 — fixture reusable, commits are not)
    def _run():
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
        mid = lo + (hi - lo) // 2
        cut = lo + (hi - lo) * 15 // 16

        # version 0 (first half of the slice) is identical every run: a
        # session-cached shared base, cloned here (the clone's journal
        # entry carries version 0 with files_rewritten=0, so the reuse
        # flag below still reads the two PER-RUN commits it pins)
        def _build(base: str) -> None:
            upsert_commit_batch(ev.filter(F.col("event_id") < mid),
                                base, 0, key_cols=["event_id"],
                                order_col="ord", keep_versions=2)

        clone_upsert_table(shared_base_table(sf_dir, "incr_cow",
                                             _build), target)
        # the harness table is tiny, so force the incremental plan past
        # the cost-based size cutover — the point here is pinning the
        # plan. Threaded as an ARGUMENT (not an os.environ mutation,
        # which is process-global and racy under concurrent catalog
        # queries — VERDICT r10 item 5)
        upsert_commit_batch(ev.filter(F.col("event_id") >= mid),
                            target, 1, key_cols=["event_id"],
                            order_col="ord", keep_versions=2,
                            incremental_min_bytes=0)
        upsert_commit_batch(
            ev.filter(F.col("event_id") >= cut)
            .withColumn("value", F.col("value") * 2)
            .withColumn("ord", F.lit(1)),
            target, 2, key_cols=["event_id"], order_col="ord",
            keep_versions=2, incremental_min_bytes=0)
        ops = {c["version"]: c for c in
               _journal_state(target + "_versions")[0]}
        return bool(
            ops[1].get("files_rewritten") == 0
            and ops[1].get("files_reused", 0) >= 1
            and ops[2].get("files_rewritten", 0) >= 1
            and ops[2].get("files_reused", 0) >= 1)

    from ..fsutil import run_serialized
    reused = run_serialized("incr_cow_seq", sf_dir, _run)
    return (
        read_upsert_version(spark, target)
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_rows"),
             dec_sum("value").alias("sum_value"))
        .withColumn("files_reused", F.lit(reused))
        .orderBy("event_type")
    )


# --- SHALLOW CLONE ----------------------------------------------------------

def clone_upsert_table(src_target: str, dst_target: str,
                       writer: str = "clone") -> str:
    """Delta's ``CREATE TABLE ... SHALLOW CLONE``: a new independent
    table whose first version REFERENCES the source head's data files
    instead of copying them — here as hard links, the same mechanism
    incremental commits use to carry untouched files (module comment
    above _snapshot_data_files). Zero data movement at any size; the
    clone then diverges freely (its commits rewrite only ITS touched
    files; retention/VACUUM on either table only unlinks its own
    names, and a shared inode lives until the last referencing
    version on either side is pruned).

    The clone's journal starts fresh (its own CAS namespace, its own
    batch-id replay domain) with one entry carrying the source head's
    version number and a ``cloned_from`` provenance field — DESCRIBE
    HISTORY on the clone shows where it came from; time travel works
    from the cloned version forward. Table METADATA travels with the
    clone too: CHECK constraints and generated-column declarations are
    copied (Delta's SHALLOW CLONE carries table properties and
    constraints — a clone of a constrained table starts constrained;
    drop them on the clone to diverge). Pure filesystem op, no Spark
    session needed. Raises FileExistsError if dst already exists."""
    import os
    import shutil
    import uuid

    from ..fsutil import read_commit_journal, try_commit

    src_root = src_target + "_versions"
    commits, _ = _journal_state(src_root)
    if not commits:
        raise FileNotFoundError(f"no upsert table at {src_target}")
    dst_root = dst_target + "_versions"
    if os.path.exists(dst_target) or (
            os.path.isdir(dst_root)
            and read_commit_journal(_commits_dir(dst_root))):
        raise FileExistsError(
            f"clone destination {dst_target} already exists")
    head = commits[-1]
    src_dir = os.path.join(src_root, head["version_name"])
    os.makedirs(dst_root, exist_ok=True)
    stage = os.path.join(dst_root, f"_stage_{writer}_{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    from .carry import CARRY_MANIFEST, read_carry, resolve_data_file
    src_carry = read_carry(src_dir)
    for root, dirs, files in os.walk(src_dir):
        # descend into partition subdirectories; skip hidden/marker dirs
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        rel = os.path.relpath(root, src_dir)
        for f in files:
            if f.startswith(".") or f in ("_SUCCESS", CARRY_MANIFEST):
                # data files + stats manifest travel; the carry
                # manifest must NOT — its targets are relative to the
                # SOURCE table's versions root (carried data files are
                # materialized below instead)
                continue
            src_f = os.path.join(root, f)
            dst_f = os.path.join(stage, f) if rel == "." \
                else os.path.join(stage, rel, f)
            os.makedirs(os.path.dirname(dst_f), exist_ok=True)
            try:
                os.link(src_f, dst_f)
            except OSError:
                shutil.copy2(src_f, dst_f)
    for relname in src_carry:
        # manifest-carried files of the source head: cross-table
        # pointers can't work (separate versions roots + retention
        # domains), so the clone materializes them — link, copy on
        # link-less filesystems
        dst_f = os.path.join(stage, relname)
        if os.path.exists(dst_f):
            continue                     # physically present too
        if os.path.dirname(relname):
            os.makedirs(os.path.dirname(dst_f), exist_ok=True)
        src_f = resolve_data_file(src_dir, relname, src_carry)
        try:
            os.link(src_f, dst_f)
        except OSError:
            shutil.copy2(src_f, dst_f)
    perm = f"v{head['version']}_clone_{uuid.uuid4().hex[:8]}"
    os.rename(stage, os.path.join(dst_root, perm))
    entry = {"op": "upsert", "version": head["version"],
             "version_name": perm, "writer": writer,
             "cloned_from": os.path.abspath(src_target),
             "files_rewritten": 0,
             "files_reused": len(_snapshot_data_files(
                 os.path.join(dst_root, perm)))}
    _src_ident = table_identity_column(src_target)
    if _src_ident:
        # allocation on the clone must continue ABOVE the cloned ids
        entry["identity_hwm"] = _identity_high_water(commits, _src_ident)
    if not try_commit(_commits_dir(dst_root), 0, entry):
        shutil.rmtree(os.path.join(dst_root, perm), ignore_errors=True)
        raise FileExistsError(
            f"clone destination {dst_target} was created concurrently")
    src_cons = table_check_constraints(src_target)
    if src_cons:
        from ..fsutil import atomic_write_json
        atomic_write_json(_constraints_path(dst_target), src_cons)
    src_gens = table_generated_columns(src_target)
    if src_gens:
        from ..fsutil import atomic_write_json
        atomic_write_json(_generated_path(dst_target), src_gens)
    src_ident = table_identity_column(src_target)
    if src_ident:
        from ..fsutil import atomic_write_json
        atomic_write_json(_identity_path(dst_target), src_ident)
    from .partitioning import _partitioning_path, table_partitioning
    src_parts = table_partitioning(src_target)
    if src_parts:
        from ..fsutil import atomic_write_json
        atomic_write_json(_partitioning_path(dst_target), src_parts)
    from .colmap import _colmap_path, _has_mapping, table_column_mapping
    src_map = table_column_mapping(src_target)
    if _has_mapping(src_map):
        from ..fsutil import atomic_write_json
        atomic_write_json(_colmap_path(dst_target), src_map)
    src_defaults = table_column_defaults(src_target)
    if src_defaults:
        from ..fsutil import atomic_write_json
        atomic_write_json(_defaults_path(dst_target), src_defaults)
    from .partitioning import _protocol_path, _read_protocol
    src_proto = _read_protocol(src_target)
    if src_proto["features"] or src_proto["writer_features"]:
        from ..fsutil import atomic_write_json
        atomic_write_json(_protocol_path(dst_target), src_proto)
    cms, _ = _journal_state(dst_root)
    _publish_commit(dst_target, dst_root, cms, keep_versions=2)
    return perm


# --- session-cached base tables (VERDICT r10 item 1) -------------------------

_SHARED_BASE_CACHE: dict[tuple[str, str], str] = {}


def shared_base_table(sf_dir: str, name: str, build) -> str:
    """Session-cached committed BASE table for catalog harnesses.

    The maintenance/CDC/MV/CDF catalog queries each need a
    pre-committed upsert table to exercise their delta operation
    (MERGE, DELETE WHERE, incremental commit, change-feed drain, MV
    refresh) against. The base is identical on every run — only the
    delta is the operator under test — so it is committed ONCE per
    (query family, sf_dir) per process into its own workspace, and
    every run layers its per-run work on a SHALLOW CLONE of it (hard
    links: O(file count), zero data movement) inside the run's own
    wiped workspace. Same session-cache pattern as the dedup family's
    shared shingle/pair caches (operators/dedup.py), applied to
    committed table state; bench stall-retries and repeat runs then
    pay only the delta commits, never the base rebuild.

    ``build(target)`` must commit the base's version(s) and any
    immutable metadata (e.g. CHECK constraints — carried to clones);
    it runs at most once per process per (name, sf_dir). The cache is
    re-validated against the journal on every hit, so an externally
    wiped tempdir rebuilds instead of erroring."""
    import os
    import shutil

    from ..fsutil import query_workspace

    key = (name, os.path.abspath(sf_dir))
    cached = _SHARED_BASE_CACHE.get(key)
    if cached is not None and _journal_state(cached + "_versions")[0]:
        return cached
    root = query_workspace(f"base_{name}", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    build(target)
    _SHARED_BASE_CACHE[key] = target
    return target


# --- CHECK constraints ------------------------------------------------------

_CONSTRAINTS_FILE = "_CONSTRAINTS.json"


def _constraints_path(target_dir: str) -> str:
    import os
    return os.path.join(target_dir + "_versions", _CONSTRAINTS_FILE)


def table_check_constraints(target_dir: str) -> dict[str, str]:
    """{name: sql_expr} of the table's CHECK constraints (empty if
    none). Stored beside the journal; read on every commit."""
    import json
    import os

    p = _constraints_path(target_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


class CheckConstraintViolation(ValueError):
    pass


def _validate_constraints(df, constraints: dict, what: str) -> None:
    """SQL CHECK semantics: a row violates iff the expression is FALSE
    — NULL (unknown) passes, as in every SQL engine. One pass over the
    INCOMING rows only (never the table), and only when constraints
    exist; the first violating row is surfaced in the error.

    A constraint entry is either a SQL expression string (CHECK) or
    ``{"kind": "not_null", "col": name}`` — NOT NULL is a DISTINCT
    constraint class precisely because CHECK's three-valued logic
    passes NULLs (``CHECK (col IS NOT NULL)`` would work, but SQL and
    Delta both model NOT NULL separately, and so does the metadata
    here). A NOT NULL column absent from the batch is a violation too
    (it would land as NULL through mergeSchema)."""
    from pyspark.sql import functions as F

    for name, expr in constraints.items():
        if isinstance(expr, dict) and expr.get("kind") == "not_null":
            col = expr["col"]
            if col not in df.columns:
                raise CheckConstraintViolation(
                    f"NOT NULL column {col!r} is absent from {what} — "
                    f"it would land as NULL through schema evolution")
            bad = df.filter(F.col(col).isNull()).limit(1).collect()
            if bad:
                raise CheckConstraintViolation(
                    f"NOT NULL constraint on {col!r} violated by "
                    f"{what}: first offending row {bad[0].asDict()!r}")
            continue
        try:
            bad = df.filter(F.expr(expr).isNotNull()
                            & ~F.expr(expr)).limit(1).collect()
        except Exception as exc:
            if "UNRESOLVED_COLUMN" in str(exc):
                raise CheckConstraintViolation(
                    f"CHECK constraint {name!r} ({expr}) references a "
                    f"column absent from {what} — supply the column or "
                    f"drop the constraint before this write") from exc
            raise
        if bad:
            raise CheckConstraintViolation(
                f"CHECK constraint {name!r} ({expr}) violated by {what}: "
                f"first offending row {bad[0].asDict()!r}")


def set_table_check_constraint(spark, target_dir: str, name: str,
                               expr: str) -> None:
    """ALTER TABLE ADD CONSTRAINT CHECK: validates the CURRENT snapshot
    first (Delta refuses to add a constraint existing data violates),
    then persists it; every subsequent upsert/MERGE validates its
    incoming rows before committing. Single-admin op (last write wins
    on the constraints file); the enforcement path is what multi-writer
    commits share."""
    import os

    from ..fsutil import atomic_write_json

    cons = table_check_constraints(target_dir)
    commits, _ = _journal_state(target_dir + "_versions")
    if commits:
        snap = _snapshot_read(spark, target_dir, os.path.join(
            target_dir + "_versions", commits[-1]["version_name"]))
        _validate_constraints(snap, {name: expr}, "existing table data")
    cons[name] = expr
    atomic_write_json(_constraints_path(target_dir), cons)
    from .partitioning import register_table_feature
    register_table_feature(target_dir, "check_constraints",
                           kind="writer")


def drop_table_check_constraint(target_dir: str, name: str) -> None:
    from ..fsutil import atomic_write_json

    cons = table_check_constraints(target_dir)
    cons.pop(name, None)
    atomic_write_json(_constraints_path(target_dir), cons)


def set_table_not_null(spark, target_dir: str, col: str) -> None:
    """ALTER TABLE ALTER COLUMN col SET NOT NULL. Distinct from CHECK
    (whose three-valued logic PASSES NULLs — ``CHECK (col IS NOT
    NULL)`` is exactly the constraint CHECK cannot express); stored in
    the same constraints file as a typed entry so every existing
    enforcement point (incoming batches, MERGE sources, UPDATE/MERGE
    post-images, RESTORE, overwrite batches) covers it with zero new
    plumbing. Like Delta, refused if existing data already violates."""
    import os

    from pyspark.sql import functions as F

    from ..fsutil import atomic_write_json
    from .partitioning import register_table_feature

    cons = table_check_constraints(target_dir)
    commits, _ = _journal_state(target_dir + "_versions")
    if commits:
        snap = _snapshot_read(spark, target_dir, os.path.join(
            target_dir + "_versions", commits[-1]["version_name"]))
        if col not in snap.columns:
            raise CheckConstraintViolation(
                f"cannot declare NOT NULL on {col!r}: not a column of "
                f"this table (columns: {snap.columns})")
        if snap.filter(F.col(col).isNull()).limit(1).collect():
            raise CheckConstraintViolation(
                f"existing table data has NULLs in {col!r} — repair "
                f"before declaring NOT NULL (Delta refuses the same "
                f"way)")
    cons[f"{col}__not_null"] = {"kind": "not_null", "col": col}
    atomic_write_json(_constraints_path(target_dir), cons)
    register_table_feature(target_dir, "not_null_constraints",
                           kind="writer")


def drop_table_not_null(target_dir: str, col: str) -> None:
    drop_table_check_constraint(target_dir, f"{col}__not_null")


# --- column DEFAULT values --------------------------------------------------

_DEFAULTS_FILE = "_DEFAULTS.json"


def _defaults_path(target_dir: str) -> str:
    import os
    return os.path.join(target_dir + "_versions", _DEFAULTS_FILE)


def table_column_defaults(target_dir: str) -> dict[str, str]:
    """{column: sql_expr} DEFAULT declarations (empty if none)."""
    import json
    import os

    p = _defaults_path(target_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_table_column_default(target_dir: str, col: str,
                             expr: str) -> None:
    """ALTER TABLE ALTER COLUMN col SET DEFAULT expr — rows arriving
    WITHOUT the column (a batch omitting it, a MERGE INSERT whose
    source lacks it) get the expression instead of NULL. The
    expression must be evaluable without any input row (literals and
    deterministic functions — Delta's same restriction); existing data
    is never backfilled (SQL DEFAULT applies at write time)."""
    from ..fsutil import atomic_write_json
    from .partitioning import register_table_feature

    d = table_column_defaults(target_dir)
    d[col] = expr
    atomic_write_json(_defaults_path(target_dir), d)
    register_table_feature(target_dir, "column_defaults", kind="writer")


def drop_table_column_default(target_dir: str, col: str) -> None:
    from ..fsutil import atomic_write_json

    d = table_column_defaults(target_dir)
    d.pop(col, None)
    atomic_write_json(_defaults_path(target_dir), d)


def _apply_defaults(df, defaults: dict[str, str], types=None):
    """Fill columns the incoming frame OMITS with their DEFAULT
    expressions; supplied columns (even explicit NULLs) pass through —
    SQL DEFAULT semantics, applied before generated columns so a
    generated expression may reference a defaulted input.

    ``types`` ({col: DataType} of the CURRENT table snapshot, when the
    table has data) store-assignment-casts each fill to the table's
    existing column type, matching the MERGE insert path — a DEFAULT
    '0' on a double column must land as a double, not rely on union
    coercion. A defaulted column NEW to the table keeps the
    expression's natural type (it is defining the column)."""
    from pyspark.sql import functions as F

    for c, expr in defaults.items():
        if c not in df.columns:
            e = F.expr(expr)
            if types and c in types:
                e = e.cast(types[c])
            df = df.withColumn(c, e)
    return df


def _current_table_types(spark, target_dir: str) -> dict:
    """{col: DataType} of the table's current snapshot, {} before the
    first commit — feeds the DEFAULT-fill store-assignment cast."""
    import os

    versions_root = target_dir + "_versions"
    try:
        commits, _ = _journal_state(versions_root)
    except Exception:
        return {}
    if not commits:
        return {}
    base_dir = os.path.join(versions_root, commits[-1]["version_name"])
    try:
        snap = _snapshot_read(spark, target_dir, base_dir)
    except Exception:
        return {}
    return {f.name: f.dataType for f in snap.schema.fields}


# --- generated columns ------------------------------------------------------

_GENERATED_FILE = "_GENERATED.json"


def _generated_path(target_dir: str) -> str:
    import os
    return os.path.join(target_dir + "_versions", _GENERATED_FILE)


def table_generated_columns(target_dir: str) -> dict[str, str]:
    """{name: sql_expr} of the table's GENERATED ALWAYS AS columns
    (empty if none). Stored beside the journal like CHECK constraints;
    read on every commit."""
    import json
    import os

    p = _generated_path(target_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


class GeneratedColumnViolation(ValueError):
    pass


def _apply_generated(df, gens: dict[str, str], what: str):
    """Delta's generated-column write contract: a batch that OMITS the
    column gets it computed from the expression; a batch that SUPPLIES
    it must match the expression exactly (null-safe) or the write is
    refused. Applied in declaration order so a generated column may
    reference an earlier one. The expression must resolve against the
    batch's columns — a MERGE source missing a dependency fails loudly
    rather than silently NULL-filling."""
    from pyspark.sql import functions as F

    for name, expr in gens.items():
        e = F.expr(expr)
        if name not in df.columns:
            df = df.withColumn(name, e)
            continue
        bad = df.filter(~F.col(name).eqNullSafe(e)).limit(1).collect()
        if bad:
            raise GeneratedColumnViolation(
                f"generated column {name!r} (ALWAYS AS {expr}) "
                f"supplied with a non-matching value by {what}: first "
                f"offending row {bad[0].asDict()!r}")
    return df


def set_table_generated_column(spark, target_dir: str, name: str,
                               expr: str) -> None:
    """Declare ``name GENERATED ALWAYS AS (expr)``. Like Delta, the
    declaration belongs at table creation (before the first commit);
    on a table with data it is accepted ONLY if the head already
    satisfies ``name <=> expr`` for every row — generated columns
    never backfill (that would be a disguised table rewrite; run an
    explicit UPDATE first if that is what you want)."""
    import os

    from pyspark.sql import functions as F

    from ..fsutil import atomic_write_json

    gens = table_generated_columns(target_dir)
    commits, _ = _journal_state(target_dir + "_versions")
    if commits:
        snap = _snapshot_read(spark, target_dir, os.path.join(
            target_dir + "_versions", commits[-1]["version_name"]))
        if name not in snap.columns:
            raise GeneratedColumnViolation(
                f"column {name!r} absent from existing table data — "
                f"generated columns never backfill; declare before the "
                f"first commit, or add the column with an explicit "
                f"UPDATE/upsert first")
        bad = snap.filter(~F.col(name).eqNullSafe(F.expr(expr))) \
            .limit(1).collect()
        if bad:
            raise GeneratedColumnViolation(
                f"existing table data violates {name!r} ALWAYS AS "
                f"{expr}: first offending row {bad[0].asDict()!r}")
    gens[name] = expr
    atomic_write_json(_generated_path(target_dir), gens)
    from .partitioning import register_table_feature
    register_table_feature(target_dir, "generated_columns",
                           kind="writer")


def drop_table_generated_column(target_dir: str, name: str) -> None:
    from ..fsutil import atomic_write_json

    gens = table_generated_columns(target_dir)
    gens.pop(name, None)
    atomic_write_json(_generated_path(target_dir), gens)


# --- IDENTITY columns -------------------------------------------------------

_IDENTITY_FILE = "_IDENTITY.json"


def _identity_path(target_dir: str) -> str:
    import os
    return os.path.join(target_dir + "_versions", _IDENTITY_FILE)


def table_identity_column(target_dir: str) -> dict | None:
    """{"name": ..., "start": ..., "step": ...} or None. One identity
    column per table (Delta's limit)."""
    import json
    import os

    p = _identity_path(target_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def set_table_identity_column(target_dir: str, name: str,
                              start: int = 1, step: int = 1) -> None:
    """Declare ``name GENERATED ALWAYS AS IDENTITY (START WITH start
    INCREMENT BY step)``. Creation-time only, like Delta: the table
    must have no commits yet (identity values can never backfill, and
    a retro-declared column could collide with existing data)."""
    from ..fsutil import atomic_write_json

    if step == 0:
        raise ValueError("identity INCREMENT BY must be non-zero")
    commits, _ = _journal_state(target_dir + "_versions")
    if commits:
        raise ValueError(
            "identity columns are declared at table creation — this "
            "table already has commits")
    atomic_write_json(_identity_path(target_dir),
                      {"name": name, "start": int(start),
                       "step": int(step)})
    from .partitioning import register_table_feature
    register_table_feature(target_dir, "identity_columns",
                           kind="writer")


def _identity_high_water(commits: list[dict], ident: dict) -> int:
    """The next unallocated identity ordinal: the last commit that
    allocated a range records its post-allocation mark; absent any,
    allocation starts at 0 ordinals (value = start). Reading it off
    the journal head makes allocation CAS-serialized for free — a
    writer that loses the race re-reads and re-allocates above the
    winner's mark, so ranges never overlap without any extra lock."""
    for c in reversed(commits):
        if "identity_hwm" in c:
            return c["identity_hwm"]
    return 0


def _assign_identity(df, ident: dict, hwm: int):
    """Assign identity values to every row of ``df`` from the ordinal
    range starting at ``hwm``, DISTRIBUTED: value = start + step ×
    (hwm + monotonically_increasing_id()), whose per-partition 33-bit
    blocks make values unique with ZERO coordination between tasks —
    no global row_number sort, no single-partition window. Ranges are
    sparse; Delta's identity contract explicitly allows gaps for the
    same reason (it burns id blocks per file). The expression is
    non-deterministic across plan re-evaluations, so the new
    high-water mark is derived from the STAGED FILES after the write
    (``_staged_identity_hwm``) — what was actually written governs,
    Delta's own read-back-from-stats order."""
    from pyspark.sql import functions as F

    name, start, step = ident["name"], ident["start"], ident["step"]
    ordinal = F.monotonically_increasing_id() + F.lit(hwm)
    return df.withColumn(
        name, (F.lit(start) + F.lit(step) * ordinal).cast("bigint"))


def _inherit_or_assign_identity(delta, existing, ident: dict, hwm: int,
                                key_cols: list[str]):
    """Delta's stable-identity contract on the keep-latest path: a
    delta row replacing an EXISTING key keeps that key's identity
    value (identity is assigned at INSERT and stable across updates —
    the same rule fill_identity gives MERGE's matched rows), so only
    genuinely new keys consume fresh allocations. ``existing`` need
    only cover the keys the delta can touch: the incremental commit
    passes the touched-file subset it already re-reads, keeping the
    inheritance join change-sized; the full-rewrite path passes the
    snapshot it is rewriting anyway. ``existing`` has unique keys by
    the format's invariant, so the left join cannot fan out."""
    from pyspark.sql import functions as F

    name = ident["name"]
    e = existing.select(*key_cols, F.col(name).alias("_ident_old")) \
        .alias("e")
    d = delta.alias("d")
    cond = None
    for k in key_cols:
        term = F.col(f"d.{k}").eqNullSafe(F.col(f"e.{k}"))
        cond = term if cond is None else (cond & term)
    j = d.join(e, cond, "left")
    dcols = [F.col(f"d.{c}") for c in delta.columns]
    have = (j.filter(F.col("e._ident_old").isNotNull())
            .select(*dcols, F.col("e._ident_old").alias(name)))
    fresh = _assign_identity(
        j.filter(F.col("e._ident_old").isNull()).select(*dcols),
        ident, hwm)
    return have.unionByName(fresh)


def _staged_identity_hwm(spark, staged_dir: str, ident: dict,
                         hwm: int, skip_files=()) -> int:
    """Post-allocation mark from the staged snapshot: one max() over
    the identity column of the REWRITTEN files only — ``skip_files``
    names the hard-linked carries, whose ids are ≤ the previous mark
    by induction (they were scanned when their own commit wrote them),
    so scanning them again would make every commit O(table) instead of
    O(changed data). Never below the previous mark (a keep-latest
    merge or DELETE can drop the max-id row; the mark must still never
    rewind, or a later allocation could collide with ids alive in
    retained history)."""
    import os

    from pyspark.sql import functions as F

    from .carry import resolve_data_files

    skip = set(skip_files)
    files = [f for f in _snapshot_data_files(staged_dir)
             if f not in skip]
    if not files:
        return hwm
    name, start, step = ident["name"], ident["start"], ident["step"]
    top = (spark.read.parquet(
        *resolve_data_files(staged_dir, files))
        .agg(F.max(F.expr(
            f"CAST((`{name}` - {start}) DIV {step} AS BIGINT)")))
        .first()[0])
    return max(hwm, int(top) + 1) if top is not None else hwm


CLONE_CUST_CAP = 200


@_catalog_register(
    "maintenance_clone_constraint",
    oracle=f"""
    WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
               WHERE o_custkey <= {CLONE_CUST_CAP}),
    src AS (
      SELECT o_custkey, o_totalprice FROM (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey DESC) AS rn
        FROM o WHERE o_orderkey % 2 = 0) WHERE rn = 1
    ),
    cl AS (
      SELECT o_custkey, o_totalprice FROM (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey DESC) AS rn
        FROM o) WHERE rn = 1
    )
    SELECT tbl, n_customers, sum_price, TRUE AS constraint_enforced
    FROM (
      SELECT 'clone' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_price
      FROM cl
      UNION ALL
      SELECT 'src', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
      FROM src
    ) ORDER BY tbl
    """,
)
def maintenance_clone_constraint(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SHALLOW CLONE + CHECK constraint under the value-hash gate: the
    latest even-orderkey order per small customer is committed as the
    source table with a ``o_totalprice > 0`` CHECK; the table is
    cloned (hard-linked first version), the CLONE absorbs the odd-
    orderkey orders (keep-latest — divergence must not leak back), and
    a negated-price batch against the SOURCE must be rejected by the
    constraint with the journal unmoved. The output aggregates BOTH
    tables (clone evolved, source frozen) plus the enforcement flag;
    clone/source cross-contamination or a constraint that lets the bad
    batch through shifts the aggregates or flips the flag. The
    constrained source table is a session-cached shared base; each run
    clones it TWICE (per-run src, then the dst divergence clone), so
    the run also pins that SHALLOW CLONE carries CHECK constraints —
    both the dst commit and the rejected src batch validate against
    the constraint that traveled with the clone."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("clone_constraint", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    src = os.path.join(root, "src")
    dst = os.path.join(root, "clone")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") <= CLONE_CUST_CAP)
         .select("o_custkey", "o_orderkey", "o_totalprice"))

    def _build(base: str) -> None:
        upsert_commit_batch(o.filter(F.col("o_orderkey") % 2 == 0),
                            base, 0, key_cols=["o_custkey"],
                            order_col="o_orderkey", keep_versions=2)
        set_table_check_constraint(spark, base, "price_pos",
                                   "o_totalprice > 0")

    base = shared_base_table(sf_dir, "clone_constraint", _build)
    clone_upsert_table(base, src)
    clone_upsert_table(src, dst)
    upsert_commit_batch(o.filter(F.col("o_orderkey") % 2 == 1),
                        dst, 1, key_cols=["o_custkey"],
                        order_col="o_orderkey", keep_versions=2)
    enforced = False
    try:
        upsert_commit_batch(
            o.limit(50).withColumn("o_totalprice", -F.col("o_totalprice")),
            src, 1, key_cols=["o_custkey"], order_col="o_orderkey",
            keep_versions=2)
    except CheckConstraintViolation:
        enforced = True

    def agg(path: str, tag: str) -> DataFrame:
        # head resolver, not a bare path read: works in pointer publish
        # mode and reads carried files in manifest mode
        return (read_upsert_version(spark, path)
                .agg(F.count("*").cast("bigint").alias("n_customers"),
                     F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                     .cast("double").alias("sum_price"))
                .select(F.lit(tag).alias("tbl"), "n_customers",
                        "sum_price"))
    return (
        agg(dst, "clone").unionAll(agg(src, "src"))
        .withColumn("constraint_enforced", F.lit(enforced))
        .orderBy("tbl")
    )


# --- PARTITIONED BY catalog queries (round 11) ------------------------------

@_catalog_register(
    "table_partitioned_dml",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, user_id % 4 AS bucket
      FROM events WHERE user_id < 400
    ),
    cand AS (
      SELECT * FROM e WHERE event_id % 2 = 0
      UNION ALL
      SELECT * FROM e WHERE user_id % 3 = 0
    ),
    merged AS (
      SELECT user_id, bucket, event_id FROM (
        SELECT user_id, bucket, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM cand) WHERE rn = 1
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(event_id) AS BIGINT) AS sum_events
    FROM merged WHERE bucket <> 3
    GROUP BY bucket ORDER BY bucket
    """,
)
def table_partitioned_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED BY table end-to-end under the value-hash gate: a
    Hive-layout events table (``bucket = user_id % 4``, declared
    bigint), a keep-latest upsert whose touched-file join prunes to the
    delta's own partitions (partition cols ⊆ merge key), and a
    METADATA-ONLY partition drop (``bucket = 3`` — zero rows read or
    written, pure hard-link staging). The oracle replays the
    keep-latest union and the partition delete relationally; a wrong
    partition parse, a mis-pruned touched-file set, or a drop that
    rewrote (and perturbed) data shifts the per-bucket sums and fails
    the hash. Partitioning metadata travels through the shared-base
    SHALLOW CLONE like constraints do."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table
    from .partitioning import set_table_partitioning

    root = query_workspace("part_dml", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 400)
          .select("user_id", "event_id",
                  (F.col("user_id") % 4).alias("bucket")))

    def _build(base: str) -> None:
        set_table_partitioning(base, {"bucket": "bigint"})
        upsert_commit_batch(
            ev.filter(F.col("event_id") % 2 == 0), base, 0,
            key_cols=["user_id", "bucket"], order_col="event_id",
            keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "part_dml", _build),
                       target)
    upsert_commit_batch(
        ev.filter(F.col("user_id") % 3 == 0), target, 1,
        key_cols=["user_id", "bucket"], order_col="event_id",
        keep_versions=4)
    upsert_drop_partitions(spark, target, 2, "bucket = 3",
                           keep_versions=4)
    return (
        read_upsert_version(spark, target)
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_users"),
             F.sum("event_id").cast("bigint").alias("sum_events"))
        .orderBy("bucket")
    )


@_catalog_register(
    "maintenance_partition_overwrite",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 2 = 0 AND o_orderpriority <> '1-URGENT'
    ),
    ow AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice * 2 AS o_totalprice
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0
    ),
    final AS (SELECT * FROM base UNION ALL SELECT * FROM ow)
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def maintenance_partition_overwrite(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE under the value-hash gate: orders
    committed PARTITIONED BY o_orderpriority (a string partition column
    with spaces — exercising Hive escaping end to end), then one
    partition ('1-URGENT') replaced wholesale by a recomputed batch
    (doubled prices, a different orderkey slice) while every other
    partition carries by hard link. The oracle replays the replace
    relationally: untouched priorities keep the base slice, the
    replaced priority shows ONLY the batch rows. A carry that leaked
    old '1-URGENT' rows, an overwrite that touched a neighbor
    partition, or a mis-parsed partition value shifts the per-priority
    counts/sums and fails the hash."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table
    from .partitioning import set_table_partitioning

    root = query_workspace("part_overwrite", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")

    def _build(base: str) -> None:
        set_table_partitioning(base, {"o_orderpriority": "string"})
        upsert_commit_batch(
            o.filter(F.col("o_orderkey") % 2 == 0), base, 0,
            key_cols=["o_orderpriority", "o_orderkey"],
            order_col="o_orderkey", keep_versions=4)

    clone_upsert_table(
        shared_base_table(sf_dir, "part_overwrite", _build), target)
    batch = (o.filter((F.col("o_orderpriority") == "1-URGENT")
                      & (F.col("o_orderkey") % 3 == 0))
             .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    upsert_overwrite_partitions(
        spark, target, 1, batch,
        key_cols=["o_orderpriority", "o_orderkey"], keep_versions=4)
    return (
        read_upsert_version(spark, target)
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .orderBy("o_orderpriority")
    )


@_catalog_register(
    "maintenance_incremental_optimize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id FROM events
      WHERE user_id < 300 AND event_id % 2 = 0
    ),
    merged AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM e) WHERE rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS sum_users,
           CAST(SUM(event_id) AS BIGINT) AS sum_events,
           TRUE AS debt_paid
    FROM merged
    """,
)
def maintenance_incremental_optimize(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Incremental OPTIMIZE under the value-hash gate. Three
    disjoint-key commits build the classic streaming small-file debt
    (disjoint keys → the COW touched-file join finds nothing → each
    commit carries the old files and ADDS one small file), then
    ``optimize_upsert_target(min_file_bytes=...)`` bin-packs ONLY the
    small files — Delta's minFileSize contract, maintenance cost
    O(debt) instead of O(table). The oracle replays the keep-latest
    state relationally (compaction must be a pure rewrite — any row
    lost, duplicated, or perturbed by the pack shifts the sums);
    ``debt_paid`` pins that the first run found debt and a second run
    found none (the no-op contract)."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("inc_optimize", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    ev = (load_table(spark, sf_dir, "events")
          .filter((F.col("user_id") < 300) & (F.col("event_id") % 2 == 0))
          .select("user_id", "event_id"))

    def _build(base: str) -> None:
        upsert_commit_batch(
            ev.filter(F.col("user_id") < 100), base, 0,
            key_cols=["user_id"], order_col="event_id", keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "inc_opt", _build),
                       target)
    for i, lo, hi in ((1, 100, 200), (2, 200, 300)):
        upsert_commit_batch(
            ev.filter((F.col("user_id") >= lo) & (F.col("user_id") < hi)),
            target, i, key_cols=["user_id"], order_col="event_id",
            keep_versions=4, incremental_min_bytes=0)
    # every data file in this harness is far below 1 GiB, so the first
    # run packs ALL the small-file debt and the second finds none
    first = optimize_upsert_target(spark, target, keep_versions=4,
                                   min_file_bytes=1 << 30, stats_cols=[])
    second = optimize_upsert_target(spark, target, keep_versions=4,
                                    min_file_bytes=1 << 30, stats_cols=[])
    debt_paid = first is not None and second is None
    return (
        read_upsert_version(spark, target)
        .agg(F.count("*").cast("bigint").alias("n_users"),
             F.sum("user_id").cast("bigint").alias("sum_users"),
             F.sum("event_id").cast("bigint").alias("sum_events"))
        .withColumn("debt_paid", F.lit(debt_paid))
    )


@_catalog_register(
    "table_column_mapping_dml",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 4 = 0
    ),
    renamed AS (
      SELECT o_orderkey, o_custkey, o_totalprice AS amount
      FROM o                       -- o_orderstatus dropped, price renamed
    ),
    upd AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 10 = 0 THEN amount * 2
                  ELSE amount END AS amount
      FROM renamed
    )
    SELECT CAST(o_custkey % 5 AS BIGINT) AS cust_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(amount AS DECIMAL(25,6))) AS DOUBLE) AS sum_amount
    FROM upd GROUP BY 1 ORDER BY 1
    """,
)
def table_column_mapping_dml(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Column mapping under the value-hash gate: a committed orders
    slice gets ``o_totalprice`` RENAMED to ``amount`` and
    ``o_orderstatus`` DROPPED — both O(1) metadata flips, zero data
    movement (the files keep their physical names; that is what keeps
    every retained snapshot's hard links valid) — then an UPDATE runs
    against the NEW logical schema and the final read aggregates by
    the logical names. The oracle replays rename+drop+update
    relationally; a reader leaking physical names, resurrecting the
    dropped column, or an UPDATE writing through the wrong physical
    mapping changes the schema or the sums and fails the gate."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table
    from .colmap import drop_table_column, rename_table_column

    root = query_workspace("colmap_dml", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 4 == 0)
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderstatus"))

    def _build(base: str) -> None:
        upsert_commit_batch(o, base, 0, key_cols=["o_orderkey"],
                            order_col="o_orderkey", keep_versions=4)

    clone_upsert_table(shared_base_table(sf_dir, "colmap_dml", _build),
                       target)
    rename_table_column(spark, target, "o_totalprice", "amount")
    drop_table_column(spark, target, "o_orderstatus")
    upsert_update_where(
        spark, target, 1, "o_custkey % 10 = 0",
        {"amount": "amount * 2"}, key_cols=["o_orderkey"],
        keep_versions=4, incremental_min_bytes=0)
    return (
        read_upsert_version(spark, target)
        .groupBy((F.col("o_custkey") % 5).cast("bigint")
                 .alias("cust_band"))
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.col("amount").cast("decimal(25,6)"))
             .cast("double").alias("sum_amount"))
        .orderBy("cust_band")
    )


def describe_upsert_detail(spark, target_dir: str) -> DataFrame:
    """Delta's ``DESCRIBE DETAIL``: one row of table-level metadata —
    location, format, current version, file count and bytes of the
    published snapshot, partition columns, and the declared metadata
    surfaces (CHECK constraints, generated columns, identity, column
    mapping, clone provenance). Driver-side journal/metadata reads plus
    one directory walk of the HEAD snapshot only (file counts at 100 TB
    come from the listing the table already maintains — never a data
    scan), returned as a DataFrame so it composes with the rest of the
    API like describe_upsert_history."""
    import json
    import os

    from pyspark.sql import types as T

    from .colmap import table_column_mapping
    from .partitioning import table_partitioning, table_writer_features

    versions_root = target_dir + "_versions"
    commits, applied = _journal_state(versions_root)
    if not commits:
        raise FileNotFoundError(f"no upsert table at {target_dir}")
    head = commits[-1]
    head_dir = os.path.join(versions_root, head["version_name"])
    files = _snapshot_data_files(head_dir)
    size = _data_file_bytes(head_dir)
    parts = table_partitioning(target_dir)
    m = table_column_mapping(target_dir)
    ident = table_identity_column(target_dir)
    cloned = next((c["cloned_from"] for c in commits
                   if c.get("cloned_from")), None)
    schema = T.StructType([
        T.StructField("location", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("num_files", T.LongType()),
        T.StructField("size_in_bytes", T.LongType()),
        T.StructField("num_versions_retained", T.LongType()),
        T.StructField("partition_columns",
                      T.ArrayType(T.StringType())),
        T.StructField("check_constraints",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("generated_columns",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("identity_column", T.StringType()),
        T.StructField("column_renames",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("dropped_columns",
                      T.ArrayType(T.StringType())),
        T.StructField("cloned_from", T.StringType()),
        T.StructField("column_defaults",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("protocol_features",
                      T.ArrayType(T.StringType())),
    ])
    from .carry import is_pruned_remnant
    retained = len({
        c["version"] for c in commits
        if c.get("op") in _VERSIONING_OPS
        and os.path.isdir(os.path.join(versions_root,
                                       c.get("version_name") or ""))
        and not is_pruned_remnant(os.path.join(
            versions_root, c.get("version_name") or ""))})
    cons_str = {n: (f"NOT NULL ({e['col']})" if isinstance(e, dict)
                    else e)
                for n, e in table_check_constraints(target_dir).items()}
    row = (os.path.abspath(target_dir), "parquet/upsert-journal",
           int(head["version"]), len(files), int(size), retained,
           list(parts), cons_str,
           table_generated_columns(target_dir),
           json.dumps(ident) if ident else None,
           dict(m["renames"]), list(m["dropped"]), cloned,
           table_column_defaults(target_dir),
           sorted(table_writer_features(target_dir)))
    return spark.createDataFrame([row], schema)


def show_upsert_partitions(spark, target_dir: str) -> DataFrame:
    """``SHOW PARTITIONS`` for a PARTITIONED BY table: one row per live
    partition of the published snapshot — typed partition values plus
    ``num_files`` and ``size_in_bytes``. Pure directory listing (the
    same metadata walk the partition-drop path uses), no data reads;
    at 100 TB this is the listing the table already maintains."""
    import os

    from pyspark.sql import types as T

    from .partitioning import partition_values_of, table_partitioning

    parts = table_partitioning(target_dir)
    if not parts:
        raise ValueError(f"{target_dir} is not PARTITIONED BY")
    head = resolve_published_snapshot(target_dir)
    _ddl = {"tinyint": T.ByteType(), "smallint": T.ShortType(),
            "int": T.IntegerType(), "bigint": T.LongType(),
            "string": T.StringType(), "date": T.DateType(),
            "boolean": T.BooleanType()}
    schema = T.StructType(
        [T.StructField(c, _ddl[t]) for c, t in parts.items()]
        + [T.StructField("num_files", T.LongType()),
           T.StructField("size_in_bytes", T.LongType())])
    # the LOGICAL file list (manifest-carried files included), grouped
    # by partition dir — still a pure listing plus one carry-manifest
    # read, no file opens
    from .carry import read_carry, resolve_data_file
    carry = read_carry(head)
    by_dir: dict[str, list[str]] = {}
    for f in _snapshot_data_files(head):
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    rows = []
    for d, fs in sorted(by_dir.items()):
        vals = partition_values_of(fs[0], parts)
        size = sum(os.path.getsize(resolve_data_file(head, f, carry))
                   for f in fs)
        rows.append(tuple(vals[c] for c in parts) + (len(fs), size))
    return spark.createDataFrame(rows, schema)


def auto_compact_upsert_target(spark, target_dir: str,
                               min_small_files: int = 16,
                               min_file_bytes: int = 16 * 1024 * 1024,
                               target_file_bytes: int = 128 * 1024 * 1024,
                               keep_versions: int = 2,
                               writer: str = "auto-compact",
                               max_owner_dirs: int = 16) -> str | None:
    """Delta's autoCompact contract: check the head's small-file debt
    with one listing, and run an INCREMENTAL OPTIMIZE only when at
    least ``min_small_files`` files sit under ``min_file_bytes`` —
    otherwise do nothing (None). Call it after commit bursts (e.g.
    from a foreachBatch sink every N batches); the check costs a
    directory walk, the compaction costs O(debt), and a quiet table
    pays nothing.

    ``max_owner_dirs`` additionally triggers when a PARTITIONED
    manifest-carried head's ownership has spread across more than that
    many version dirs (carry.owner_groups — the r12 item 4 fan-out
    probe: a partitioned carried read costs one scan branch per owner,
    so deep-retention single-key commit chains degrade reads until an
    OPTIMIZE collapses ownership back to one dir; flat tables collapse
    to a single multi-path scan and never trigger this)."""
    import os

    from .carry import owner_groups, read_carry, resolve_data_file
    from .partitioning import table_partitioning

    head = resolve_published_snapshot(target_dir)
    carry = read_carry(head)
    if carry and table_partitioning(target_dir):
        if len(owner_groups(head, _snapshot_data_files(head),
                            carry)) > max_owner_dirs:
            # FULL rewrite (min_file_bytes=None), deliberately: an
            # incremental OPTIMIZE carries well-sized files under
            # their ORIGINAL owners, so it can never collapse
            # ownership — the whole point of this trigger
            return optimize_upsert_target(
                spark, target_dir, keep_versions=keep_versions,
                writer=writer, target_file_bytes=target_file_bytes,
                stats_cols=[])
    small = 0
    for f in _snapshot_data_files(head):
        try:
            if os.path.getsize(
                    resolve_data_file(head, f, carry)) < min_file_bytes:
                small += 1
        except OSError:
            continue        # concurrent publish pruned the head mid-walk
        if small >= min_small_files:
            return optimize_upsert_target(
                spark, target_dir, keep_versions=keep_versions,
                writer=writer, target_file_bytes=target_file_bytes,
                min_file_bytes=min_file_bytes, stats_cols=[])
    return None


@_catalog_register(
    "merge_nmbs_sync_orders",
    oracle="""
    WITH t0 AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 3 = 0
    ),
    s AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 6 = 0
    ),
    m AS (
      SELECT t0.o_orderkey, t0.o_custkey,
             CASE WHEN s.o_orderkey IS NOT NULL
                  THEN t0.o_totalprice + s.o_totalprice
                  ELSE 0 - t0.o_totalprice END AS o_totalprice,
             s.o_orderkey IS NOT NULL AS matched
      FROM t0 LEFT JOIN s USING (o_orderkey)
    ),
    f AS (SELECT * FROM m WHERE matched OR o_custkey % 10 <> 0)
    SELECT CAST(o_custkey % 5 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def merge_nmbs_sync_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with explicit SET maps and WHEN NOT MATCHED BY SOURCE
    under the value-hash gate — the 'sync to a feed' shape: matched
    rows ACCUMULATE (``SET o_totalprice = t.o_totalprice +
    s.o_totalprice`` — an expression over both sides, impossible with
    SET *), target rows absent from the feed are DELETED when
    ``o_custkey % 10 = 0`` and NEGATED otherwise (the NMBS
    delete-then-update clause order), and the disabled INSERT clause
    plus SET-map mode must leave the schema untouched by the source's
    columns. The oracle replays the three-way row fate relationally;
    wrong clause precedence, a leaked source column, or an NMBS clause
    applied to a matched row shifts the per-band sums."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("merge_nmbs", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = load_table(spark, sf_dir, "orders")

    def _build(base: str) -> None:
        upsert_commit_batch(
            o.filter(F.col("o_orderkey") % 3 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice"),
            base, 0, key_cols=["o_orderkey"], order_col="o_orderkey",
            keep_versions=2)

    clone_upsert_table(shared_base_table(sf_dir, "merge_nmbs", _build),
                       target)
    src = (o.filter(F.col("o_orderkey") % 6 == 0)
           .select("o_orderkey", "o_totalprice"))
    upsert_merge_into(
        spark, target, 1, src, ["o_orderkey"],
        source_unique=True,  # filter on the unique order key
        matched_update_set={
            "o_totalprice": "t.o_totalprice + s.o_totalprice"},
        not_matched_insert=None,
        not_matched_by_source_delete="t.o_custkey % 10 = 0",
        not_matched_by_source_update="t.o_custkey % 10 <> 0",
        not_matched_by_source_set={
            "o_totalprice": "0 - t.o_totalprice"},
        keep_versions=2)
    return (
        read_upsert_version(spark, target)
        .groupBy((F.col("o_custkey") % 5).cast("bigint").alias("band"))
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .orderBy("band")
    )


@_catalog_register(
    "table_not_null_default",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    added AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             'backfill' AS status
      FROM orders WHERE o_orderkey % 5 = 1
    ),
    final AS (SELECT * FROM base UNION ALL SELECT * FROM added)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price,
           TRUE AS not_null_enforced
    FROM final GROUP BY status ORDER BY status
    """,
)
def table_not_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT NULL + column DEFAULT under the value-hash gate. The base
    table carries a ``status`` column; DEFAULT 'backfill' is declared,
    then a second batch arrives WITHOUT the column and must land with
    the default (not NULL — which the also-declared NOT NULL would
    refuse, and which the oracle's constant replays). A third batch
    with an explicit NULL status must be REFUSED by the NOT NULL
    constraint (``not_null_enforced`` pins that the violation actually
    fired — CHECK's three-valued logic would have passed it, which is
    why NOT NULL is a distinct constraint class)."""
    import os
    import shutil

    from ..fsutil import query_workspace
    from ..sources.tables import load_table

    root = query_workspace("nn_default", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    o = load_table(spark, sf_dir, "orders")

    def _build(base: str) -> None:
        upsert_commit_batch(
            o.filter(F.col("o_orderkey") % 5 == 0)
            .select("o_orderkey", "o_totalprice",
                    F.col("o_orderstatus").alias("status")),
            base, 0, key_cols=["o_orderkey"], order_col="o_orderkey",
            keep_versions=2)

    clone_upsert_table(shared_base_table(sf_dir, "nn_default", _build),
                       target)
    set_table_column_default(target, "status", "'backfill'")
    set_table_not_null(spark, target, "status")
    upsert_commit_batch(
        o.filter(F.col("o_orderkey") % 5 == 1)
        .select("o_orderkey",
                (F.col("o_totalprice") * 2).alias("o_totalprice")),
        target, 1, key_cols=["o_orderkey"], order_col="o_orderkey",
        keep_versions=2)
    enforced = False
    try:
        upsert_commit_batch(
            o.limit(10).select(
                "o_orderkey", "o_totalprice",
                F.lit(None).cast("string").alias("status")),
            target, 2, key_cols=["o_orderkey"],
            order_col="o_orderkey", keep_versions=2)
    except CheckConstraintViolation:
        enforced = True
    return (
        read_upsert_version(spark, target)
        .groupBy("status")
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .withColumn("not_null_enforced", F.lit(enforced))
        .orderBy("status")
    )


def _ts_to_epoch(ts) -> float:
    import datetime as dt

    if isinstance(ts, str):
        ts = dt.datetime.fromisoformat(ts)
    if isinstance(ts, dt.datetime):
        ts = ts.timestamp()
    return float(ts)


def resolve_version_at_or_after(target_dir: str, ts) -> int | None:
    """First versioning commit whose commit time is >= ts — Delta's
    ``startingTimestamp`` resolution (commit-file mtime clock, the
    same one TIMESTAMP AS OF uses). None when every commit precedes
    ts (an empty feed window)."""
    ts = _ts_to_epoch(ts)
    for c, mt in _commit_mtimes(target_dir + "_versions"):
        if c.get("op") in _VERSIONING_OPS and mt >= ts:
            return c["version"]
    return None


def resolve_version_at_or_before(target_dir: str, ts) -> int | None:
    """Last versioning commit whose commit time is <= ts — Delta's
    ``endingTimestamp`` / TIMESTAMP AS OF resolution."""
    ts = _ts_to_epoch(ts)
    out = None
    for c, mt in _commit_mtimes(target_dir + "_versions"):
        if c.get("op") in _VERSIONING_OPS and mt <= ts:
            out = c["version"]
    return out


def restore_upsert_as_of_timestamp(spark, target_dir: str, ts,
                                   as_version: int,
                                   keep_versions: int = 2,
                                   writer: str = "restore",
                                   enforce_constraints: bool = True
                                   ) -> str:
    """RESTORE TABLE ... TIMESTAMP AS OF: resolve ts against the
    commit-mtime clock (the TIMESTAMP AS OF rules, including the
    before-earliest error) and restore that version — all of
    restore's contracts (history-preserving commit, retention check,
    constraint re-validation) apply unchanged."""
    ts_f = _ts_to_epoch(ts)
    version = resolve_version_at_or_before(target_dir, ts_f)
    if version is None:
        raise ValueError(
            f"timestamp {ts!r} precedes the table's earliest commit — "
            f"nothing to restore")
    return restore_upsert_target(spark, target_dir, version,
                                 as_version, keep_versions=keep_versions,
                                 writer=writer,
                                 enforce_constraints=enforce_constraints)
