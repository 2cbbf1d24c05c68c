"""Crash-safe local-filesystem publication primitives.

Every state/manifest/pointer file the streaming sinks maintain follows
the same rule: build the new content OFF to the side, then publish with
one atomic ``rename`` — a crash at any instant leaves either the old
complete state or the new complete state, never a truncated file or a
half-swapped directory. (On a real deployment the same role is played by
the table format's commit protocol — Delta/Iceberg log append — or the
object store's atomic PUT; these helpers are the local-fs analog.)
"""

from __future__ import annotations

import json
import os
import tempfile


def _fsync_dir(d: str) -> None:
    """fsync a directory so a just-completed rename survives power loss
    (POSIX: the rename is only durable once the containing directory's
    metadata hits disk). Best-effort — some filesystems refuse O_RDONLY
    dir fsync; a failure degrades to process-crash safety, which the
    callers' contract still covers."""
    try:
        dfd = os.open(d, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(dfd)
    except OSError:
        pass
    finally:
        os.close(dfd)


def atomic_write_json(path: str, obj) -> None:
    """Write JSON to ``path`` atomically: temp file in the same directory
    (same filesystem → rename is atomic), fsync file, ``os.replace``,
    then fsync the parent directory so the rename itself is durable."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".tmp_", suffix=".json", dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        _fsync_dir(d)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_symlink_swap(link_path: str, target: str) -> None:
    """Point ``link_path`` at ``target`` atomically (create a temp
    symlink next to it, then ``os.replace`` over the link). Readers
    resolving the link see the old or the new target, never neither.
    The parent directory is fsynced after the swap so the publication
    survives power loss, not just process crash."""
    d = os.path.dirname(os.path.abspath(link_path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp_link_{os.getpid()}_{id(target)}")
    if os.path.lexists(tmp):
        os.unlink(tmp)
    os.symlink(target, tmp)
    os.replace(tmp, link_path)
    _fsync_dir(d)
