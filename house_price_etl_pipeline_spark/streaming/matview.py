"""Incrementally-maintained materialized aggregate views over the
versioned upsert table — the change-feed consumer that makes the CDC
surface (ingest.read_upsert_changes) pay rent.

The at-scale motivation: a 100 TB table's per-key/per-group rollup is
re-asked after every commit, and a full re-aggregation per refresh
scans the whole table each time. Sum/count are ALGEBRAIC aggregates, so
the view can instead be folded forward from the change feed: each
refresh reads only the rows that changed between the view's version and
the journal head (+1 for inserts and update_postimages, −1 for deletes
and update_preimages) and merges the per-group deltas into the stored
view — work proportional to the CHANGE SIZE, not the table. This is
Delta/Databricks' incremental MV maintenance and Materialize's delta
dataflow, expressed on the mini format.

Exactness contract: the running sum is stored as DECIMAL(25,6), so
incremental folding is bit-identical to a full recompute at any version
— no float drift accumulates across refreshes (same discipline as
functions.numeric.dec_sum). A group's sum is NULL iff it has no
non-NULL values, tracked via an n_values counter so NULL-only groups
round-trip exactly like a recompute's SUM.

Concurrency contract: one maintainer per view (the view directory is
swapped atomically via os.replace of a pointer file, so READERS are
always consistent, but two concurrent refreshes of the same view_dir
race on the staging names). Refreshes against a concurrently-committing
TABLE are safe: the version pair is pinned before the change-feed read,
and both versions are retained snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec_sum_expr
from ..plans.catalog import register

MV_META = "_mv_meta.json"

# Retired state dirs are reclaimed only past this age, so a reader
# whose lazy DataFrame still points at the previous state can finish
# its scan — the same retention contract as vacuum_upsert_target's
# mtime gate (an immediate rmtree would break the module's
# readers-always-consistent promise).
STATE_GC_AGE_S = 300.0


def _mv_meta_path(view_dir: str) -> str:
    return os.path.join(view_dir, MV_META)


def _read_meta(view_dir: str) -> dict | None:
    try:
        with open(_mv_meta_path(view_dir)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_state(view_dir: str, df: DataFrame, version: int,
                 group_cols: list[str], sum_col: str) -> None:
    """Write the new view state + pointer: data to a fresh subdir, then
    one atomic pointer swap (readers resolve through the meta file, so
    a crash mid-write leaves the previous state fully readable). The
    previous state dir is NOT reclaimed inline — a reader's lazy scan
    may still hold it — only retired states older than STATE_GC_AGE_S
    are swept, age-gated like VACUUM."""
    import time

    os.makedirs(view_dir, exist_ok=True)
    name = f"state_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(os.path.join(view_dir, name))
    tmp = _mv_meta_path(view_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "state": name,
                   "group_cols": group_cols, "sum_col": sum_col}, fh)
    os.replace(tmp, _mv_meta_path(view_dir))
    cutoff = time.time() - STATE_GC_AGE_S
    for d in os.listdir(view_dir):
        if not d.startswith("state_") or d == name:
            continue
        p = os.path.join(view_dir, d)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # concurrent GC or reader cleanup — next sweep gets it


def _aggregate(df: DataFrame, group_cols: list[str],
               sum_col: str) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(sum_col).cast("long").alias("n_values"),
        F.sum(F.col(sum_col).cast("decimal(25,6)"))
        .cast("decimal(25,6)").alias("sum_dec"),
    )


def read_mv(spark: SparkSession, view_dir: str) -> DataFrame:
    """Current view state with the presentation schema: group columns,
    row count, and the sum as double (NULL iff no non-NULL values)."""
    meta = _read_meta(view_dir)
    if meta is None:
        raise FileNotFoundError(f"no materialized view at {view_dir}")
    st = spark.read.parquet(os.path.join(view_dir, meta["state"]))
    return st.select(
        *meta["group_cols"],
        F.col("n_rows"),
        F.when(F.col("n_values") > 0, F.col("sum_dec").cast("double"))
        .alias("sum_value"),
    )


def refresh_mv(spark: SparkSession, target_dir: str, view_dir: str,
               key_cols: list[str], group_cols: list[str],
               sum_col: str) -> str:
    """Bring the view up to the table's journal head. Returns how:
    'full' (first build), 'incremental' (change-feed fold), or 'noop'
    (already at head). ``key_cols`` are the TABLE's upsert keys (the
    change feed is keyed on them); ``group_cols`` are the VIEW's
    grouping columns — any payload columns, independent of the keys,
    because the feed carries whole pre/post rows."""
    from .ingest import _journal_state, read_upsert_version

    commits, _ = _journal_state(target_dir + "_versions")
    if not commits:
        raise FileNotFoundError(f"no upsert table at {target_dir}")
    head = commits[-1]["version"]

    def _full_build() -> str:
        # aggregate the PINNED head snapshot, not the published symlink
        # (review r9): a concurrent writer can publish head+1 between
        # our journal read and the scan — recording version=head over
        # head+1's data would double-count the next change-feed fold
        snap = read_upsert_version(spark, target_dir, head)
        _write_state(view_dir, _aggregate(snap, group_cols, sum_col),
                     head, group_cols, sum_col)
        return "full"

    meta = _read_meta(view_dir)
    if meta is None:
        return _full_build()
    if (meta.get("group_cols") != list(group_cols)
            or meta.get("sum_col") != sum_col):
        raise ValueError(
            f"view at {view_dir} was built with group_cols="
            f"{meta.get('group_cols')}, sum_col={meta.get('sum_col')!r} "
            f"— refusing to fold deltas aggregated on different columns")
    if meta["version"] == head:
        return "noop"

    from .ingest import read_upsert_changes

    try:
        ch = read_upsert_changes(spark, target_dir, meta["version"], head,
                                 key_cols)
    except FileNotFoundError:
        # the view's base version fell out of the table's retention
        # window (refreshed less often than keep_versions commits):
        # the change feed is gone, so rebuild from the head snapshot —
        # the view stays maintainable instead of permanently failing
        return _full_build()
    sign = F.when(
        F.col("change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = ch.groupBy(*group_cols).agg(
        F.sum(sign).cast("long").alias("d_rows"),
        F.sum(F.when(F.col(sum_col).isNotNull(), sign).otherwise(0))
        .cast("long").alias("d_values"),
        F.sum(sign.cast("decimal(25,6)")
              * F.coalesce(F.col(sum_col).cast("decimal(25,6)"),
                           F.lit(0).cast("decimal(25,6)")))
        .cast("decimal(25,6)").alias("d_sum"),
    )
    old = spark.read.parquet(os.path.join(view_dir, meta["state"]))
    # null-safe equi-join on the group columns: NULL is a real group
    # (GROUP BY keeps it) and a plain join would never match it
    cond = None
    o, d = old.alias("o"), delta.alias("d")
    for c in group_cols:
        term = F.col(f"o.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = term if cond is None else (cond & term)
    merged = (
        o.join(d, cond, "full_outer")
        .select(
            *[F.coalesce(F.col(f"o.{c}"), F.col(f"d.{c}")).alias(c)
              for c in group_cols],
            (F.coalesce(F.col("o.n_rows"), F.lit(0))
             + F.coalesce(F.col("d.d_rows"), F.lit(0))).alias("n_rows"),
            (F.coalesce(F.col("o.n_values"), F.lit(0))
             + F.coalesce(F.col("d.d_values"), F.lit(0))).alias("n_values"),
            (F.coalesce(F.col("o.sum_dec"),
                        F.lit(0).cast("decimal(25,6)"))
             + F.coalesce(F.col("d.d_sum"),
                          F.lit(0).cast("decimal(25,6)")))
            .cast("decimal(25,6)").alias("sum_dec"),
        )
        .filter(F.col("n_rows") > 0)
    )
    _write_state(view_dir, merged, head, group_cols, sum_col)
    return "incremental"


def _mv_workspace(sf_dir: str) -> str:
    from ..fsutil import query_workspace

    return query_workspace("mv_refresh", sf_dir)


@register(
    "mv_incremental_refresh",
    oracle=f"""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dec_sum_expr('value')} AS sum_value,
           TRUE AS refreshed_incrementally
    FROM latest GROUP BY event_type ORDER BY event_type
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance under the value-hash gate: events are
    committed to a keep-latest-per-user upsert table in THREE batches
    (split by event_id % 3), and a per-event_type (count, sum(value))
    view is refreshed after each — the first build is a full aggregate,
    the next two fold ONLY the change feed between consecutive
    versions. The final view must equal the oracle's direct aggregate
    over the latest-event-per-user state (exact decimal folding makes
    that bit-for-bit, not approximately), and
    ``refreshed_incrementally`` pins that the two follow-up refreshes
    really took the incremental path (exact-twin boolean pattern)."""
    import shutil

    from ..sources.tables import load_table
    from .ingest import upsert_commit_batch

    root = _mv_workspace(sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    target = os.path.join(root, "tbl")
    view = os.path.join(root, "mv")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    modes = []
    for i in range(3):
        upsert_commit_batch(ev.filter(F.col("event_id") % 3 == i),
                            target, i, key_cols=["user_id"],
                            order_col="event_id", keep_versions=3)
        modes.append(refresh_mv(spark, target, view,
                                key_cols=["user_id"],
                                group_cols=["event_type"],
                                sum_col="value"))
    ok = modes == ["full", "incremental", "incremental"]
    return (
        read_mv(spark, view)
        .select("event_type", "n_rows", "sum_value",
                F.lit(bool(ok)).alias("refreshed_incrementally"))
        .orderBy("event_type")
    )
