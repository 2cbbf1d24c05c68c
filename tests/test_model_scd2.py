"""Model-based fuzzing of the SCD TYPE 2 change applier.

Hypothesis generates a random SOURCE history (keep-latest upserts and
DELETE WHEREs committed through the journal) and checks the SCD2
replica built by ``apply_changes_to_table(stored_as="scd2")`` against a
pure-Python interval model of DLT's stored-as-SCD-2 contract:

- one row per (key, row version) with ``__START_AT``/``__END_AT``
  holding the source versions that opened/closed it (open rows: END
  NULL); a payload CHANGE closes-and-reopens, an unchanged touch emits
  nothing, a delete closes without reopening;
- POLL-mode equivalence: a replica the applier catches up after EVERY
  source commit must end bit-identical to one built by a single apply
  at the head — the per-version MERGE composition must commute with
  batching (the applier's core exactly-once claim).

The targeted SCD2 tests pin seed/replay/startingVersion behavior on
hand-built histories; this fuzzes the histories themselves (including
delete-then-reinsert of the same key and whole-table deletions, the
interval shapes hand-written cases miss). Source batches stamp
``ord`` = source version, so keep-latest order is strict (no ties —
the tie path has its own fuzzer in test_model_dml.py) and every touch
of a key changes its payload, making the model's change detection
exact.
"""
from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "8"))

KEYS = list(range(8))

_pairs = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 9)),
    min_size=1, max_size=5)

_sop = st.one_of(
    st.tuples(st.just("upsert"), _pairs),
    st.tuples(st.just("delete"), st.integers(0, 9)),
)

_history = st.tuples(_pairs, st.lists(_sop, min_size=1, max_size=5))


def _dedup(pairs):
    seen = {}
    for k, v in pairs:
        seen[k] = v
    return sorted(seen.items())


def _source_snapshots(seed_pairs, ops):
    """Replay the source history in the model: snapshots[v] maps
    key -> (value, ord) where ord is the version that last touched
    the key (every batch stamps ord = version, and version ordering
    makes keep-latest deterministic)."""
    state = {}
    for k, v in _dedup(seed_pairs):
        state[k] = (v, 0)
    snaps = [dict(state)]
    ver = 0
    for op in ops:
        ver += 1
        if op[0] == "upsert":
            for k, v in _dedup(op[1]):
                state[k] = (v, ver)
        else:
            thr = op[1]
            for k in [k for k, (v, _) in state.items() if v < thr]:
                del state[k]
        snaps.append(dict(state))
    return snaps


def _scd2_model(snaps):
    """Expected (k, v, ord, start, end) set — end None for open rows."""
    rows = []
    open_rows: dict = {}  # k -> [payload, start]
    for ver, snap in enumerate(snaps):
        for k, payload in snap.items():
            if k not in open_rows:
                open_rows[k] = [payload, ver]
            elif open_rows[k][0] != payload:
                p, s = open_rows.pop(k)
                rows.append((k, *p, s, ver))
                open_rows[k] = [payload, ver]
        for k in list(open_rows):
            if k not in snap:
                p, s = open_rows.pop(k)
                rows.append((k, *p, s, ver))
    for k, (p, s) in open_rows.items():
        rows.append((k, *p, s, None))
    return set(rows)


@settings(max_examples=_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(hist=_history)
def test_scd2_apply_matches_interval_model(spark, tmp_path_factory,
                                           hist):
    from house_price_etl_pipeline_spark.streaming.cdf import (
        apply_changes_to_table)
    from house_price_etl_pipeline_spark.streaming.ingest import (
        read_upsert_version, upsert_commit_batch, upsert_delete_where)

    seed_pairs, ops = hist
    root = tmp_path_factory.mktemp("model_scd2")
    src = str(root / "src")
    dst_once = str(root / "dst_once")
    dst_poll = str(root / "dst_poll")

    def df_of(pairs, ver):
        return spark.createDataFrame(
            [(k, v, ver) for k, v in _dedup(pairs)],
            "k long, v long, ord long")

    # --- build the source history (retain everything: the replica
    # replays per-version) ---
    upsert_commit_batch(df_of(seed_pairs, 0), src, 0, key_cols=["k"],
                        order_col="ord", keep_versions=32,
                        incremental_min_bytes=0)
    ver = 0
    apply_changes_to_table(spark, src, dst_poll, ["k"],
                           keep_versions=32, stored_as="scd2")
    for op in ops:
        ver += 1
        if op[0] == "upsert":
            upsert_commit_batch(df_of(op[1], ver), src, ver,
                                key_cols=["k"], order_col="ord",
                                keep_versions=32,
                                incremental_min_bytes=0)
        else:
            upsert_delete_where(spark, src, ver, f"v < {op[1]}",
                                keep_versions=32,
                                incremental_min_bytes=0)
        # poll replica: catch up after every single source commit
        apply_changes_to_table(spark, src, dst_poll, ["k"],
                               keep_versions=32, stored_as="scd2")

    # one-shot replica: a single apply at the head
    apply_changes_to_table(spark, src, dst_once, ["k"],
                           keep_versions=32, stored_as="scd2")

    def hist_set(dst):
        return {(r["k"], r["v"], r["ord"], r["__START_AT"],
                 r["__END_AT"])
                for r in read_upsert_version(spark, dst).collect()}

    want = _scd2_model(_source_snapshots(seed_pairs, ops))
    got_once = hist_set(dst_once)
    assert got_once == want, "one-shot SCD2 history != interval model"
    assert hist_set(dst_poll) == want, \
        "poll-mode SCD2 history != interval model"
