"""Randomized cross-check of asof_join (both directions) against pandas
merge_asof — the de-facto semantics reference for as-of joins. One
Spark round-trip over a batch of random cases (seeded, so failures
reproduce) instead of hypothesis-per-example: Spark job latency makes
per-example property testing impractical.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.temporal import asof_join


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    rng = random.Random(42)
    lrows, rrows = [], []
    for key in range(8):
        for i in range(rng.randint(0, 12)):
            lrows.append((key, rng.randint(0, 100), len(lrows)))
        # right side unique per (k, t): with duplicate right timestamps
        # the matched payload is undefined in BOTH engines (the catalog
        # queries dedupe right to one row per (key, ts) for this reason);
        # left-vs-right ties stay covered — t ranges overlap
        for t in rng.sample(range(0, 101), rng.randint(0, 6)):
            rrows.append((key, t, 1000 + len(rrows)))
    left = spark.createDataFrame(lrows, ["k", "t", "lid"])
    right = spark.createDataFrame(rrows, ["k", "t", "rid"])
    got = {
        (r.lid, r.asof_rid)
        for r in asof_join(left, right, on="k", ts="t",
                           payload_cols=["rid"],
                           direction=direction).collect()
    }

    lp = (pd.DataFrame(lrows, columns=["k", "t", "lid"])
          .sort_values(["t", "lid"]).reset_index(drop=True))
    rp = (pd.DataFrame(rrows, columns=["k", "t", "rid"])
          .sort_values(["t", "rid"]).reset_index(drop=True))
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
    want = {(int(r.lid), None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()}
    assert got == want


def test_capped_sessionization_enforces_both_rules(spark, tmp_path):
    """Crafted timeline where ONLY the duration cap can split: events
    every 5 h (below the 6 h idle gap) spanning 45 h. A gap-only rule
    yields ONE session; the cap must split at 24 h boundaries measured
    from each session START — the sequential recurrence no window/lag
    rewrite can express."""
    import datetime as dt

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.operators.temporal import (
        sessionize_capped_duration)

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=5 * i), 1, "view", 1.0, "{}")
            for i in range(10)]  # 0h..45h
    sf = tmp_path / "sf"
    sf.mkdir()
    (spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
     .coalesce(1).write.parquet(str(sf / "events.parquet")))
    out = sessionize_capped_duration(spark, str(sf)).collect()
    # session 1: events at 0,5,10,15,20 h (25h would exceed the 24h cap
    # from start=0); session 2 restarts at 25h: 25,30,35,40,45
    assert [(r.session_no, r.n_events) for r in out] == [(1, 5), (2, 5)]
    assert out[0].start_ts.startswith("2024-01-01 00:00")
    assert out[1].start_ts.startswith("2024-01-02 01:00")


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_null_payload_is_not_skipped(spark, direction):
    """A genuinely-matched right row whose payload value is NULL must be
    returned AS the match (payload NULL), not skipped in favor of an
    older/newer row — the struct-wrapped carry pins true as-of
    semantics on NULL payloads."""
    left = spark.createDataFrame([(1, 50, 0)], ["k", "t", "lid"])
    # two right rows: the nearer one has a NULL payload value
    if direction == "backward":
        rrows = [(1, 10, 111), (1, 40, None)]   # match: t=40, payload NULL
    else:
        rrows = [(1, 60, None), (1, 90, 111)]   # match: t=60, payload NULL
    right = spark.createDataFrame(rrows, "k long, t long, rid long")
    out = asof_join(left, right, on="k", ts="t",
                    payload_cols=["rid"], direction=direction).collect()
    assert len(out) == 1
    assert out[0].asof_rid is None
