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
