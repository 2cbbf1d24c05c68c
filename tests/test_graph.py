"""Full-replica oracle for the PageRank operator: the identical
algorithm in numpy on the collected edge list (same rounds, damping,
dangling handling) must reproduce the distributed rank vector."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators import graph as G

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_matches_numpy_replica(spark):
    edges = [(r.src, r.dst) for r in
             G.supplier_edges(spark, SF_DIR).collect()]
    nodes = sorted(r.node for r in
                   spark.read.parquet(f"{SF_DIR}/supplier.parquet")
                   .select(F.col("s_suppkey").alias("node")).distinct()
                   .collect())
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(G.PR_ITERS):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] / out[idx[s]]
        dangling = rank[out == 0].sum()
        rank = ((1.0 - G.PR_DAMPING) / n
                + G.PR_DAMPING * (contrib + dangling / n))
    got = {r.node: r.rank for r in
           G.graph_pagerank_suppliers(spark, SF_DIR).collect()}
    assert set(got) == set(nodes)
    for node in nodes:
        assert abs(got[node] - rank[idx[node]]) < 1e-9, node
    # ranks form a probability distribution (mass conserved)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_broadcast_guard(spark, tmp_path):
    """The node-sized broadcast hints are guarded on node count vs
    autoBroadcastJoinThreshold (VERDICT r4 item 6): at supplier scale
    the plan broadcasts; with the threshold forced tiny the same query
    plans shuffle joins instead — and still returns identical ranks."""
    from house_price_etl_pipeline_spark.operators.graph import (
        graph_pagerank_suppliers, supplier_edges, _pagerank_rounds)

    sf = "/root/testdata/sf0.001"
    edges = supplier_edges(spark, sf).localCheckpoint()

    normal = _pagerank_rounds(spark, sf, edges)
    round1 = _pagerank_rounds(spark, sf, edges, _first_round_plan=True)
    plan_normal = round1._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_normal

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
    try:
        round1g = _pagerank_rounds(spark, sf, edges,
                                   _first_round_plan=True)
        plan_guarded = round1g._jdf.queryExecution().executedPlan() \
            .toString()
        # the dangling 1-row crossJoin may still broadcast (always
        # safe); the node-sized EQUI-joins must have fallen back
        assert "BroadcastHashJoin" not in plan_guarded
        guarded = _pagerank_rounds(spark, sf, edges)
        got = {r.node: r.rank for r in guarded.collect()}
        want = {r.node: r.rank for r in normal.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
