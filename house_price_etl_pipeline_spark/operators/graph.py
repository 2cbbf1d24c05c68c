"""Iterative graph analytics: PageRank over the co-supplier graph
(suppliers linked when they serve the same order).

Third iterative-algorithm exemplar next to connected components
(dedup.py) and Lloyd k-means (similarity.py), with the same distributed
discipline: set-at-a-time DataFrame rounds, localCheckpoint per
iteration to cut lineage, shuffles keyed on the node id, and NO
driver-side per-node state — the driver only orchestrates rounds.

Scale: the edge list is built from distinct (order, supplier) pairs
self-joined on the order key — co-occurrence fan-out is bounded by
order size (≤7 lineitems in TPC-H shapes), so edges = O(orders · k²),
never all-pairs of suppliers. Each PageRank round is one shuffle
(contributions summed by destination) plus a broadcast of the 1-row
dangling-mass aggregate. Rows-only in the driver gate (iterative, not
SQL-expressible); tests/test_graph.py replays the identical algorithm
in numpy on the collected edge list and checks the full rank vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

PR_ITERS = 5
PR_DAMPING = 0.85


def supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed co-occurrence edges (src, dst), deduped: s1→s2 iff some
    order contains lineitems from both."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey").distinct())
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_suppkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_suppkey").alias("dst"))
    return (a.join(b, "k")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst").distinct())


@register("graph_pagerank_suppliers")  # rows-only: iterative
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-supplier graph: PR_ITERS synchronous rounds,
    damping PR_DAMPING, uniform teleport over ALL suppliers (including
    isolated ones, which keep the teleport mass). Per round: rank/out
    contributions shuffle-summed by destination + the dangling mass
    (suppliers with no out-edges) redistributed uniformly via a 1-row
    broadcast. localCheckpoint per round keeps the plan flat."""
    from .dedup import dedup_shuffle_partitions

    # rank/contribution relations are node-sized (thousands of rows):
    # per-round shuffles at the session's 32 partitions pay more fixed
    # task cost than the work — size like the other pair-scale stages
    # (env-overridable; a 1000-executor run sets this to node volume).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(dedup_shuffle_partitions()))
    try:
        return _pagerank_rounds(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _pagerank_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = supplier_edges(spark, sf_dir).localCheckpoint()
    nodes = (load_table(spark, sf_dir, "supplier")
             .select(F.col("s_suppkey").alias("node")).distinct()
             .localCheckpoint())
    n_nodes = nodes.count()  # driver scalar: one distributed count
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(PR_ITERS):
        r = ranks.alias("r")
        contribs = (
            edges.join(r, F.col("src") == F.col("r.node"))
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_mass"))
        )
        # dangling = rank mass sitting on nodes without out-edges
        dangling = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (F.lit((1.0 - PR_DAMPING) / n_nodes)
                 + PR_DAMPING * (F.coalesce(F.col("in_mass"), F.lit(0.0))
                                 + F.col("dm") / n_nodes)).alias("rank"))
            .localCheckpoint()
        )
    return (
        ranks.select("node", F.round("rank", 10).alias("rank"))
        .orderBy("node")
    )
