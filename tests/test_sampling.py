"""Sampling operators: determinism, fraction tolerance, stratification.

The hash-split queries are oracle-checked (test_oracle_parity); these
tests pin the semantics the oracle can't see — seeded-RNG reproducibility
and per-stratum proportions."""

from __future__ import annotations

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.sampling import (
    bernoulli_sample,
    hash_split_col,
    sample_bernoulli_seeded,
    sample_stratified_returnflag,
    stratified_sample_counts,
)
from house_price_etl_pipeline_spark.sources.tables import load_table


def test_bernoulli_seeded_is_reproducible(spark, sf_dir):
    a = bernoulli_sample(spark, sf_dir).collect()
    b = bernoulli_sample(spark, sf_dir).collect()
    assert a == b  # same seed, same partitioning → identical sample


def test_bernoulli_fraction_within_tolerance(spark, sf_dir):
    n_total = load_table(spark, sf_dir, "orders").count()
    n_sample = bernoulli_sample(spark, sf_dir).count()
    frac = n_sample / n_total
    assert 0.05 < frac < 0.15  # 10% ± sampling noise at sf0.001


def test_hash_split_is_stable_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = (d.withColumn("split", hash_split_col(F.col("doc_id")))
            .select("doc_id", "split"))
    reparted = (d.repartition(17)
                .withColumn("split", hash_split_col(F.col("doc_id")))
                .select("doc_id", "split"))
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, reparted.collect()))


def test_stratified_rebalances_rare_classes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    totals = dict(li.groupBy("l_returnflag").count().collect())
    sampled = dict(
        (r["l_returnflag"], r["n_sampled"])
        for r in stratified_sample_counts(spark, sf_dir).collect()
    )
    # N sampled at ~5%, R/A at ~50% — rates must be in disjoint ranges
    assert sampled["N"] / totals["N"] < 0.12
    for k in ("R", "A"):
        assert 0.3 < sampled[k] / totals[k] < 0.7


def test_weighted_topk_overselects_heavy_rows(spark, sf_dir):
    """A-ES with w = o_totalprice must pull the sample's mean price well
    above the population mean, and be stable under repartitioning (pure
    function of the key)."""
    from house_price_etl_pipeline_spark.operators.sampling import (
        sample_weighted_topk)

    o = load_table(spark, sf_dir, "orders")
    pop_mean = o.agg(F.avg("o_totalprice")).collect()[0][0]
    samp = sample_weighted_topk(spark, sf_dir)
    samp_mean = samp.agg(F.avg("o_totalprice")).collect()[0][0]
    assert samp_mean > 1.2 * pop_mean
    again = {r.o_orderkey for r in sample_weighted_topk(spark, sf_dir).collect()}
    assert {r.o_orderkey for r in samp.collect()} == again


def test_seeded_sample_twin_entries_report_ok(spark, sf_dir):
    """The oracled sample entries must report TRUE statistical-soundness
    booleans alongside the exact population facts."""
    r = sample_bernoulli_seeded(spark, sf_dir).collect()[0]
    assert r.size_ok and r.mean_ok and r.n_total > 0
    for row in sample_stratified_returnflag(spark, sf_dir).collect():
        assert row.frac_ok, row
