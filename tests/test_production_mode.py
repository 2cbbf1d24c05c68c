"""Production-mode tests: SPARK_GRAFT_EXACT_TWIN=0 must switch every
exact-twin query to its sketch/ANN/LSH-only production plan (VERDICT r3
item 1 — the benched plan and the shipped plan must be the same thing),
while the default (twin-on) keeps the driver's oracle-gate schema.

Production outputs can't be value-hash-checked against DuckDB (sketch
values are engine-internal), so these tests assert the properties that
define each production plan: no exact sibling in the physical plan, and
output values within the sketch's accuracy envelope of independently
computed ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.plans.catalog import REGISTRY, load_all

load_all()


@pytest.fixture
def production(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EXACT_TWIN", "0")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_distinct_production(production, spark, sf_dir, duck):
    df = REGISTRY["agg_approx_distinct"].fn(spark, sf_dir)
    assert df.columns == ["l_returnflag", "approx_parts"]
    plan = _plan(df)
    assert "approx_count_distinct" in plan
    assert "count(distinct" not in plan.lower().replace("approx_count_distinct", "")
    got = {r.l_returnflag: r.approx_parts for r in df.collect()}
    exact = dict(duck.execute(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem "
        "GROUP BY 1").fetchall())
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.10


def test_quantiles_production(production, spark, sf_dir, duck):
    df = REGISTRY["agg_quantiles_approx"].fn(spark, sf_dir)
    assert df.columns == ["l_returnflag", "approx_q25", "approx_median",
                          "approx_q75"]
    assert "percentile(" not in _plan(df).replace("approx_percentile", "")
    got = {r.l_returnflag: (r.approx_q25, r.approx_median, r.approx_q75)
           for r in df.collect()}
    exact = {f: (q25, q50, q75) for f, q25, q50, q75 in duck.execute(
        "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.25), "
        "quantile_cont(l_extendedprice, 0.5), "
        "quantile_cont(l_extendedprice, 0.75) FROM lineitem GROUP BY 1"
    ).fetchall()}
    for flag, qs in got.items():
        for a, e in zip(qs, exact[flag]):
            assert abs(a - e) / abs(e) <= 0.05


def test_freq_items_production(production, spark, sf_dir, duck):
    df = REGISTRY["agg_freq_items"].fn(spark, sf_dir)
    assert df.columns == ["approx_frequent_priorities",
                          "approx_frequent_statuses"]
    row = df.collect()[0]
    exact_p = [v for (v,) in duck.execute(
        "SELECT o_orderpriority FROM orders GROUP BY 1 HAVING "
        "COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) > 0.2").fetchall()]
    # freqItems never under-reports true heavy hitters
    found = set(row.approx_frequent_priorities.split(","))
    assert set(exact_p) <= found


def test_hll_union_production(production, spark, sf_dir, duck):
    df = REGISTRY["agg_hll_sketch_union"].fn(spark, sf_dir)
    assert df.columns == ["l_returnflag", "approx_parts"]
    got = {r.l_returnflag: r.approx_parts for r in df.collect()}
    exact = dict(duck.execute(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem "
        "GROUP BY 1 UNION ALL SELECT 'ALL', COUNT(DISTINCT l_partkey) "
        "FROM lineitem").fetchall())
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.10


def test_minhash_lsh_production(production, spark, sf_dir):
    df = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    assert df.columns == ["doc_a", "doc_b", "jaccard"]
    rows = df.collect()
    assert rows, "LSH pipeline found no near-dup pairs"
    # verification guarantees zero false positives on emitted rows
    assert all(r.jaccard >= 0.6 and r.doc_a < r.doc_b for r in rows)


def test_simhash_production(production, spark, sf_dir):
    from house_price_etl_pipeline_spark.operators.dedup import (
        SIMHASH_HAMMING_MAX)

    df = REGISTRY["dedup_simhash"].fn(spark, sf_dir)
    assert df.columns == ["doc_a", "doc_b", "hamming"]
    rows = df.collect()
    assert rows
    assert all(r.hamming <= SIMHASH_HAMMING_MAX for r in rows)


def test_clusters_production(production, spark, sf_dir):
    df = REGISTRY["dedup_clusters"].fn(spark, sf_dir)
    assert df.columns == ["doc_id", "keep_doc_id", "cluster_size"]
    rows = df.collect()
    assert rows
    # min-label canonicalization: representative <= every member
    assert all(r.keep_doc_id <= r.doc_id for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)


@pytest.mark.parametrize("name", ["sim_ann_lsh_topk", "sim_ann_ivf_topk"])
def test_ann_production(production, spark, sf_dir, name):
    from house_price_etl_pipeline_spark.operators.similarity import TOP_K

    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns == ["vec_id", "label", "cosine"]
    rows = df.collect()
    assert 0 < len(rows) <= TOP_K
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_stream_dedup_production(production, spark, sf_dir):
    df = REGISTRY["stream_dedup_ingest"].fn(spark, sf_dir)
    assert df.columns == ["new_doc", "corpus_doc", "jaccard"]
    rows = df.collect()
    assert rows
    assert all(r.jaccard >= 0.6 and r.new_doc % 5 == 0
               and r.corpus_doc % 5 != 0 for r in rows)


def test_gate_mode_schema_unchanged(spark, sf_dir):
    """Default env (twin-on) keeps the oracle-gate schemas the driver
    hashes against — production mode must not leak into the gate."""
    assert REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).columns == \
        ["l_returnflag", "exact_parts", "within_tolerance"]
    assert REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).columns == \
        ["doc_a", "doc_b", "jaccard", "lsh_recall_ok"]


def test_ann_batch_lsh_production(production, spark, sf_dir):
    from house_price_etl_pipeline_spark.operators.similarity import (
        ANN_BATCH_K, ANN_BATCH_QUERIES)

    df = REGISTRY["sim_ann_batch_lsh_topk"].fn(spark, sf_dir)
    assert df.columns == ["query_id", "rnk", "vec_id", "cos_sim"]
    rows = df.collect()
    assert 0 < len(rows) <= ANN_BATCH_QUERIES * ANN_BATCH_K
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(rnks == list(range(1, len(rnks) + 1))
               for rnks in per_q.values())


def test_semdedup_production_no_driver_centroids(production, spark, sf_dir,
                                                 monkeypatch):
    """VERDICT r9 item 3: in production mode the SemDeDup assignment
    pass must not collect a centroid matrix to the driver — the
    closure-shipping helpers are poisoned and the query must still run
    end-to-end via the DataFrame-native broadcast-join path."""
    import house_price_etl_pipeline_spark.operators.similarity as sim

    def boom(*a, **k):
        raise AssertionError(
            "driver-collected centroid path used in production mode")

    monkeypatch.setattr(sim, "_lloyd_centroids", boom)
    monkeypatch.setattr(sim, "_nearest_udf", boom)
    df = REGISTRY["sim_semdedup_prune"].fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["vec_id", "cluster", "is_kept", "dup_of"]
    assert len(rows) > 0


def test_semdedup_production_agreement_floor(spark, sf_dir, monkeypatch):
    """The production (sample-train + broadcast-join) clustering must
    agree with the exact twin's verdicts: at the gate SF the sample
    covers the corpus and the init is identical, so keep/drop decisions
    should match near-perfectly — the floor guards against a silently
    divergent production path."""
    monkeypatch.setenv("SPARK_GRAFT_EXACT_TWIN", "1")
    exact = {r.vec_id: (r.cluster, r.is_kept)
             for r in REGISTRY["sim_semdedup_prune"].fn(
                 spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_EXACT_TWIN", "0")
    prod = {r.vec_id: (r.cluster, r.is_kept)
            for r in REGISTRY["sim_semdedup_prune"].fn(
                spark, sf_dir).collect()}
    assert prod.keys() == exact.keys() and len(prod) > 0
    n = len(prod)
    same_cluster = sum(prod[v][0] == exact[v][0] for v in prod) / n
    same_keep = sum(prod[v][1] == exact[v][1] for v in prod) / n
    assert same_cluster >= 0.95, same_cluster
    assert same_keep >= 0.95, same_keep


def test_lloyd_sample_cap_scales_with_k(spark):
    """ADVICE r10: a fixed training-sample cap below k silently
    produces fewer than k clusters (init takes k rows from a smaller
    sample). The cap must widen to ≥ SEMDEDUP_MIN_TRAIN_PER_CLUSTER×k
    so corpus-derived k past the cap still yields exactly k centroids."""
    import house_price_etl_pipeline_spark.operators.similarity as sim

    e = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 11)]) for i in range(200)],
        "vec_id long, embedding array<double>")
    k = 8
    # sample_cap=4 < k: the pre-fix behavior trains on 4 vectors and
    # returns 4 clusters; the scaled cap restores all k
    cdf = sim._lloyd_centroids_production(e, k, iters=1, sample_cap=4)
    assert cdf.count() == k


def test_curation_percentiles_production(production, spark, sf_dir, duck):
    """The three percentile-based curation/feature queries swap the
    exact interpolating percentile for the approx sketch in production
    mode — same plan shape, values within the sketch envelope."""
    df = REGISTRY["clean_winsorize_prices"].fn(spark, sf_dir)
    assert "percentile(" not in _plan(df).replace("approx_percentile", "")
    got = {r.l_returnflag: r.mean_winsorized for r in df.collect()}
    exact = dict(duck.execute("""
        WITH bounds AS (
          SELECT l_returnflag, quantile_cont(l_extendedprice, 0.05) lo,
                 quantile_cont(l_extendedprice, 0.95) hi
          FROM lineitem GROUP BY 1)
        SELECT l.l_returnflag,
               SUM(least(greatest(l.l_extendedprice, b.lo), b.hi))
                 / COUNT(*)
        FROM lineitem l JOIN bounds b USING (l_returnflag)
        GROUP BY 1""").fetchall())
    for flag, m in got.items():
        assert abs(m - exact[flag]) / exact[flag] <= 0.02

    for name in ("feature_equidepth_bins", "feature_quantile_normalize"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert "percentile(" not in _plan(df).replace("approx_percentile",
                                                      ""), name
        assert df.count() > 0, name


def test_stratified_exact_prethin_production(production, spark, sf_dir):
    """Production mode pre-thins each stratum with a hash-prefix band
    before the rank window — the result must still be EXACTLY the
    gate-mode sample (the band keeps the smallest hashes, a superset of
    the final pick), while the window input is bounded."""
    import os

    from house_price_etl_pipeline_spark.plans.catalog import REGISTRY
    thin = REGISTRY["sample_stratified_exact"].fn(spark, sf_dir)
    prod_rows = sorted(map(tuple, thin.collect()))
    os.environ["SPARK_GRAFT_EXACT_TWIN"] = "1"
    try:
        full = REGISTRY["sample_stratified_exact"].fn(spark, sf_dir)
        gate_rows = sorted(map(tuple, full.collect()))
    finally:
        os.environ["SPARK_GRAFT_EXACT_TWIN"] = "0"
    assert prod_rows == gate_rows and len(prod_rows) > 0
