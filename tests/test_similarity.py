"""Similarity-search tests: ANN recall vs brute force on the real
embeddings table, and plumbing checks for the vector expressions."""

from __future__ import annotations

from house_price_etl_pipeline_spark.plans.catalog import REGISTRY, load_all

load_all()


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    truth = [r.vec_id for r in
             REGISTRY["sim_bruteforce_topk"].fn(spark, sf_dir).collect()]
    from house_price_etl_pipeline_spark.operators.similarity import (
        lsh_ann_topk)

    ann = [r.vec_id for r in lsh_ann_topk(spark, sf_dir).collect()]
    overlap = len(set(truth) & set(ann)) / len(truth)
    # 16 tables x 4 bits on a corpus whose true neighbors sit at only
    # cosine ~0.3-0.45: theoretical recall ≈ 0.9; assert with margin.
    assert overlap >= 0.6, f"ANN recall@10 = {overlap:.2f}"


def test_bruteforce_topk_is_sorted_desc(spark, sf_dir):
    rows = REGISTRY["sim_bruteforce_topk"].fn(spark, sf_dir).collect()
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert len(rows) == 10
    assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_norm_stats_plausible(spark, sf_dir):
    rows = REGISTRY["sim_embedding_norm_stats"].fn(spark, sf_dir).collect()
    assert {r.label for r in rows} == set(range(10))
    for r in rows:
        assert 0 < r.min_norm <= r.avg_norm <= r.max_norm


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    truth = [r.vec_id for r in
             REGISTRY["sim_bruteforce_topk"].fn(spark, sf_dir).collect()]
    from house_price_etl_pipeline_spark.operators.similarity import (
        ivf_ann_topk)

    ivf = [r.vec_id for r in ivf_ann_topk(spark, sf_dir).collect()]
    overlap = len(set(truth) & set(ivf)) / len(truth)
    # nprobe=4 of 32 random cells on weak-structure data: assert a floor
    # well above the 12.5% a random 4-cell subset would give
    assert overlap >= 0.4, f"IVF recall@10 = {overlap:.2f}"


def test_kmeans_lloyd_matches_numpy_replica(spark, sf_dir):
    """Replay init + KMEANS_ITERS Lloyd rounds in numpy (same
    deterministic init, same argmin tie rule) and compare the full
    assignment vector. The engine's decimal-exact centroid means differ
    from numpy float64 means by ~1e-13, so allow a one-in-500 near-tie
    flip — in practice the match is exact."""
    import numpy as np

    from house_price_etl_pipeline_spark.operators.similarity import (
        KMEANS_ITERS, KMEANS_K, sim_kmeans_lloyd)
    from house_price_etl_pipeline_spark.sources.tables import load_table

    rows = (load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding").orderBy("vec_id").collect())
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    C = X[:KMEANS_K].copy()
    for _ in range(KMEANS_ITERS):
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = np.argmin(D, axis=1)
        for k in range(KMEANS_K):
            if (cl == k).any():
                C[k] = X[cl == k].mean(axis=0)
    D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    expect = dict(zip(ids.tolist(), np.argmin(D, axis=1).tolist()))

    got = {r.vec_id: r.cluster
           for r in sim_kmeans_lloyd(spark, sf_dir).collect()}
    assert len(got) == len(expect)
    mismatches = sum(1 for v, c in got.items() if expect[v] != c)
    assert mismatches <= len(expect) // 500
    assert len(set(got.values())) == KMEANS_K  # no collapsed clusters


def test_ann_exact_twin_entries_report_recall_ok(spark, sf_dir):
    """The oracled ANN entries must emit the exact top-k rows with a
    TRUE in-plan recall boolean (the real ANN pipeline feeds it)."""
    truth = [(r.vec_id, r.cosine) for r in
             REGISTRY["sim_bruteforce_topk"].fn(spark, sf_dir).collect()]
    for name in ("sim_ann_lsh_topk", "sim_ann_ivf_topk"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        assert [(r.vec_id, r.cosine) for r in rows] == truth, name
        assert all(r.ann_recall_ok for r in rows), name


def test_batch_lsh_ann_recall_and_candidate_shuffle(spark, sf_dir):
    """Bucketed batch ANN serving (VERDICT r3 item 6): recall vs the
    exact batch top-k holds the floor, and the LSH plan's joins are
    broadcast-shaped — the only exchanged relation is candidate-sized
    (no corpus-scale shuffle in the serving path)."""
    from house_price_etl_pipeline_spark.operators.similarity import (
        ANN_BATCH_LSH_RECALL_FLOOR, lsh_batch_ann_topk,
        sim_ann_batch_topk_join)

    exact = {(r.query_id, r.vec_id)
             for r in sim_ann_batch_topk_join(spark, sf_dir).collect()}
    ann = lsh_batch_ann_topk(spark, sf_dir)
    found = {(r.query_id, r.vec_id) for r in ann.collect()}
    assert len(exact & found) / len(exact) >= ANN_BATCH_LSH_RECALL_FLOOR

    plan = ann._jdf.queryExecution().executedPlan().toString()
    # query-side signatures and embeddings ride broadcasts; the bucket
    # join must not shuffle the corpus on a pair key
    assert plan.count("BroadcastHashJoin") >= 2


def test_semdedup_k_derivation():
    """k = ceil(n / SEMDEDUP_VECS_PER_CLUSTER), floored at KMEANS_K
    (VERDICT r7 item 5): cluster membership stays ~constant as the
    corpus grows, so the per-cluster Gram kernel's Arrow batch is
    bounded at every scale."""
    from house_price_etl_pipeline_spark.operators.similarity import (
        KMEANS_K, SEMDEDUP_VECS_PER_CLUSTER, _semdedup_k)

    v = SEMDEDUP_VECS_PER_CLUSTER
    assert _semdedup_k(1) == KMEANS_K
    assert _semdedup_k(KMEANS_K * v) == KMEANS_K
    assert _semdedup_k(KMEANS_K * v + 1) == KMEANS_K + 1
    assert _semdedup_k(100 * v) == 100
    # 64x the sf0.1 corpus: membership stays ~SEMDEDUP_VECS_PER_CLUSTER
    assert 2000 * 64 / _semdedup_k(2000 * 64) <= v


def test_semdedup_parity_with_derived_k_above_floor(spark, sf_dir, duck,
                                                    monkeypatch):
    """Both engines must track the DERIVED k, not just the KMEANS_K
    floor the bench SFs sit at: shrink the target cluster size so the
    sf0.001 corpus (500 vectors) derives k=16, and compare Spark vs
    the dynamically-k'd DuckDB oracle value-for-value."""
    from house_price_etl_pipeline_spark.operators import similarity as sim
    from tests.test_oracle_parity import _normalize

    monkeypatch.setattr(sim, "SEMDEDUP_VECS_PER_CLUSTER", 32)
    assert sim._semdedup_k(500) == 16

    spark_pdf = sim.sim_semdedup_prune(spark, sf_dir).toPandas()
    assert spark_pdf["cluster"].nunique() > sim.KMEANS_K  # floor exceeded

    k_sql = ("(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / 32.0) AS BIGINT)) "
             "FROM embeddings)")
    oracle = sim._kmeans_oracle(k=k_sql, tail=sim._SEMDEDUP_TAIL)
    duck_pdf = duck.execute(oracle).fetchdf()

    assert len(spark_pdf) == len(duck_pdf)
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert _normalize(spark_pdf) == _normalize(duck_pdf)
