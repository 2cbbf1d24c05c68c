"""Similarity search over ``embeddings.embedding`` (array<float>, 64-dim).

Two paths behind one result shape (SURVEY §7.4):
- brute-force cosine top-k — exact, oracle-checked, O(n) per query: the
  correctness baseline and perfectly adequate when the query side is
  small (scoring candidates, eval sets);
- random-hyperplane LSH (SimHash for cosine, Charikar '02) — signature
  bits from sign(v·h), candidates from signature-chunk bucket equi-joins,
  exact re-rank of candidates only. At 100 TB the bucket join is the only
  shuffle and each bucket is small; recall vs brute force is asserted in
  tests/test_similarity.py.

All vector math is sequence/zip_with/aggregate folds with element-wise
double casts — JVM-side, codegen'd, and bit-identical to the DuckDB
oracle's list_transform/list_sum (same left-to-right order).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import exact_twin_enabled
from ..plans.catalog import register
from ..sources.tables import load_table

EMB_DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10

_DOT_SQL = ("list_sum(list_transform(range(1, 65),"
            " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product with per-element double casts."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
      SELECT e.vec_id, e.label,
             round({_DOT_SQL.format(a='e.embedding', b='q.qv')}
                   / (sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                      * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})), 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine FROM scored
    ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector: broadcast the query (a
    1-row cross join), score every vector, TakeOrderedAndProject — no
    full sort, no shuffle of the scored set beyond the top-k heaps."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("embedding").alias("qv")))
    cos = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (l2_norm(F.col("embedding")) * l2_norm(F.col("qv"))),
        6,
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@register(
    "sim_embedding_norm_stats",
    oracle=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(CAST(sqrt({_DOT_SQL.format(a='embedding', b='embedding')})
                 AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm,
           round(MIN(sqrt({_DOT_SQL.format(a='embedding', b='embedding')})), 6) AS min_norm,
           round(MAX(sqrt({_DOT_SQL.format(a='embedding', b='embedding')})), 6) AS max_norm
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def sim_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the vector column: per-label L2-norm
    statistics (the sanity profile every embedding pipeline starts with)."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = l2_norm(F.col("embedding"))
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.sum(nrm.cast("decimal(25,6)")).cast("double") / F.count("*"), 6)
            .alias("avg_norm"),
            F.round(F.min(nrm), 6).alias("min_norm"),
            F.round(F.max(nrm), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


# --- LSH-bucketed ANN (the scale path) -------------------------------------

# Multi-table LSH: more tables with fewer bits trades candidate-set size
# for recall. 16 tables x 4 bits targets high recall even on a corpus
# whose nearest neighbors sit at cosine ~0.4 (p_bit ≈ 0.63 →
# P(candidate) ≈ 1-(1-0.63^4)^16 ≈ 0.94); a near-dup corpus (cos > 0.9)
# gets recall ≈ 1 with far fewer tables.
LSH_TABLES = 16
LSH_BITS = 4


def _hyperplanes(n: int = LSH_TABLES * LSH_BITS, dim: int = EMB_DIM,
                 seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded stdlib RNG — no
    runtime randomness, same planes every run/round)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n)]


def _bucket_keys_udf(tables: int = LSH_TABLES, bits: int = LSH_BITS):
    """Arrow-vectorized signature kernel: embedding → array of per-table
    packed sign-bit bucket keys.

    WHY a pandas_udf and not zip_with/aggregate folds: Spark evaluates
    higher-order-function lambdas interpreted, per element, outside
    whole-stage codegen — 64 plane dots per vector that way costs seconds
    even at 2k vectors. One numpy matmul per Arrow batch is ~100x that,
    and turns the whole signature step into a shuffle-free narrow map
    (the plane matrix rides along as a closure broadcast)."""
    M = np.asarray(_hyperplanes(tables * bits), dtype=np.float64).T  # dim x (t*b)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def keys(emb: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy()).astype(np.float64)      # n x dim
        S = (X @ M) > 0                                       # n x (t*b)
        vals = (S.reshape(len(X), tables, bits) * weights).sum(axis=2)
        return pd.Series(list(vals))

    return keys


def rhp_bucket_keys(vectors: DataFrame, spark: SparkSession | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    tables: int = LSH_TABLES, bits: int = LSH_BITS) -> DataFrame:
    """(id_col, cid, cval): one row per LSH table per vector, where cval
    packs that table's sign bits of v·h. Narrow map (Arrow batch matmul)
    + posexplode — no join, no shuffle; partitioning is preserved."""
    keys = _bucket_keys_udf(tables, bits)
    # Vector-kernel boundary contract (round 9 NULL audit): a NULL
    # embedding has no signature — np.vstack on a batch containing None
    # crashes the Arrow kernel, so absent vectors are dropped JVM-side
    # before the kernel (they can never be ANN candidates anyway).
    return (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(id_col, keys(F.col(vec_col)).alias("ks"))
        .select(id_col, F.posexplode("ks").alias("cid", "cval"))
    )


LSH_RECALL_FLOOR = 0.5   # measured 0.8-1.0 across sf0.001-0.1
IVF_RECALL_FLOOR = 0.2   # measured 0.4-0.7 (weak-structure corpus)


def _ann_with_exact_twin(spark: SparkSession, sf_dir: str,
                         ann_topk: DataFrame, floor: float) -> DataFrame:
    """Exact-twin oracle wrapper for ANN queries (same pattern as the
    approximate aggregates): output = the EXACT brute-force top-k rows
    (DuckDB-reproducible) + an in-plan ``ann_recall_ok`` boolean
    (|ANN ∩ exact| / k >= floor). The ANN pipeline stays fully
    exercised — buckets, probes, and re-rank feed the boolean, and a
    recall collapse flips it and fails the driver's value hash."""
    exact = sim_bruteforce_topk(spark, sf_dir)
    hits = (exact.join(ann_topk.select("vec_id"), "vec_id", "left_semi")
            .agg(F.count("*").alias("h")))
    return (
        exact.crossJoin(F.broadcast(hits))
        .select("vec_id", "label", "cosine",
                (F.col("h") * F.lit(1.0) / TOP_K >= floor)
                .alias("ann_recall_ok"))
        .orderBy(F.col("cosine").desc(), "vec_id")
    )


def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: multi-table random-hyperplane LSH — candidates are
    vectors sharing any table's bucket with the query; exact cosine
    re-rank of candidates only. Same output schema as
    sim_bruteforce_topk; recall asserted in tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    sig = rhp_bucket_keys(e)
    qsig = sig.filter(F.col("vec_id") == QUERY_VEC_ID).select("cid", "cval")
    cand_ids = (
        sig.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qsig), ["cid", "cval"])
        .select("vec_id").distinct()
    )
    qv = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
          .select(F.col("embedding").alias("qv")))
    cos = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (l2_norm(F.col("embedding")) * l2_norm(F.col("qv"))),
        6,
    )
    return (
        e.join(cand_ids, "vec_id")  # AQE broadcasts the small candidate set
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@register(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
      SELECT e.vec_id, e.label,
             round({_DOT_SQL.format(a='e.embedding', b='q.qv')}
                   / (sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                      * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})), 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine, TRUE AS ann_recall_ok FROM scored
    ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
    """,
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN under the value-hash gate via the exact-twin pattern:
    rows are the exact top-k (oracle-reproducible); ``ann_recall_ok``
    is computed in-plan from the REAL LSH pipeline's overlap with them
    (floor {LSH_RECALL_FLOOR}; measured 0.8-1.0). See lsh_ann_topk for
    the ANN plan itself. SPARK_GRAFT_EXACT_TWIN=0 → the LSH ANN plan's
    own top-k (no brute-force exact scoring in-plan)."""
    if not exact_twin_enabled():
        return lsh_ann_topk(spark, sf_dir)
    return _ann_with_exact_twin(spark, sf_dir,
                                lsh_ann_topk(spark, sf_dir),
                                LSH_RECALL_FLOOR)


# --- IVF (inverted-file) ANN: the other classic scale path -----------------

IVF_CELLS = 32     # coarse-quantizer cells (≈ sqrt(n) at this SF)
IVF_NPROBE = 8     # cells searched per query: this corpus's nearest
                   # neighbors sit at only cosine ~0.4 (weak structure),
                   # where the IVF recall/nprobe curve is shallow - 8/32
                   # cells ~ recall 0.6 vs 0.2 at 4/32 (measured); tight
                   # clusters would get recall ~1 at nprobe 1-2


def _centroids(cells: int = IVF_CELLS, dim: int = EMB_DIM,
               seed: int = 7) -> "np.ndarray":
    """Deterministic pseudo-random unit centroids. A production build
    would k-means-train these on a sample; the *engine* shape — narrow
    assignment map, cell-bucketed storage, nprobe search — is identical,
    and random centroids on unit-ish data still partition the space."""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((cells, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def _cell_udf(cells: int = IVF_CELLS):
    C = _centroids(cells).T  # dim x cells

    @F.pandas_udf("int")
    def cell_of(emb: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(X @ C, axis=1).astype("int32"))

    return cell_of


def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: every vector is assigned its nearest coarse
    centroid (Arrow-batched argmax matmul — shuffle-free narrow map; at
    rest this would be the partition/bucket key of the vector table), the
    query probes its IVF_NPROBE nearest cells, and only those cells'
    vectors get the exact cosine re-rank. Same output schema as
    sim_bruteforce_topk; recall asserted in tests/test_similarity.py."""
    # NULL embeddings can't be cell-assigned (vector-kernel boundary)
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull()))
    assigned = e.select("vec_id", "label", "embedding",
                        _cell_udf()(F.col("embedding")).alias("cell"))

    qv_row = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
              .select("embedding").collect()[0])
    qv = np.asarray(qv_row.embedding, dtype=np.float64)
    C = _centroids()
    probe_cells = [int(c) for c in np.argsort(-(C @ qv))[:IVF_NPROBE]]

    q = (e.filter(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("embedding").alias("qv")))
    cos = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (l2_norm(F.col("embedding")) * l2_norm(F.col("qv"))),
        6,
    )
    return (
        assigned.filter(F.col("cell").isin(probe_cells))  # partition-prunable
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOP_K)
    )


@register(
    "sim_ann_ivf_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
      SELECT e.vec_id, e.label,
             round({_DOT_SQL.format(a='e.embedding', b='q.qv')}
                   / (sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                      * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})), 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine, TRUE AS ann_recall_ok FROM scored
    ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
    """,
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN under the value-hash gate via the exact-twin pattern:
    rows are the exact top-k; ``ann_recall_ok`` comes from the real
    IVF probe pipeline's overlap with them (floor {IVF_RECALL_FLOOR};
    measured 0.4-0.7 on this weak-structure corpus). See ivf_ann_topk
    for the ANN plan itself. SPARK_GRAFT_EXACT_TWIN=0 → the IVF probe
    plan's own top-k (no brute-force exact scoring in-plan)."""
    if not exact_twin_enabled():
        return ivf_ann_topk(spark, sf_dir)
    return _ann_with_exact_twin(spark, sf_dir,
                                ivf_ann_topk(spark, sf_dir),
                                IVF_RECALL_FLOOR)


# --- embedding maintenance ops: centroids, normalize + quantize ------------

@register(
    "emb_centroid_per_label",
    oracle="""
    SELECT e.label, i.pos,
           round(CAST(SUM(CAST(list_extract(e.embedding, i.pos + 1)
                               AS DECIMAL(25,12))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid
    FROM embeddings e, (SELECT unnest(range(0, 64)) AS pos) i
    WHERE e.embedding IS NOT NULL
    GROUP BY e.label, i.pos
    ORDER BY e.label, i.pos
    """,
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector — the k-means / IVF-coarse-quantizer update
    step and the class-prototype primitive. posexplode → (label, pos)
    agg: ONE shuffle keyed on (label, dim) — 640 keys here, and at any
    scale the key space is labels × dims, never rows. Exact decimal inner
    sums make each coordinate bit-stable across partitionings."""
    # posexplode silently drops NULL-embedding rows in Spark, but the
    # oracle's cross join would keep them in COUNT(*) — both sides now
    # exclude them explicitly (a NULL vector has no coordinates to mean)
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull()))
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(
            F.sum(F.col("x").cast("decimal(25,12)")).cast("double") / F.count("*"),
            6).alias("centroid"))
        .orderBy("label", "pos")
    )


@register(
    "emb_normalize_quantize",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings WHERE vec_id < 500
    )
    SELECT vec_id, round(nrm, 6) AS l2_norm,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0 + 0.5)
                            AS INTEGER) AS VARCHAR)), ',')
             AS q_int8
    FROM n ORDER BY vec_id
    """,
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize then symmetric int8 quantization (scale 127) — the
    4-8x storage/bandwidth shrink applied before ANN serving. Narrow map,
    no shuffle; rounding spelled floor(x+0.5) so both engines share one
    deterministic tie rule (round() half-handling differs by engine).
    Element order: list_transform/F.transform preserve positions; the
    int8 vector is CSV-serialized so the output schema is scalar-only."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    x2 = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    nrm = F.sqrt(F.aggregate(x2, F.lit(0.0), lambda acc, v: acc + v))
    return (
        e.withColumn("nrm", nrm)
        .select(
            "vec_id",
            F.round("nrm", 6).alias("l2_norm"),
            F.concat_ws(",", F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") / F.col("nrm") * 127.0 + 0.5)
                .cast("int").cast("string"),
            )).alias("q_int8"),
        )
        .orderBy("vec_id")
    )


@register(
    "emb_arrow_norm_profile",
    oracle=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(round(sqrt({_DOT_SQL.format(a='embedding', b='embedding')}), 6)
                AS DECIMAL(25,6))) AS DOUBLE) AS sum_norm,
           CAST(SUM(len(list_filter(embedding, x -> abs(x) > 0.5))) AS BIGINT)
             AS n_large_components
    FROM embeddings WHERE embedding IS NOT NULL
    GROUP BY label ORDER BY label
    """,
)
def emb_arrow_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface: a zero-copy Arrow-batch kernel (pyarrow →
    numpy views, no pandas materialization) computing per-vector L2 norm
    and large-component count, aggregated per label. The squared-sum is
    a LEFT FOLD across the 64 dims (a vectorized per-dim accumulate over
    the whole batch), bit-identical to the SQL oracle's sequential
    list_sum — numpy's pairwise summation would differ in the last bits.
    mapInArrow vs pandas_udf: no Series boxing, the kernel sees the
    Arrow buffers the JVM shipped — the cheapest Python hop Spark has."""
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for batch in batches:
            vec_id = batch.column("vec_id").to_numpy(zero_copy_only=False)
            # label passes through as the original Arrow array so a
            # NULL label survives (an astype('int32') round-trip would
            # mangle NULL→NaN→garbage); NULL-label vectors are a valid
            # group in both engines
            label = batch.column("label")
            emb = batch.column("embedding")
            x = emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64).reshape(len(batch), EMB_DIM)
            acc = np.zeros(len(batch))
            for j in range(EMB_DIM):            # left fold, SQL-order
                acc = acc + x[:, j] * x[:, j]
            yield pa.RecordBatch.from_arrays(
                [pa.array(vec_id), label.cast(pa.int32()),
                 pa.array(np.round(np.sqrt(acc), 6)),
                 pa.array((np.abs(x) > 0.5).sum(axis=1).astype("int64"))],
                names=["vec_id", "label", "norm", "n_large"])

    # NULL embeddings would break the flatten/reshape (the flatten
    # drops NULL slots); excluded on both sides (vector-kernel boundary)
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull()))
    per_vec = e.mapInArrow(
        kernel, "vec_id long, label int, norm double, n_large long")
    return (
        per_vec.groupBy("label")
        .agg(F.count("*").alias("n_vecs"),
             F.sum(F.col("norm").cast("decimal(25,6)")).cast("double")
             .alias("sum_norm"),
             F.sum("n_large").alias("n_large_components"))
        .orderBy("label")
    )


# --- distributed k-means (Lloyd iterations) --------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _nearest_udf(C: "np.ndarray"):
    """Arrow-batched nearest-centroid assignment for a FIXED centroid
    matrix: argmin over squared L2 via the matmul identity
    |x-c|² = |x|² - 2x·c + |c|² (ties → lowest cluster index, numpy
    argmin semantics — deterministic). The centroid matrix rides to the
    executors inside the UDF closure — k×dim doubles, the same
    broadcast-a-small-side discipline as every dimension join."""
    Ct = C.T.copy()                    # dim × k
    c2 = (C * C).sum(axis=1)           # |c|² per cluster

    @F.pandas_udf("struct<cluster:int, dist2:double>")
    def nearest(emb: pd.Series) -> pd.DataFrame:
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        D = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ Ct) + c2
        cl = np.argmin(D, axis=1)
        return pd.DataFrame({
            "cluster": cl.astype("int32"),
            "dist2": np.maximum(D[np.arange(len(cl)), cl], 0.0),
        })

    return nearest


def _lloyd_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lloyd trainers' shared input: non-NULL (vec_id, embedding),
    materialized ONCE for the loop — the iteration re-reads its input
    KMEANS_ITERS+2 times (init collect, per-round assign, final
    assignment), and without the checkpoint each pass re-scans the
    parquet and re-runs the filter (guide §5: persist when reused and
    recompute isn't free; measured −0.25 s at sf0.1). Same storage
    discipline as pagerank's edge checkpoint: a large memory-resident
    corpus cache would pin the storage half of the unified pool, so a
    big table checkpoints DISK_ONLY."""
    from ..sources.tables import table_rowcount

    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull())
         .select("vec_id", "embedding"))
    if table_rowcount(spark, sf_dir, "embeddings") > 2_000_000:
        from pyspark import StorageLevel
        return e.localCheckpoint(eager=True,
                                 storageLevel=StorageLevel.DISK_ONLY)
    return e.localCheckpoint(eager=True)


def _lloyd_centroids(e: DataFrame, k: int = KMEANS_K) -> "np.ndarray":
    """KMEANS_ITERS Lloyd rounds over (vec_id, embedding); returns the
    trained centroid matrix. Deterministic init (k lowest vec_ids);
    each round is a narrow Arrow assign + ONE (k×dim)-key shuffle +
    a k×dim-row centroid collect — see sim_kmeans_lloyd. The collect
    and the closure-shipped centroid matrix stay bounded because k is
    either the fixed demo KMEANS_K or SemDeDup's corpus-derived
    n/SEMDEDUP_VECS_PER_CLUSTER at the gate SFs; past ~10^5 clusters
    the production build (_lloyd_centroids_production, wired behind
    SPARK_GRAFT_EXACT_TWIN=0) trains on a sample and broadcast-joins
    assignments instead of closure-shipping C — the per-cluster engine
    shape downstream is unchanged."""
    init = (e.orderBy("vec_id").limit(k)
            .select("embedding").collect())
    C = np.array([r.embedding for r in init], dtype=np.float64)
    # Round-15 negative result (VERDICT r14 item 5): rewriting the
    # UPDATE as one k-group aggregate with a decimal sum PER DIMENSION
    # (decimal addition is exact, so per-dim column sums are
    # bit-identical to the exploded per-(cluster,pos) sums) was
    # measured 1.7→3.6 s — 64 decimal Sum buffers in one HashAggregate
    # lose to posexplode's narrow (k×dim)-key partial aggregation.
    # Kept: the posexplode shape.
    for _ in range(KMEANS_ITERS):
        assigned = e.select(
            "vec_id", "embedding",
            _nearest_udf(C)(F.col("embedding")).alias("a"))
        upd = (
            assigned.select(F.col("a.cluster").alias("cluster"),
                            F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg((F.sum(F.col("x").cast("decimal(25,12)")).cast("double")
                  / F.count("*")).alias("c"))
            .collect()
        )
        C = C.copy()
        for r in upd:                   # empty clusters keep their centroid
            C[r.cluster, r.pos] = r.c
    return C


# --- production Lloyd: centroids never leave the cluster -------------------

# vectors used to train Lloyd in production mode — FAISS-style
# sample-train: centroid quality needs a bounded sample (~dozens of
# vectors per centroid), not the corpus; assignment of the full corpus
# happens once, against the trained centroids
SEMDEDUP_TRAIN_SAMPLE = 1 << 16
# floor of training vectors per centroid: the Lloyd sample cap widens
# to this × k when corpus-derived k approaches the fixed cap (ADVICE
# r10 — otherwise n > ~64M vectors silently under-produces clusters)
SEMDEDUP_MIN_TRAIN_PER_CLUSTER = 32


def _pair_dist2_udf():
    import pandas as pd

    @F.pandas_udf("double")
    def dist2(emb: pd.Series, cen: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        C = np.vstack(cen.to_numpy()).astype(np.float64)
        d = X - C
        return pd.Series((d * d).sum(axis=1))

    return dist2


def _assign_broadcast_join(e: DataFrame, cdf: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with the centroids in a DATAFRAME —
    the production path (VERDICT r9 item 3): no driver-collected k×dim
    matrix, no closure shipping. The k-row centroid side broadcasts
    into a nested-loop join (a deliberate k-row crossJoin — the ANN
    assignment shape, not a scalar), per-pair distance is one
    Arrow-vectorized kernel, and the argmin is a map-side-partial
    min(struct(dist2, cluster)) groupBy — ties break to the lowest
    cluster index, numpy argmin semantics. Work is O(n·k·dim) flops
    either way; this shape keeps every piece executor-side and
    memory-bounded at any k."""
    pairs = e.crossJoin(F.broadcast(cdf))
    scored = pairs.withColumn(
        "dist2", _pair_dist2_udf()(F.col("embedding"), F.col("centroid")))
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("dist2"), F.col("cluster"))).alias("m"),
             F.any_value("embedding").alias("embedding"))
        .select("vec_id", "embedding",
                F.col("m.cluster").alias("cluster"))
    )


def _lloyd_centroids_production(e: DataFrame, k: int,
                                iters: int = KMEANS_ITERS,
                                sample_cap: int = SEMDEDUP_TRAIN_SAMPLE
                                ) -> DataFrame:
    """Lloyd training with the centroid set kept distributed end-to-end
    (returns a (cluster, centroid) DataFrame): train on a deterministic
    hash-ordered sample of ≤ sample_cap vectors, assign each round via
    the broadcast-join kernel, update as a (k×dim)-key decimal-exact
    mean, and rebuild the centroid arrays with a collect_list sorted by
    position — no step collects the centroid matrix to the driver, so
    corpus-derived k (SemDeDup's n/SEMDEDUP_VECS_PER_CLUSTER) has no
    driver-memory cliff. Init is the k lowest vec_ids of the sample
    (one k-row window task — bounded by k, not n). localCheckpoint per
    round truncates the iterative lineage, the pagerank discipline.

    The sample cap SCALES WITH k (ADVICE r10): corpus-derived k =
    n/1024 can exceed a fixed cap past ~64M vectors, which would both
    silently produce fewer than k clusters (init takes k rows from a
    smaller sample) and train on ~1 vector per centroid. We widen the
    cap to ≥ SEMDEDUP_MIN_TRAIN_PER_CLUSTER × k so every centroid sees
    a few dozen training vectors regardless of corpus size."""
    from pyspark.sql import Window

    sample_cap = max(sample_cap, SEMDEDUP_MIN_TRAIN_PER_CLUSTER * k)
    train = (e.withColumn("_h", F.xxhash64("vec_id"))
             .orderBy("_h").limit(sample_cap).drop("_h")
             .localCheckpoint(eager=True))
    cdf = (train.orderBy("vec_id").limit(k)
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("centroid"))
           .withColumn("cluster",
                       (F.row_number().over(Window.orderBy("vec_id")) - 1)
                       .cast("int"))
           .select("cluster", "centroid")
           .localCheckpoint(eager=True))
    for _ in range(iters):
        assigned = _assign_broadcast_join(train, cdf)
        upd = (
            assigned.select("cluster",
                            F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg((F.sum(F.col("x").cast("decimal(25,12)")).cast("double")
                  / F.count("*")).alias("c"))
        )
        new_c = (
            upd.groupBy("cluster")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"]).alias("centroid"))
        )
        cdf = (cdf.alias("o")
               .join(new_c.alias("n"), "cluster", "left")
               .select("cluster",
                       F.coalesce(F.col("n.centroid"), F.col("o.centroid"))
                       .alias("centroid"))    # empty clusters keep theirs
               .localCheckpoint(eager=True))
    return cdf


def _kmeans_oracle(k=None, iters: int = None,
                   tail: str = None) -> str:
    """DuckDB oracle for Lloyd k-means, rounds unrolled as chained CTEs
    (same recipe as graph._pagerank_oracle). Parity holds because the
    UPDATE step is decimal-exact in BOTH engines (sum(DECIMAL)/count →
    identical centroid bits given identical assignments), the ASSIGN
    step mirrors the kernel's |x|²−2x·c+|c|² identity with the same
    0-clamp and lowest-index tie rule, and float drift between the
    engines (~1e-14, summation order) only matters on exact-tie
    distances, which the shared tie rule resolves identically.

    ``k`` is an int or a SQL scalar expression string (SemDeDup passes
    the corpus-derived ``(SELECT GREATEST(...) FROM embeddings)`` so
    the oracle's cluster count tracks the Spark side's at every SF)."""
    k = KMEANS_K if k is None else k
    iters = KMEANS_ITERS if iters is None else iters
    parts = [f"""WITH emb_nn AS (
      SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    ev AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM emb_nn, UNNEST(generate_series(1, len(embedding))) AS s(i)),
    x2 AS (SELECT vec_id, SUM(x * x) AS x2 FROM ev GROUP BY 1),
    c0 AS (
      SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cluster, pos, x AS c
      FROM ev WHERE vec_id IN
        (SELECT vec_id FROM emb_nn ORDER BY vec_id LIMIT {k}))"""]
    for i in range(1, iters + 2):  # iters updates + 1 final assignment
        prev = f"c{i - 1}"
        parts.append(f"""cs{i} AS (
      SELECT cluster, SUM(c * c) AS c2 FROM {prev} GROUP BY 1),
    d{i} AS (
      SELECT e.vec_id, c.cluster,
             GREATEST(x2.x2 - 2 * SUM(e.x * c.c)
                      + ANY_VALUE(cs.c2), 0) AS dist2
      FROM ev e JOIN {prev} c ON e.pos = c.pos
      JOIN x2 ON e.vec_id = x2.vec_id
      JOIN cs{i} cs ON c.cluster = cs.cluster
      GROUP BY e.vec_id, c.cluster, x2.x2),
    a{i} AS (
      SELECT vec_id, cluster, dist2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist2, cluster) AS rn
      FROM d{i})""")
        if i <= iters:
            parts.append(f"""m{i} AS (
      SELECT s.cluster, e.pos,
             CAST(SUM(CAST(e.x AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS c
      FROM (SELECT vec_id, cluster FROM a{i} WHERE rn = 1) s
      JOIN ev e ON s.vec_id = e.vec_id GROUP BY 1, 2),
    c{i} AS (
      SELECT p.cluster, p.pos, COALESCE(m.c, p.c) AS c
      FROM {prev} p LEFT JOIN m{i} m
        ON p.cluster = m.cluster AND p.pos = m.pos)""")
    last = iters + 1
    if tail is None:
        tail = f"""\nSELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
       round(dist2, 6) AS dist2
FROM a{last} WHERE rn = 1 ORDER BY vec_id"""
    return ",\n".join(parts) + tail.replace("{last}", str(last))


@register("sim_kmeans_lloyd", oracle=_kmeans_oracle())
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means, KMEANS_ITERS Lloyd rounds: the trained
    version of the IVF coarse quantizer above (whose centroids are
    random by design — see _centroids). Each round is

      1. ASSIGN — narrow Arrow-batched argmin map, zero shuffle; the
         centroid matrix is closure-shipped (k×dim, broadcast-sized);
      2. UPDATE — posexplode → groupBy (cluster, dim) mean: ONE shuffle
         whose key space is k×dim (512 here), never rows, with
         decimal-exact sums so centroids are partition-order-stable;
      3. a k×dim-row collect of the new centroids — a bounded driver
         scalar per round, the same class as dedup.py's convergence
         counts (NOT a data collect; at 100 TB it is still 512 rows).

    Init is deterministic: the K lowest-vec_id vectors. The oracle is
    the rounds-unrolled chained-CTE form (_kmeans_oracle); the loop
    itself lives in _lloyd_centroids, shared with sim_semdedup_prune."""
    # NULL embeddings can't be assigned/averaged (vector-kernel boundary);
    # the oracle's emb_nn CTE applies the same filter
    e = _lloyd_vectors(spark, sf_dir)
    C = _lloyd_centroids(e)
    final = e.select(
        "vec_id", _nearest_udf(C)(F.col("embedding")).alias("a"))
    return (
        final.select(
            "vec_id", F.col("a.cluster").alias("cluster"),
            F.round(F.col("a.dist2"), 6).alias("dist2"))
        .orderBy("vec_id")
    )


SEMDEDUP_TAU = 0.35
# target cluster membership: k = ceil(n / this), floored at KMEANS_K.
# Keeps the per-cluster Gram matrix ~(2×1024)²×8 B ≈ 34 MB worst-case
# per Arrow batch no matter the corpus size (VERDICT r7 item 5 — the
# fixed k=8 made cluster size n/8, an O((n/8)²) single-batch kernel
# that dies at 100× scale). At the bench SFs (≤2000 vectors) k stays
# at the KMEANS_K floor, so results and plans there are unchanged.
SEMDEDUP_VECS_PER_CLUSTER = 1024

# the same formula, spelled for the DuckDB oracle: cluster count must
# track the Spark side at every SF, so it's derived in-query
_SEMDEDUP_K_SQL = (f"(SELECT GREATEST({KMEANS_K}, CAST(CEIL(COUNT(*) / "
                   f"{SEMDEDUP_VECS_PER_CLUSTER}.0) AS BIGINT)) "
                   f"FROM embeddings WHERE embedding IS NOT NULL)")


def _semdedup_k(n_vectors: int) -> int:
    return max(KMEANS_K, -(-n_vectors // SEMDEDUP_VECS_PER_CLUSTER))


_SEMDEDUP_TAIL = f""",
asg AS (SELECT vec_id, cluster FROM a{{last}} WHERE rn = 1),
v AS (
  SELECT g.vec_id, g.cluster, e.embedding,
         sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')}) AS nrm
  FROM asg g JOIN emb_nn e ON g.vec_id = e.vec_id),
dups AS (
  SELECT x.vec_id, MIN(y.vec_id) AS dup_of
  FROM v x JOIN v y
    ON x.cluster = y.cluster AND y.vec_id < x.vec_id
  WHERE {_DOT_SQL.format(a='x.embedding', b='y.embedding')}
        / (x.nrm * y.nrm) >= {SEMDEDUP_TAU}
  GROUP BY x.vec_id)
SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
       (d.vec_id IS NULL) AS is_kept, d.dup_of
FROM asg a LEFT JOIN dups d ON a.vec_id = d.vec_id
ORDER BY a.vec_id"""


@register("sim_semdedup_prune",
          oracle=_kmeans_oracle(k=_SEMDEDUP_K_SQL, tail=_SEMDEDUP_TAIL))
def sim_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings (the trained Lloyd centroids
    shared with sim_kmeans_lloyd) and dropping, WITHIN each cluster,
    any vector that has a lower-id cluster-mate with cosine ≥ τ —
    near-duplicate semantics decided inside small clusters so the
    pairwise work is bounded by cluster size, never corpus size. That
    is the paper's point at scale, and (VERDICT r7 item 5) k is
    therefore DERIVED from the corpus: k = ceil(n /
    SEMDEDUP_VECS_PER_CLUSTER) floored at KMEANS_K, so per-cluster
    membership stays ~constant and total cost is n×cluster_size, not
    n² — with fixed k the grouped kernel's single Arrow batch held n/k
    vectors and its O((n/k)²) Gram matrix OOMed at 100× scale. The n
    here is one metadata-cheap count; the oracle derives the same k
    in-SQL (_SEMDEDUP_K_SQL) so both engines cluster identically at
    every SF. Per-cluster prune is a grouped applyInPandas kernel (one
    bounded Arrow batch per cluster): a numpy Gram matrix accumulated
    dimension-by-dimension so every pairwise dot is the same
    left-to-right float64 fold as the oracle's list_sum —
    bit-identical cosines, same τ boundary. Output: every vector with
    its cluster, keep verdict, and the lowest-id duplicate that
    evicted it (NULL when kept).

    SPARK_GRAFT_EXACT_TWIN=0 → production training/assignment (VERDICT
    r9 item 3): Lloyd trains on a hash-ordered ≤SEMDEDUP_TRAIN_SAMPLE
    sample with the centroids kept in a DataFrame end-to-end, and the
    full corpus is assigned via the broadcast-join argmin — no
    driver-collected k×dim matrix anywhere, so corpus-derived k has no
    driver-memory cliff. The twin-on path keeps the closure-shipped
    exact loop (bounded-k by construction at the gate SFs) because its
    centroids are what the DuckDB oracle replays bit-for-bit."""
    import pandas as pd

    # NULL embeddings can't cluster or score (vector-kernel boundary);
    # k derives from the NON-NULL corpus count, matching _SEMDEDUP_K_SQL
    e = _lloyd_vectors(spark, sf_dir)
    k = _semdedup_k(e.count())
    if exact_twin_enabled():
        C = _lloyd_centroids(e, k)
        assigned = e.select(
            "vec_id", "embedding",
            _nearest_udf(C)(F.col("embedding"))["cluster"].alias("cluster"))
    else:
        cdf = _lloyd_centroids_production(e, k)
        assigned = _assign_broadcast_join(e, cdf)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        n, dim = X.shape
        # dimension-at-a-time accumulation = left-to-right fold per
        # pair, bit-identical to aggregate()/list_sum dot products
        G = np.zeros((n, n), dtype=np.float64)
        for d in range(dim):
            G += np.outer(X[:, d], X[:, d])
        nrm = np.sqrt(np.diag(G).copy())
        cos = G / np.outer(nrm, nrm)
        dup_of = np.full(n, -1, dtype=np.int64)
        ids = pdf["vec_id"].to_numpy()
        for i in range(1, n):
            js = np.nonzero(cos[i, :i] >= SEMDEDUP_TAU)[0]
            if len(js):
                dup_of[i] = ids[js[0]]   # lowest vec_id (sorted order)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": pdf["cluster"].astype("int32"),
            "is_kept": dup_of < 0,
            "dup_of": pd.array([None if d < 0 else d for d in dup_of],
                               dtype="Int64"),
        })

    return (
        assigned.groupBy("cluster")
        .applyInPandas(prune, "vec_id long, cluster int, is_kept boolean, "
                              "dup_of long")
        .orderBy("vec_id")
    )


MATRYOSHKA_DIM = 16


@register(
    "emb_matryoshka_truncate",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    t AS (SELECT vec_id, e[1:{MATRYOSHKA_DIM}] AS head,
                 sqrt(list_reduce(list_transform(e[1:{MATRYOSHKA_DIM}],
                                                 x -> x * x),
                                  (a, b) -> a + b)) AS head_norm,
                 sqrt(list_reduce(list_transform(e, x -> x * x),
                                  (a, b) -> a + b)) AS full_norm
          FROM v)
    SELECT vec_id, round(head_norm, 6) AS head_norm,
           round(head_norm / full_norm, 6) AS energy_ratio,
           round(head[1] / head_norm, 6) AS u0
    FROM t ORDER BY vec_id
    """,
)
def emb_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: keep the first MATRYOSHKA_DIM
    dims of each embedding, re-normalize, and report how much of the
    vector's energy the head retains — the cheap-retrieval/rerank-full
    trade every MRL deployment measures. Narrow per-row arithmetic
    (slice + left-fold sums replayed exactly by DuckDB list_reduce),
    zero shuffle; u0 spot-checks the renormalized head's first
    coordinate. NB list_reduce folds from the FIRST element (no init
    accumulator), so the Spark fold seeds with element 1 and folds
    2..n to keep the association order bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id",
                 F.transform("embedding",
                             lambda x: x.cast("double")).alias("e"))
    head = F.slice(F.col("e"), 1, MATRYOSHKA_DIM)

    def _sumsq(arr):
        # left fold seeded with arr[1]^2, folding arr[2..] — DuckDB
        # list_reduce's association order, replayed exactly
        first = F.element_at(arr, 1)
        rest = F.slice(arr, 2, F.size(arr) - 1)
        return F.aggregate(rest, first * first,
                           lambda acc, x: acc + x * x)

    head_norm = F.sqrt(_sumsq(head))
    full_norm = F.sqrt(_sumsq(F.col("e")))
    return (
        v.select(
            "vec_id",
            F.round(head_norm, 6).alias("head_norm"),
            F.round(head_norm / full_norm, 6).alias("energy_ratio"),
            F.round(F.element_at(head, 1) / head_norm, 6).alias("u0"))
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Batch ANN join: MANY query vectors against the corpus in one pass —
# the retrieval shape of a RAG / nearest-neighbor-annotation pipeline
# (the sim_* queries above serve ONE query vector; serving a batch by
# looping them would rescan the corpus per query).
# --------------------------------------------------------------------------

ANN_BATCH_QUERIES = 8   # vec_id < 8 are the query batch
ANN_BATCH_K = 3

_CAST_DOUBLE = "list_transform({v}, x -> CAST(x AS DOUBLE))"


@register(
    "sim_ann_batch_topk_join",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_CAST_DOUBLE.format(v='embedding')} AS e
      FROM embeddings
      WHERE vec_id < {ANN_BATCH_QUERIES} AND embedding IS NOT NULL
    ),
    c AS (
      SELECT vec_id, {_CAST_DOUBLE.format(v='embedding')} AS e
      FROM embeddings
      WHERE vec_id >= {ANN_BATCH_QUERIES} AND embedding IS NOT NULL
    ),
    s AS (
      SELECT q.query_id, c.vec_id,
             list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))) AS cos
      FROM q, c
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM s
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
           round(cos, 6) AS cos_sim
    FROM r WHERE rnk <= {ANN_BATCH_K}
    ORDER BY query_id, rnk
    """,
)
def sim_ann_batch_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact batch top-k cosine join: ANN_BATCH_QUERIES query vectors ×
    the corpus, top ANN_BATCH_K neighbors each, in ONE corpus pass.

    Scale shape: the query matrix is driver-collected (queries are the
    SMALL side by construction — an eval set, a user batch) and closes
    over an Arrow ``mapInPandas`` kernel that scores every corpus batch
    against ALL queries with one float64 matmul, then prunes to a
    per-partition per-query top-k (keeping boundary ties) — so the only
    shuffle carries O(partitions · queries · k) candidate rows, never
    corpus-scale data. The final per-query rank is a window over that
    tiny candidate relation. Both engines do float64 math; the output
    rounds AFTER ranking, so order is decided at full precision."""
    # NULL embeddings can't be scored (vector-kernel boundary contract)
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("embedding").isNotNull()))
    qrows = (e.filter(F.col("vec_id") < ANN_BATCH_QUERIES)
             .select("vec_id", "embedding").collect())
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qm = np.array([r.embedding for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    k = ANN_BATCH_K

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.sqrt((E * E).sum(axis=1))
            sims = (E @ qm.T) / (norms[:, None] * qnorm[None, :])
            for j in range(len(qids)):
                s = sims[:, j]
                if len(s) > k:
                    # keep every row tied with the kth score so the
                    # global (cos desc, vec_id) tiebreak stays exact
                    thresh = np.sort(s)[::-1][k - 1]
                    keep = np.flatnonzero(s >= thresh)
                else:
                    keep = np.arange(len(s))
                yield pd.DataFrame({
                    "query_id": qids[j],
                    "vec_id": pdf["vec_id"].iloc[keep].to_numpy(),
                    "cos": s[keep],
                })

    cand = (
        e.filter(F.col("vec_id") >= ANN_BATCH_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(kernel, "query_id long, vec_id long, cos double")
    )
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("rnk").cast("bigint").alias("rnk"),
                "vec_id", F.round("cos", 6).alias("cos_sim"))
        .orderBy("query_id", "rnk")
    )


# --- bucketed (LSH) batch ANN serving: the sub-linear RAG path -------------

ANN_BATCH_LSH_RECALL_FLOOR = 0.5  # measured 0.79-0.92 across sf0.001-0.01


def lsh_batch_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN top-k via LSH buckets: both the query batch and the
    corpus get multi-table sign-bit bucket keys (narrow Arrow matmul,
    no shuffle), candidates come from the bucket equi-join (query side
    broadcast — it is small by construction), and only candidates get
    the exact cosine re-rank. The shuffle carries candidate pairs, not
    corpus-scale data, and — unlike the exact kernel's one-pass matmul —
    the corpus side never scores vectors outside the probed buckets:
    sub-linear work per query when buckets are selective. Same output
    schema as sim_ann_batch_topk_join."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < ANN_BATCH_QUERIES)
    corpus = e.filter(F.col("vec_id") >= ANN_BATCH_QUERIES)
    qsig = (rhp_bucket_keys(queries)
            .withColumnRenamed("vec_id", "query_id"))
    csig = rhp_bucket_keys(corpus)
    cand = (
        csig.join(F.broadcast(qsig), ["cid", "cval"])
        .select("query_id", "vec_id").distinct()
    )
    q_emb = queries.select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qv"))
    cos = (dot(F.col("embedding"), F.col("qv"))
           / (l2_norm(F.col("embedding")) * l2_norm(F.col("qv"))))
    scored = (
        cand.join(corpus.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ANN_BATCH_K)
        .select("query_id", F.col("rnk").cast("bigint").alias("rnk"),
                "vec_id", F.round("cos", 6).alias("cos_sim"))
        .orderBy("query_id", "rnk")
    )


@register(
    "sim_ann_batch_lsh_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_CAST_DOUBLE.format(v='embedding')} AS e
      FROM embeddings
      WHERE vec_id < {ANN_BATCH_QUERIES} AND embedding IS NOT NULL
    ),
    c AS (
      SELECT vec_id, {_CAST_DOUBLE.format(v='embedding')} AS e
      FROM embeddings
      WHERE vec_id >= {ANN_BATCH_QUERIES} AND embedding IS NOT NULL
    ),
    s AS (
      SELECT q.query_id, c.vec_id,
             list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))) AS cos
      FROM q, c
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rnk
      FROM s
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
           round(cos, 6) AS cos_sim, TRUE AS ann_recall_ok
    FROM r WHERE rnk <= {ANN_BATCH_K}
    ORDER BY query_id, rnk
    """,
)
def sim_ann_batch_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed batch ANN serving under the value-hash gate (exact-twin
    pattern): rows are the exact batch top-k (oracle-reproducible — same
    relation as sim_ann_batch_topk_join), and ``ann_recall_ok`` is fed
    in-plan by the REAL LSH pipeline: |LSH top-k ∩ exact top-k| /
    (queries·k) ≥ {ANN_BATCH_LSH_RECALL_FLOOR} (measured 0.79-0.92). The
    LSH plan's only pair-scale shuffle is candidate-sized (plan-asserted
    in tests/test_similarity.py). SPARK_GRAFT_EXACT_TWIN=0 → the LSH
    plan's own top-k, no exact sibling in-plan."""
    if not exact_twin_enabled():
        return lsh_batch_ann_topk(spark, sf_dir)
    exact = sim_ann_batch_topk_join(spark, sf_dir)
    found = lsh_batch_ann_topk(spark, sf_dir).select("query_id", "vec_id")
    hits = (exact.join(found, ["query_id", "vec_id"], "left_semi")
            .agg(F.count("*").alias("h")))
    ok = (F.col("h") * F.lit(1.0) / (ANN_BATCH_QUERIES * ANN_BATCH_K)
          >= ANN_BATCH_LSH_RECALL_FLOOR)
    return (
        exact.crossJoin(F.broadcast(hits.select(ok.alias("ann_recall_ok"))))
        .orderBy("query_id", "rnk")
    )
