"""Sampling & binning operators (training-data-pipeline extensions).

A 100 TB corpus is never consumed whole: pipelines carve reproducible
subsets (dev/val/test splits, QA samples, ablation slices) and profile
distributions. Four sampling regimes, each the right tool somewhere:

- **deterministic hash split** — split membership is a pure function of
  a stable key (md5), so it survives re-runs, repartitioning, engine
  swaps, and incremental arrivals: the split a training pipeline should
  use. Engine-portable (md5 is md5 everywhere), hence fully
  oracle-checked.
- **seeded Bernoulli sample** (`df.sample`) — cheap scan-time row
  sampling; reproducible within Spark for a fixed seed+partitioning but
  NOT across engines (rows-only check; determinism pinned in
  tests/test_sampling.py).
- **stratified sample** (`df.sampleBy`) — per-stratum fractions, the
  class-rebalancing primitive (rows-only; proportions tested).
- **histogram binning** — fixed-width bucket profile of a numeric
  column: the O(1)-per-row distribution sketch that replaces sorting at
  scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import fixed_sum
from ..plans.catalog import register
from ..sources.tables import load_table

# Hex-prefix thresholds on md5: uniform over [0x00, 0xff] per 2-hex-char
# prefix, compared LEXICALLY — identical semantics in any engine, no
# hex→int conversion needed. '19' keeps 0x00-0x19 = 26/256 ≈ 10.2%.
_VAL_MAX = "19"


def hash_split_col(key, val_prefix_max: str = _VAL_MAX):
    """'val' for ~10% of keys, 'train' for the rest — stable under
    re-runs, shuffles, and data growth (membership depends only on the
    key). The idiom: md5(key) hex-prefix compared against a threshold."""
    return F.when(
        F.substring(F.md5(key.cast("string").cast("binary")), 1, 2) <= val_prefix_max,
        F.lit("val"),
    ).otherwise(F.lit("train"))


@register(
    "sample_hash_10pct",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
    ORDER BY doc_id
    """,
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash: a pure per-row predicate —
    no shuffle, no state, pushes into the scan stage, and yields the
    SAME sample on any engine or cluster layout."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")),
                             1, 2) <= _VAL_MAX)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "sample_train_val_split",
    oracle="""
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
                THEN 'val' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def sample_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split accounting: label every doc by hash split, count
    docs and characters per side — the manifest row a data pipeline
    publishes with each snapshot."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", hash_split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("n_chars"))
        .orderBy("split")
    )


def bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli row sample (scan-time coin flip, no shuffle).
    Reproducible for a fixed seed within Spark — but the RNG stream is
    engine-internal, so the sampled ROW SET has no cross-engine oracle.
    Determinism + fraction tolerance pinned in tests/test_sampling.py."""
    o = load_table(spark, sf_dir, "orders")
    return (o.sample(fraction=0.1, seed=42)
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey"))


@register(
    "sample_bernoulli_seeded",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS size_ok, TRUE AS mean_ok
    FROM orders
    """,
)
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample under the value-hash gate (exact-twin
    pattern: the RNG stream is engine-internal, so the oracle checks
    exact population facts plus in-plan statistical-soundness booleans
    the REAL sample feeds): ``size_ok`` = sample size within 5 binomial
    σ of n·p; ``mean_ok`` = sample mean of o_totalprice within 5
    standard errors of the population mean (unbiasedness). A broken
    sampler — wrong fraction, value-correlated selection — flips a
    boolean and fails the hash."""
    o = load_table(spark, sf_dir, "orders")
    pop = o.agg(F.count("*").alias("n"),
                F.avg("o_totalprice").alias("mu"),
                F.stddev_pop("o_totalprice").alias("sd"))
    smp = (bernoulli_sample(spark, sf_dir)
           .agg(F.count("*").alias("ns"), F.avg("o_totalprice").alias("ms")))
    p = F.lit(0.1)
    size_tol = F.lit(5.0) * F.sqrt(F.col("n") * p * (1 - p))
    # greatest(ns, 1): an EMPTY seeded sample (possible on a tiny
    # population) must report mean_ok=false honestly, not raise ANSI
    # DIVIDE_BY_ZERO in sqrt's argument; the NULL sample mean is
    # coalesced into an explicit false for the same reason
    mean_tol = (F.lit(5.0) * F.col("sd")
                / F.sqrt(F.greatest(F.col("ns"), F.lit(1))))
    mean_ok = ((F.col("ns") > 0)
               & (F.abs(F.col("ms") - F.col("mu")) <= mean_tol))
    return pop.crossJoin(F.broadcast(smp)).select(
        F.col("n").cast("bigint").alias("n_total"),
        (F.abs(F.col("ns") - F.col("n") * p) <= size_tol).alias("size_ok"),
        F.coalesce(mean_ok, F.lit(False)).alias("mean_ok"),
    )


STRAT_FRACTIONS = {"N": 0.05, "R": 0.5, "A": 0.5}


def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampleBy counts (the class-rebalance primitive):
    scan-time filter against per-key thresholds — no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.sampleBy("l_returnflag", STRAT_FRACTIONS, seed=42)
    return (
        sampled.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("l_returnflag")
    )


@register(
    "sample_stratified_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS frac_ok
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def sample_stratified_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampleBy under the value-hash gate (exact-twin
    pattern): per stratum, the exact population count plus an in-plan
    ``frac_ok`` boolean — the seeded sample's size within 5 binomial σ
    of n·p for THAT stratum's fraction (5% of 'N', 50% of 'R'/'A').
    Wrong per-stratum thresholds flip the boolean and fail the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_returnflag").agg(F.count("*").alias("n_total"))
    frac = F.create_map(*[F.lit(x)
                          for kv in STRAT_FRACTIONS.items() for x in kv])
    p = F.element_at(frac, F.col("l_returnflag"))
    tol = F.lit(5.0) * F.sqrt(F.col("n_total") * p * (1 - p))
    return (
        totals.join(stratified_sample_counts(spark, sf_dir),
                    "l_returnflag", "left")
        .select(
            "l_returnflag",
            F.col("n_total").cast("bigint").alias("n_total"),
            (F.abs(F.coalesce("n_sampled", F.lit(0)) - F.col("n_total") * p)
             <= tol).alias("frac_ok"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram_totalprice",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 11) AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 6)
             AS sum_price
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: O(1) bucket assignment per
    row + one tiny-key aggregation — the distribution profile that
    replaces any sort-based approach at scale. Top bucket clamped so the
    bin count is fixed regardless of outliers."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(11)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_orders"),
             F.round(fixed_sum("o_totalprice", 2), 6).alias("sum_price"))
        .orderBy("bucket")
    )


WEIGHTED_SAMPLE_K = 100


@register(
    "sample_weighted_topk",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           round(ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                     ::UBIGINT + 1) / 4294967297.0)
                 / o_totalprice, 10) AS priority_key
    FROM orders
    ORDER BY priority_key DESC, o_orderkey
    LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement as a deterministic top-k:
    the Efraimidis–Spirakis A-ES scheme. Each row gets a priority
    u^(1/w) with u uniform from the row key — here in log space,
    ln(u)/w, the same ordering with better float behavior — and the
    sample is the k largest priorities. Because u derives from md5 of
    the key (not an RNG), the sample is reproducible across engines,
    re-runs, and repartitioning, and the whole operator is a narrow
    per-row expression + TakeOrderedAndProject: no shuffle of the data,
    no driver state, any corpus size. The u construction — first 8 md5
    hex chars → uint32 → (h+1)/(2^32+1) ∈ (0,1] — is replayed verbatim
    by the DuckDB oracle (hex→UBIGINT cast), so even the double
    arithmetic agrees bit-for-bit at round(·, 10)."""
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 8),
        16, 10,
    ).cast("double")
    priority = F.round(
        F.log((h + 1) / 4294967297.0) / F.col("o_totalprice"), 10)
    return (
        o.select("o_orderkey", "o_totalprice", priority.alias("priority_key"))
        .orderBy(F.col("priority_key").desc(), "o_orderkey")
        .limit(WEIGHTED_SAMPLE_K)
    )


STRATA_N = 50
PRETHIN_SAFETY = 64  # production pre-thin: expected survivors = SAFETY × N


@register(
    "sample_stratified_exact",
    oracle=f"""
    SELECT l_returnflag, l_orderkey, l_linenumber FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                            CAST(l_linenumber AS VARCHAR)),
                        l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= {STRATA_N}
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-N-per-stratum sampling, deterministic: rank each stratum's
    rows by the md5 of their key and keep the first N — reproducible on
    any engine (contrast `sample_stratified_returnflag`, whose sampleBy
    fractions are Spark-RNG-bound and rows-only). One shuffle keyed on
    the stratum.

    With few strata the rank window funnels each stratum through one
    task, so the PRODUCTION plan (SPARK_GRAFT_EXACT_TWIN=0) pre-thins
    before ranking: one count aggregate per stratum, then keep only
    rows whose hash prefix falls under a per-stratum band sized to
    PRETHIN_SAFETY×N expected survivors (binomial mean 6400 for N=50 —
    the chance of thinning below N is astronomically small, and the
    band keeps the SMALLEST hashes, which is exactly the set the rank
    would pick). The window then sorts ~SAFETY×N rows per stratum
    instead of the stratum — same md5 order, same result, bounded task
    input at any corpus size. Gate mode keeps the unthinned plan so the
    oracle compares the full ranking."""
    from ..config import exact_twin_enabled

    li = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            "-", F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string")).cast("binary"))
    base = li.select("l_returnflag", "l_orderkey", "l_linenumber",
                     h.alias("_h"))
    if not exact_twin_enabled():
        counts = base.groupBy("l_returnflag").agg(
            F.count("*").alias("_n"))
        # band on the first 8 hex chars as uint32: keep the smallest
        # fraction SAFETY*N/n of hashes (the rank keeps smallest md5,
        # so the band is a superset of the final sample almost surely)
        band = F.least(
            F.lit(float(1 << 32)),
            F.lit(float(PRETHIN_SAFETY * STRATA_N)) / F.col("_n")
            * float(1 << 32))
        base = (base.join(F.broadcast(counts), "l_returnflag")
                .filter(F.conv(F.substring("_h", 1, 8), 16, 10)
                        .cast("double") < band)
                .drop("_n"))
    w = (Window.partitionBy("l_returnflag")
         .orderBy("_h", "l_orderkey", "l_linenumber"))
    return (
        base.select("l_returnflag", "l_orderkey", "l_linenumber",
                    F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATA_N)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    )
