"""Data-curation operators (training-data-pipeline extensions, round 2):
CDC merge/upsert accounting, SCD2 interval history, per-key EWMA
smoothing, winsorization, and equi-depth feature binning.

These are the snapshot-maintenance and feature-conditioning steps a
100 TB corpus pipeline runs between ingest and training:

- MERGE = full-outer equi-join of snapshot vs delta on the business key
  — ONE shuffle (or none with co-bucketed tables, tests/test_sinks.py);
  the insert/update/carry classification is a projection on top.
- SCD2 history = lead() over (key, change-time) — one shuffle on the
  key, each validity interval closed by its successor row.
- EWMA = an order-dependent recurrence, expressed as a per-key
  sort_array + F.aggregate left fold (bounded series per key — the
  per-key state is exactly what applyInPandasWithState would hold in
  streaming; here the fold is a JVM expression, no Python). The DuckDB
  oracle replays the identical fold via list_reduce, which also seeds
  with the first element.
- Winsorization = two-pass: exact per-group percentile bounds (the
  sf-scale oracle-checkable form; approx_percentile is the drop-in at
  100 TB), broadcast back, clip with least/greatest.
- Equi-depth bins = ONE global percentile aggregate for the 9 decile
  boundaries (1-row relation, broadcast) + an O(#boundaries) per-row
  assignment — NOT an ntile over a global ORDER BY window, which would
  be a single-partition sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import exact_twin_enabled
from ..functions.numeric import dec_sum, dec_sum_expr, fixed_sum


def _pctl(col, fracs):
    """Exact interpolating percentile under the value-hash gate (DuckDB
    quantile_cont agrees bit-for-bit); SPARK_GRAFT_EXACT_TWIN=0 swaps in
    the KLL-style approx_percentile sketch — the mergeable, bounded-
    memory form a 100 TB run uses, same plan shape (one aggregate,
    broadcast back), no total-sort anywhere."""
    if exact_twin_enabled():
        return F.percentile(col, fracs)
    return F.percentile_approx(col, fracs, 10_000)
from ..plans.catalog import register
from ..sources.tables import load_table

MERGE_CUTOFF = "1998-01-01 00:00:00"
EWMA_ALPHA = 0.3


# --- CDC merge / upsert ----------------------------------------------------

@register(
    "merge_upsert_accounting",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey AS k, o_totalprice AS price,
             o_orderdate >= TIMESTAMP '{MERGE_CUTOFF}' AS is_delta,
             row_number() OVER (
               PARTITION BY o_custkey, o_orderdate >= TIMESTAMP '{MERGE_CUTOFF}'
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ),
    base AS (SELECT k, price FROM ranked WHERE rn = 1 AND NOT is_delta),
    delta AS (SELECT k, price FROM ranked WHERE rn = 1 AND is_delta)
    SELECT CASE WHEN b.k IS NULL THEN 'insert'
                WHEN d.k IS NULL THEN 'carry'
                ELSE 'update' END AS action,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           {dec_sum_expr('COALESCE(d.price, b.price)')} AS merged_price_sum
    FROM base b FULL OUTER JOIN delta d ON b.k = d.k
    GROUP BY 1 ORDER BY 1
    """,
)
def merge_upsert_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet relations: snapshot (orders
    before the cutoff, latest order per customer) merged with a delta
    (orders after). Keys only in the delta are inserts, in both are
    updates (delta wins), only in the snapshot carry over — the
    row-level upsert any CDC-fed table maintenance runs, here as one
    full-outer equi-join with the classification projected on top.
    max_by picks the latest order with a deterministic (date, key)
    tiebreak; the oracle spells the same pick as a row_number CTE
    (DuckDB's arg_max lacks composite ordering keys)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")

    def latest(side: DataFrame) -> DataFrame:
        return (
            side.groupBy(F.col("o_custkey").alias("k"))
            .agg(F.max_by(
                "o_totalprice", F.struct("o_orderdate", "o_orderkey"))
                .alias("price"))
        )

    base = latest(o.filter(F.col("o_orderdate") < cutoff))
    delta = latest(o.filter(F.col("o_orderdate") >= cutoff))
    b, d = base.alias("b"), delta.alias("d")
    action = (
        F.when(F.col("b.k").isNull(), "insert")
        .when(F.col("d.k").isNull(), "carry")
        .otherwise("update")
    )
    return (
        b.join(d, F.col("b.k") == F.col("d.k"), "full_outer")
        .select(action.alias("action"),
                F.coalesce("d.price", "b.price").alias("price"))
        .groupBy("action")
        .agg(F.count("*").alias("n_keys"),
             fixed_sum("price", 2).alias("merged_price_sum"))
        .orderBy("action")
    )


# --- SCD2 interval history -------------------------------------------------

@register(
    "scd2_order_history",
    oracle="""
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
           o_orderstatus,
           round(o_totalprice, 2) AS totalprice,
           CASE WHEN lead(o_orderdate) OVER w IS NULL THEN TRUE ELSE FALSE END
             AS is_current
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, valid_from, totalprice
    """,
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each per-key change event
    becomes a validity interval [valid_from, valid_to), closed by its
    successor via lead(); the open interval is the current row. One
    shuffle on the key — the dimension-history maintenance shape that
    replaces point-in-time snapshots at scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return (
        o.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("o_custkey", "valid_from", "totalprice")
    )


# --- per-key EWMA ----------------------------------------------------------

@register(
    "ts_ewma_user_daily",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {dec_sum_expr('value')} / COUNT(*) AS mean_value
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT user_id,
             list(mean_value ORDER BY day) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    )
    SELECT user_id, n_days,
           round(list_reduce(xs,
                 (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc), 6)
             AS ewma_value
    FROM series ORDER BY user_id
    """,
)
def ts_ewma_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily mean
    event value — the smoothing recurrence y_t = αx_t + (1-α)y_{t-1},
    seeded with the first observation. Order-dependent, so it's spelled
    as an explicit left fold: sort_array of (day, x) structs →
    F.aggregate over the tail seeded with the head — bit-identical to
    DuckDB's list_reduce (same seed rule, same fold order). Day means
    use exact decimal sums so both engines fold identical doubles.
    Per-key series are bounded (days per user), so the collected array
    is small; the unbounded-stream form of this state lives in
    streaming/stateful.py."""
    ev = load_table(spark, sf_dir, "events")
    # day mean = double(decimal sum) / count — the DIVISION happens in
    # double on BOTH sides (review r9: an inline decimal division here
    # produced a DECIMAL(38,19) quotient whose double cast can differ
    # from the oracle's IEEE division in the last ulps for >~16
    # significant-digit day sums, and the EWMA fold amplifies ulps)
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg((F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
              / F.count("*")).alias("mean_value"))
    )
    series = (
        daily.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "mean_value"))),
                lambda s: s.mean_value,
            ).alias("xs"),
            F.count("*").alias("n_days"),
        )
    )
    a = EWMA_ALPHA
    ewma = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.element_at("xs", 1),
        lambda acc, x: F.lit(a) * x + F.lit(1 - a) * acc,
    )
    return (
        series.select("user_id", "n_days", F.round(ewma, 6).alias("ewma_value"))
        .orderBy("user_id")
    )


# --- winsorization ---------------------------------------------------------

@register(
    "clean_winsorize_prices",
    oracle=f"""
    WITH bounds AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < b.lo
                         OR l.l_extendedprice > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped,
           round({dec_sum_expr('l.l_extendedprice')} / COUNT(*), 6) AS mean_raw,
           round({dec_sum_expr('least(greatest(l.l_extendedprice, b.lo), b.hi)')}
                 / COUNT(*), 6) AS mean_winsorized
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def clean_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to the [P05, P95] band) per group
    — the feature-conditioning step that tames heavy tails before
    training. Two passes: a per-group percentile aggregate (exact here so
    the oracle can value-check it; approx_percentile is the same-shape
    sketch at 100 TB) broadcast back onto the fact, then least/greatest
    clipping — no sort, no extra shuffle beyond the group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = _pctl("l_extendedprice", F.array(F.lit(0.05), F.lit(0.95)))
    bounds = (
        li.groupBy("l_returnflag")
        .agg(qs.alias("b"))
        .select("l_returnflag", F.col("b")[0].alias("lo"), F.col("b")[1].alias("hi"))
    )
    x = F.col("l_extendedprice")
    clipped = F.least(F.greatest(x, F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(((x < F.col("lo")) | (x > F.col("hi"))).cast("bigint"))
            .alias("n_clipped"),
            F.round(fixed_sum(x, 2) / F.count("*"), 6).alias("mean_raw"),
            F.round(dec_sum(clipped) / F.count("*"), 6).alias("mean_winsorized"),
        )
        .orderBy("l_returnflag")
    )


# --- equi-depth binning ----------------------------------------------------

N_DEPTH_BINS = 10


@register(
    "feature_equidepth_bins",
    oracle=f"""
    WITH b AS (
      SELECT quantile_cont(o_totalprice,
               [{", ".join(str(i / N_DEPTH_BINS) for i in range(1, N_DEPTH_BINS))}])
             AS bs
      FROM orders
    )
    SELECT CAST(1 + len(list_filter(b.bs, v -> o.o_totalprice > v)) AS INTEGER)
             AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(MIN(o.o_totalprice), 6) AS lo_price,
           round(MAX(o.o_totalprice), 6) AS hi_price
    FROM orders o CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
)
def feature_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) discretization of order value into
    N_DEPTH_BINS (10) bins — the feature-bucketing step that beats
    equi-width histograms on skewed money-like columns. Boundaries come
    from ONE global percentile aggregate (a 1-row relation, broadcast
    back — the allowlisted 1-row-side nested-loop class, same as the
    q11/q22 scalar thresholds), and the per-row bin assignment is an
    O(bins) array filter — deliberately NOT ntile over a global ORDER BY,
    which would serialize the whole relation through one partition."""
    o = load_table(spark, sf_dir, "orders")
    fracs = F.array(*[F.lit(i / N_DEPTH_BINS) for i in range(1, N_DEPTH_BINS)])
    bounds = o.agg(_pctl("o_totalprice", fracs).alias("bs"))
    x = F.col("o_totalprice")
    bin_id = (1 + F.size(F.filter("bs", lambda v: x > v))).cast("int")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bin_id.alias("bin_id"))
        .agg(F.count("*").alias("n_rows"),
             F.round(F.min(x), 6).alias("lo_price"),
             F.round(F.max(x), 6).alias("hi_price"))
        .orderBy("bin_id")
    )


DIFF_CUTOFF = "1997-06-01"


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                 FROM orders WHERE o_orderdate < '{DIFF_CUTOFF}'),
    new AS (SELECT o_orderkey, o_orderstatus,
                   o_totalprice * CASE WHEN o_orderkey % 13 = 0
                                       THEN 1.1 ELSE 1.0 END AS o_totalprice
            FROM orders WHERE o_orderkey % 17 <> 0),
    j AS (SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
                 old.o_orderkey IS NULL AS only_new,
                 new.o_orderkey IS NULL AS only_old,
                 COALESCE(old.o_totalprice <> new.o_totalprice
                          OR old.o_orderstatus <> new.o_orderstatus,
                          FALSE) AS changed
          FROM old FULL OUTER JOIN new USING (o_orderkey))
    SELECT CASE WHEN only_new THEN 'added'
                WHEN only_old THEN 'removed'
                WHEN changed THEN 'changed'
                ELSE 'unchanged' END AS diff_kind,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: row-level diff of two table versions
    (added / removed / changed / unchanged) — the audit that validates
    any migration or CDC replay. Derived here from one table (old =
    pre-cutoff rows; new = all rows with a deterministic price bump on
    1-in-13 keys) so the oracle can restate it; in production the two
    sides are real snapshots — same single key-equi full-outer join,
    comparing payload columns directly (a row-hash compare collapses
    the payload to one column at 100 TB wide; equality on two columns
    here keeps the oracle exact). The summary agg keeps output scalar;
    the row-level diff is the pre-agg relation."""
    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderdate") < DIFF_CUTOFF)
           .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    new = o.filter(F.col("o_orderkey") % 17 != 0).select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice")
         * F.when(F.col("o_orderkey") % 13 == 0, 1.1).otherwise(1.0))
        .alias("o_totalprice"))
    oo, nn = old.alias("o"), new.alias("n")
    j = oo.join(nn, F.col("o.o_orderkey") == F.col("n.o_orderkey"),
                "full_outer")
    only_new = F.col("o.o_orderkey").isNull()
    only_old = F.col("n.o_orderkey").isNull()
    changed = F.coalesce(
        (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
        | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
        F.lit(False))
    kind = (F.when(only_new, "added")
            .when(only_old, "removed")
            .when(changed, "changed")
            .otherwise("unchanged"))
    key = F.coalesce("o.o_orderkey", "n.o_orderkey")
    return (
        j.select(kind.alias("diff_kind"), key.alias("k"))
        .groupBy("diff_kind")
        .agg(F.count("*").cast("bigint").alias("n_rows"),
             F.min("k").cast("bigint").alias("min_key"),
             F.max("k").cast("bigint").alias("max_key"))
        .orderBy("diff_kind")
    )


QN_GRID = 20  # quantile-normalization grid resolution


@register(
    "feature_quantile_normalize",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderpriority AS grp, o_totalprice,
             percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS pr
      FROM orders
    ),
    bounds AS (
      SELECT quantile_cont(o_totalprice, [0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0]) AS qs
      FROM orders
    )
    SELECT o_orderkey, grp, o_totalprice,
           round(qs[CAST(floor(pr * 20) AS BIGINT) + 1], 6)
             AS normalized
    FROM ranked CROSS JOIN bounds
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across groups: each row's value is
    replaced by the GLOBAL quantile at its WITHIN-GROUP percent rank —
    aligning every group's distribution to the corpus distribution (the
    batch-effect correction / feature-alignment step; e.g. calibrating
    per-source quality scores before a global threshold). Plan: one
    shuffle for the within-group rank window; the global quantile grid
    is ONE percentile aggregate (a (GRID+1)-element relation) broadcast
    back, and grid lookup is an O(1) element_at on the snapped rank —
    never a global sort of the data, never a per-row subquery.
    Spark's percentile (exact, interpolating) and DuckDB's
    quantile_cont agree on the grid values."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderkey", F.col("o_orderpriority").alias("grp"),
        "o_totalprice", F.percent_rank().over(w).alias("pr"))
    fracs = F.array(*[F.lit(i / QN_GRID) for i in range(QN_GRID + 1)])
    grid = o.agg(_pctl("o_totalprice", fracs).alias("qs"))
    snapped = F.floor(F.col("pr") * QN_GRID).cast("int")
    return (
        ranked.filter(F.col("o_orderkey") <= 500)
        .crossJoin(F.broadcast(grid))
        .select("o_orderkey", "grp", "o_totalprice",
                F.round(F.element_at(F.col("qs"), snapped + 1), 6)
                .alias("normalized"))
        .orderBy("o_orderkey")
    )
