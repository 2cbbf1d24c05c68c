"""Relational operator menu (SURVEY §2.12 completion + §2.5 A4 flagship).

The reference has exactly one analytic (average price by year filtered to
one region — README.md:103-106) and zero joins/windows/set-ops. This
module supplies the full standard menu on the driver's TPC-H-ish tables,
each query both as a DataFrame plan and a DuckDB oracle.

Scale notes baked into the plans (the part that matters at 100 TB):
- nation/region are fixed-cardinality dims → always `F.broadcast`;
- customer/orders/lineitem joins shuffle on their keys — expressed as
  plain equi-joins so Catalyst/AQE pick sort-merge vs shuffled-hash and
  split skewed partitions at runtime;
- scan-heavy queries (q6) are written filter-first so predicates and
  column pruning reach the parquet reader;
- double aggregates use exact decimal inner sums (functions.numeric) —
  result bits independent of partition count, required for oracle hashes
  and for run-to-run stability on an elastic cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import exact_twin_enabled
from ..functions.numeric import (dec_avg_expr, dec_sum, dec_sum_expr,
                                 fixed_avg, fixed_sum)
from ..plans.catalog import register
from ..sources.tables import load_table

_DEC = "decimal(25,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: the reference's documented analytic (SURVEY §2.5 A4) transposed
# to the testdata star schema — "average order price by year in one region"
# (reference: average land price by year in 宜蘭縣, README.md:103-106).
# --------------------------------------------------------------------------

@register(
    "flagship_avg_price_by_year",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           {dec_avg_expr('o.o_totalprice')} AS avg_total_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1 ORDER BY 1
    """,
)
def flagship_avg_price_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # dims are fixed-size → broadcast; orders⨝customer shuffles on custkey.
    dim = (customer
           .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
           .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
           .filter(F.col("r_name") == "ASIA")
           .select("c_custkey"))
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(fixed_avg("o_totalprice", 2).alias("avg_total_price"),
             F.count("*").alias("n_orders"))
        .orderBy("order_year")
    )


# --------------------------------------------------------------------------
# Aggregation menu
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_expr('l_quantity')} AS sum_qty,
           {dec_sum_expr('l_extendedprice')} AS sum_base_price,
           {dec_sum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dec_sum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {dec_avg_expr('l_quantity')} AS avg_qty,
           {dec_avg_expr('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan — partial agg map-side,
    2-way shuffle on a 6-value grouping key; scan-bound at scale."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        # direct timestamp comparison (no cast) → parquet min/max pushdown
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fixed_sum("l_quantity", 0).alias("sum_qty"),
            fixed_sum("l_extendedprice", 2).alias("sum_base_price"),
            fixed_sum(disc_price, 4).alias("sum_disc_price"),
            fixed_sum(charge, 6).alias("sum_charge"),
            fixed_avg("l_quantity", 0).alias("avg_qty"),
            fixed_avg("l_discount", 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {dec_sum_expr('l_extendedprice * l_discount')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered scan-aggregate. All four predicates
    push to the parquet reader (min/max row-group skipping at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "agg_distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct → Spark expands + partial-aggregates; exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"),
             F.count("*").alias("n_rows"))
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — THE scale path for distinct
    counts at 100 TB (fixed-size sketch, no expansion shuffle).

    Oracle strategy (sketch values are engine-internal, so the approx
    number itself can't hash-match DuckDB): the plan computes BOTH the
    HLL++ estimate and the exact count, emits the exact count plus an
    in-plan ``within_tolerance`` boolean (|approx-exact|/exact <= 10%,
    5x the sketch's 2% rsd), and the oracle reproduces the exact side
    and asserts TRUE. The sketch path stays exercised — a broken
    approx_count_distinct flips the boolean and fails the hash.
    SPARK_GRAFT_EXACT_TWIN=0 → sketch-only production plan (no exact
    count-distinct expansion in-plan)."""
    li = _t(spark, sf_dir, "lineitem")
    if not exact_twin_enabled():
        return (
            li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", 0.02)
                 .alias("approx_parts"))
            .orderBy("l_returnflag")
        )
    # exact twin WITHOUT the Expand: mixing countDistinct with the HLL
    # in ONE aggregate forces Spark's Expand-based multi-distinct plan
    # (every row duplicated per agg path — measured 1.41 s vs 0.50 s at
    # sf0.1). Reduce to distinct (flag, partkey) pairs first, then count
    # the pairs (= exact distinct) and feed the SAME pairs to the HLL —
    # HLL is duplicate-insensitive, so its estimate over distinct values
    # is bit-identical to the one-pass estimate, and within_tolerance
    # is unchanged. Production mode keeps the one-pass sketch-only plan.
    red = li.select("l_returnflag", "l_partkey").distinct()
    return (
        red.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
             F.count("l_partkey").alias("exact_parts"))
        .select(
            "l_returnflag",
            "exact_parts",
            (F.abs(F.col("approx_parts") - F.col("exact_parts"))
             / F.col("exact_parts") <= F.lit(0.10)).alias("within_tolerance"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dec_sum_expr('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), fixed_sum("l_quantity", 0).alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "agg_cube_priority_status",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dec_sum_expr('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), fixed_sum("o_totalprice", 2).alias("sum_price"))
        .orderBy(F.col("o_orderpriority").asc_nulls_first(),
                 F.col("o_orderstatus").asc_nulls_first())
    )


@register(
    "agg_stats_moments",
    oracle=f"""
    SELECT l_linestatus,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           ROUND(CAST({dec_sum_expr('l_extendedprice * l_extendedprice')}
             - 2 * {dec_avg_expr('l_extendedprice')} * {dec_sum_expr('l_extendedprice')}
             + COUNT(l_extendedprice) * {dec_avg_expr('l_extendedprice')} * {dec_avg_expr('l_extendedprice')}
             AS DOUBLE) / (COUNT(l_extendedprice) - 1), 4) AS var_price
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance via exact decimal moment sums — deterministic across
    engines and partitionings (built-in var_samp is order-sensitive)."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    sum_x = F.sum(x.cast(_DEC)).cast("double")
    sum_x2 = F.sum((x * x).cast(_DEC)).cast("double")
    n = F.count(x)
    mean = sum_x / n
    var = (sum_x2 - 2 * mean * sum_x + n * mean * mean) / (n - 1)
    return (
        li.groupBy("l_linestatus")
        .agg(F.min(x).cast("double").alias("min_price"),
             F.max(x).cast("double").alias("max_price"),
             F.round(var, 4).alias("var_price"))
        .orderBy("l_linestatus")
    )


@register(
    "pivot_orders_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def pivot_orders_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — never omit it at scale: without
    it Spark runs an extra distinct-collect job over the pivot column."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        # absent (year, status) combos pivot to NULL; oracle's FILTER gives 0
        .na.fill(0, ["F", "O", "P"])
        .orderBy("order_year")
    )


# --------------------------------------------------------------------------
# Join menu (SURVEY §2.10: reference has none; we exercise every flavor)
# --------------------------------------------------------------------------

@register(
    "join_broadcast_brand_revenue",
    oracle=f"""
    SELECT p.p_brand,
           {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def join_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the filtered dim — no shuffle of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy("p_brand")
    )


@register(
    "join_shuffle_order_lineitem",
    oracle=f"""
    SELECT o.o_orderpriority,
           {dec_sum_expr('l.l_extendedprice')} AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus <> 'P'
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_shuffle_order_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi-join: both sides shuffle on orderkey; AQE picks
    sort-merge (or skew-splits) — the canonical big join at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(fixed_sum("l_extendedprice", 2).alias("sum_price"),
             F.count("*").alias("n_items"))
        .orderBy("o_orderpriority")
    )


@register(
    "join_left_customer_order_counts",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dec_sum_expr('coalesce(o.o_totalprice, 0)')} AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.count("*").alias("n_rows"),
             dec_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)))
             .alias("total_spend"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_semi_big_ticket_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_semi_big_ticket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: EXISTS without duplication — half the shuffle of a full
    join + dropDuplicates."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "join_anti_customers_no_orders",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI flavor: customers with no BIG order. The predicate is
    load-bearing (review r9): in this generator EVERY customer has some
    order, so a bare no-orders anti-join returned zero rows at the
    gate SF and verified nothing — the >400k filter keeps the output
    non-empty and the anti semantics value-checked at every SF."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "q5_supplier_volume_by_nation",
    oracle=f"""
    SELECT n.n_name,
           {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
    """,
)
def q5_supplier_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join. Fact-side joins shuffle; nation/region
    broadcast; Catalyst reorders the dim filters below the big joins."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
             .cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Windows, sorts, top-k
# --------------------------------------------------------------------------

@register(
    "window_top3_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3 ORDER BY p_brand, rn
    """,
)
def window_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the window shuffles once on the partition key; at
    scale prefer this over groupBy+collect_list+slice (no row explosion).
    Order-by includes p_partkey → deterministic under ties."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate; decimal inner sum → identical bits in both
    engines regardless of their internal frame evaluation strategy."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        o.withColumn("running_spend",
                     F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey),
                CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return (
        o.withColumn("gap_days",
                     F.datediff(d, F.lag(d).over(w)).cast("int"))
        .select("o_custkey", "o_orderkey", "gap_days")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full sort at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        # date-valued output as string: arrow date32 vs datetime64 round
        # -trips differently between engines (SURVEY §7.4 parity trap)
        o.select("o_orderkey", "o_totalprice",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "setop_lapsed_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_custkey
    """,
)
def setop_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    # subtract == SQL EXCEPT (distinct) — exceptAll would keep duplicates
    return y95.subtract(y96).orderBy("o_custkey")


@register(
    "setop_retained_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_custkey
    """,
)
def setop_retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96).orderBy("o_custkey")


@register(
    "setop_union_all_sources",
    oracle="""
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT o_custkey AS k FROM orders
    ) GROUP BY k HAVING COUNT(*) > 1 ORDER BY k
    """,
)
def setop_union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return (
        c.unionByName(o).groupBy("k").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1).orderBy("k")
    )


# --------------------------------------------------------------------------
# JSON / date-time scalar surface (events table)
# --------------------------------------------------------------------------

@register(
    "events_json_k_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_k
    FROM (SELECT event_type,
                 CASE WHEN json_valid(props) THEN props END AS props
          FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (SURVEY §2.12): get_json_object stays JVM-side."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(k).alias("n_k"))
        .orderBy("event_type")
    )


@register(
    "events_hourly_activity",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dec_sum_expr('value')} AS sum_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def events_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour batch rollup (the batch twin of the streaming window
    query in streaming/windows.py). Timestamp output as string — arrow
    tz-awareness differs between engines (SURVEY §7.4)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").cast("string").alias("hour_ts"))
        .agg(F.count("*").alias("n_events"), fixed_sum("value", 2).alias("sum_value"))
        .orderBy("hour_ts")
    )


@register(
    "orders_monthly_sales",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dec_sum_expr('o_totalprice')} AS sum_price
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def orders_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(F.count("*").alias("n_orders"), fixed_sum("o_totalprice", 2).alias("sum_price"))
        .orderBy("order_month")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           o_orderstatus,
           CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_year,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dec_sum_expr('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus),
                            (year(o_orderdate), o_orderstatus), ())
    ORDER BY g_year, g_status, order_year NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) through the engine's
    SQL surface (SURVEY §2.11: spark.sql over registered views IS the
    DSL; Catalyst expands the sets into a single Expand+Aggregate plan —
    one shuffle, not four). GROUPING() markers disambiguate grouped-out
    NULLs, identical in both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               o_orderstatus,
               CAST(GROUPING(year(o_orderdate)) AS INT) AS g_year,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus),
                                (year(o_orderdate), o_orderstatus), ())
        ORDER BY g_year, g_status, order_year NULLS FIRST, o_orderstatus NULLS FIRST
    """)


@register(
    "agg_quantiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
           round(quantile_cont(l_extendedprice, 0.75)
                 - quantile_cont(l_extendedprice, 0.25), 6) AS iqr
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). The approximate
    sibling for 100 TB is approx_percentile (same API shape, sketch-based,
    no full sort) — checked rows-only in agg_quantiles_approx."""
    li = _t(spark, sf_dir, "lineitem")
    # one array-percentile agg = one value buffer + one per-group sort;
    # four scalar percentile() calls would each keep their own copy of
    # every value and sort it (measured 4.0 s → ~1.3 s at sf0.1)
    qs = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        li.groupBy("l_returnflag")
        .agg(qs.alias("qs"))
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 6).alias("q25"),
            F.round(F.col("qs")[1], 6).alias("median_price"),
            F.round(F.col("qs")[2], 6).alias("q75"),
            F.round(F.col("qs")[2] - F.col("qs")[0], 6).alias("iqr"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_quantiles_approx",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS exact_q25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS exact_median,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS exact_q75,
           TRUE AS within_tolerance
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): the quantile that scales —
    partial sketches merge map-side, no global sort.

    Oracle strategy: sketch outputs are accuracy-bounded, not exact, so
    the plan computes BOTH the sketch quantiles and the exact
    interpolated ones, emits the exact triple plus an in-plan
    ``within_tolerance`` boolean (relative error <= 5% on each of
    q25/median/q75 — the accuracy-1000 sketch's worst observed relative
    error is 0.7% at sf0.001 and 0.3% at sf0.1, 7-17x inside the bound;
    accuracy 10000 bought nothing the tolerance could see and cost
    ~0.4 s per run in sketch-buffer merges), and the oracle reproduces
    the exact side (quantile_cont) and asserts TRUE.
    SPARK_GRAFT_EXACT_TWIN=0 → sketch-only production plan (no exact
    percentile sort in-plan).

    Accuracy/tolerance trade, on the record (ADVICE r14): the 7-17x
    margin is DATA-DEPENDENT — Spark documents approx_percentile's
    guarantee as a RANK error of 1/accuracy, so a distribution whose
    value spread is steep around a requested rank (heavy skew, atoms
    near a quartile) converts the same rank error into a larger VALUE
    error and shrinks the margin. The 5% bound itself still holds with
    big room at the tested SFs (pinned at sf0.001/0.01/0.1 by the
    parity suite); deployments with pathological skew should raise the
    accuracy literal — the cost is sketch-merge time, not plan shape.
    In production mode the emitted values are sketch outputs and moved
    when accuracy changed 10000→1000 (r14, within the documented 5%
    contract)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    if not exact_twin_enabled():
        return (
            li.groupBy("l_returnflag")
            .agg(F.approx_percentile("l_extendedprice", ps, F.lit(1000))
                 .alias("aq"))
            .select("l_returnflag",
                    F.round(F.col("aq")[0], 6).alias("approx_q25"),
                    F.round(F.col("aq")[1], 6).alias("approx_median"),
                    F.round(F.col("aq")[2], 6).alias("approx_q75"))
            .orderBy("l_returnflag")
        )
    grouped = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", ps, F.lit(1000)).alias("aq"),
        F.percentile("l_extendedprice", ps).alias("eq"),
    )

    def _ok(i: int):
        return (F.abs(F.col("aq")[i] - F.col("eq")[i])
                / F.abs(F.col("eq")[i]) <= F.lit(0.05))

    return (
        grouped.select(
            "l_returnflag",
            F.round(F.col("eq")[0], 6).alias("exact_q25"),
            F.round(F.col("eq")[1], 6).alias("exact_median"),
            F.round(F.col("eq")[2], 6).alias("exact_q75"),
            (_ok(0) & _ok(1) & _ok(2)).alias("within_tolerance"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join chain → agg →
    top-k. Filters sit scan-side (pushdown), the customer side reduces
    before the join, and the final ORDER BY+LIMIT is a top-k heap, not a
    global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — fact-to-fact
    shuffle join plus a broadcast dim, date-window + flag predicates all
    pushed to the scans, top-k tail."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    # 1996H1, not the canonical 1994 window: the generator's orderdates
    # span 1995-2001, so the 1994 window matched ZERO rows and the whole
    # join/agg/top-k shape was never value-checked (review r9)
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(revenue).alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "sql_correlated_exists",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 10000)
    ORDER BY c.c_custkey
    """,
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst
    decorrelates both into left-semi + left-anti joins (asserted in
    tests/test_plans.py) — the subquery shape §4's optimizer table marks
    'built-in when §7 adds joins'."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 10000)
        ORDER BY c.c_custkey
    """)


@register(
    "join_interval_self_events",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts, event_type FROM events),
    pairs AS (
      SELECT a.user_id, a.event_id AS click_id, b.event_id AS error_id,
             CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
      FROM e a JOIN e b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'error'
       AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
    )
    SELECT user_id, click_id, error_id, gap_s
    FROM pairs ORDER BY user_id, click_id, error_id
    """,
)
def join_interval_self_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with TWO large sides — errors within 5 minutes after
    each click, per user. The inequality never reaches the join: both
    sides are bucketed into 5-minute time bins, each left row probes its
    own and the next bin (an event within [t, t+5m) lands in one of the
    two), and the exact interval predicate runs post-join as a cheap
    filter. Plan = equi-join on (user_id, bin) — shuffle-partitionable,
    no BroadcastNestedLoopJoin, survives any scale."""
    ev = load_table(spark, sf_dir, "events")
    binlen = 300  # seconds = the interval length
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("cts"),
                      (F.unix_timestamp("ts") / binlen).cast("long").alias("bin")))
    errors = (ev.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      F.col("user_id").alias("e_user_id"),
                      F.col("ts").alias("ets"),
                      (F.unix_timestamp("ts") / binlen).cast("long").alias("e_bin")))
    probe = clicks.withColumn(
        "probe_bin", F.explode(F.array(F.col("bin"), F.col("bin") + 1)))
    return (
        probe.join(errors, (probe.user_id == errors.e_user_id)
                   & (probe.probe_bin == errors.e_bin))
        .filter((F.col("ets") >= F.col("cts"))
                & (F.col("ets") < F.col("cts") + F.expr("INTERVAL 5 MINUTES")))
        .select("user_id", "click_id", "error_id",
                (F.unix_timestamp("ets") - F.unix_timestamp("cts"))
                .cast("long").alias("gap_s"))
        .orderBy("user_id", "click_id", "error_id")
    )


@register(
    "window_range_frame_weekly_spend",
    oracle=f"""
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {dec_sum_expr('o_totalprice')} AS day_spend,
           round(CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(25,6))))
                 OVER (PARTITION BY o_custkey
                       ORDER BY CAST(o_orderdate AS DATE)
                       RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 6) AS rolling_7d_spend
    FROM orders WHERE o_custkey <= 200
    GROUP BY o_custkey, o_orderdate
    ORDER BY o_custkey, orderdate
    """,
)
def window_range_frame_weekly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): 7-day rolling spend per
    customer — rangeBetween over a day ordinal, the frame spec ROWS
    BETWEEN can't express when days are missing. Aggregated to one row
    per (customer, day) first so the window input is deterministic.
    Both sides frame on CALENDAR DAYS explicitly — the Spark ordinal is
    datediff (date-truncated) and the oracle orders by CAST(... AS
    DATE); framing the raw TIMESTAMP would silently change the
    semantics to a sliding 6x24h window the moment an intraday order
    timestamp appears (review r9)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    daily = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("day_spend_dec"))
    )
    day_ord = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (Window.partitionBy("o_custkey").orderBy(day_ord)
         .rangeBetween(-6, Window.currentRow))
    return (
        daily.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("day_spend_dec").cast("double").alias("day_spend"),
            F.round(F.sum("day_spend_dec").over(w).cast("double"), 6)
            .alias("rolling_7d_spend"),
        )
        .orderBy("o_custkey", "orderdate")
    )


@register(
    "window_analytic_ranks",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 6) AS balance,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           CAST(ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INTEGER) AS decile,
           round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS cum_dist
    FROM customer WHERE c_custkey <= 2000
    ORDER BY c_custkey
    """,
)
def window_analytic_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth: percent_rank / ntile / cume_dist per
    segment (the customer-scoring shape). Total order inside each
    partition (balance, custkey) so every rank is deterministic."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            F.round("c_acctbal", 6).alias("balance"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.ntile(10).over(w).cast("int").alias("decile"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
        .orderBy("c_custkey")
    )


@register(
    "events_props_map_entries",
    oracle="""
    SELECT k AS prop_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS sum_v
    FROM (
      SELECT unnest(json_keys(props)) AS k,
             json_extract_string(props, '$.' || unnest(json_keys(props))) AS v
      FROM (SELECT CASE WHEN json_valid(props) THEN props END AS props
            FROM events)
    )
    GROUP BY k ORDER BY k
    """,
)
def events_props_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → map<string,string> → explode (SURVEY §2.12 map-function
    surface): per-key frequency and sum over the props blob — from_json
    with a map schema handles open-schema JSON where a struct can't."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("v").try_cast("long")).alias("sum_v"))
        .orderBy("prop_key")
    )


@register(
    "unpivot_lineitem_measures",
    oracle=f"""
    WITH m AS (
      SELECT 'l_discount' AS measure, CAST(l_discount AS DOUBLE) AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE) FROM lineitem
      UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
    )
    SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
           {dec_sum_expr('value')} AS total
    FROM m GROUP BY measure ORDER BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (inverse of pivot_orders_status_by_year): wide measure
    columns → long (measure, value) — the reshape feeding any
    per-measure profiling job. DataFrame.unpivot is a zero-shuffle
    Expand, the same node GROUPING SETS lowers to."""
    li = _t(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=[], values=["l_discount", "l_extendedprice", "l_quantity", "l_tax"],
        variableColumnName="measure", valueColumnName="value",
    )
    return (
        melted.groupBy("measure")
        .agg(F.count("*").alias("n"), fixed_sum("value", 2).alias("total"))
        .orderBy("measure")
    )


@register(
    "dedup_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS latest_event_id,
           CAST(ts AS VARCHAR) AS latest_ts, event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def dedup_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key (log compaction / CDC upsert shape): total
    order inside each key via (ts, event_id) so the survivor is
    deterministic — the correct form of what a bare
    dropDuplicates(['user_id']) does nondeterministically."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("latest_event_id"),
                F.col("ts").cast("string").alias("latest_ts"), "event_type")
        .orderBy("user_id")
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS last_price,
           CAST(nth_value(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value frame semantics: last_value needs the
    explicit unbounded-following frame (the default frame ends at
    CURRENT ROW — the classic silent-wrong-answer both engines share,
    spelled out here identically). Deterministic via (date, key) order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.first("o_totalprice").over(w).cast("double").alias("first_price"),
            F.last("o_totalprice").over(w_full).cast("double").alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).cast("double")
            .alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "arrays_function_breadth",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(list_max(embedding) AS DOUBLE) AS max_x,
           CAST(list_min(embedding) AS DOUBLE) AS min_x,
           (CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
            + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
            + CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE)
            + CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE))
             AS head8_sum,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first,
           CAST(list_contains(list_transform(embedding, x -> x > 0), true)
                AS BOOLEAN) AS has_positive
    FROM embeddings WHERE vec_id < 400 ORDER BY vec_id
    """,
)
def arrays_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function surface (SURVEY §2.12 nested-data slice):
    size / array_max / array_min / slice+fold / sort_array / exists —
    all JVM-side expressions over array<float>, no explode and no
    shuffle. float32 → double widening is exact, so no rounding is
    needed anywhere."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    # double fold is strictly left-to-right — the oracle spells the same
    # left-associative chain, so both engines produce identical IEEE bits
    # (float→decimal casts quantize differently per engine; doubles don't)
    head8_sum = F.aggregate(
        F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.array_max("embedding").cast("double").alias("max_x"),
            F.array_min("embedding").cast("double").alias("min_x"),
            head8_sum.alias("head8_sum"),
            F.sort_array("embedding")[0].cast("double").alias("sorted_first"),
            F.exists("embedding", lambda x: x > 0).alias("has_positive"),
        )
        .orderBy("vec_id")
    )


@register(
    "agg_freq_items",
    oracle="""
    WITH p AS (
      SELECT COALESCE(string_agg(v, ',' ORDER BY v), '') AS s FROM (
        SELECT o_orderpriority AS v FROM orders GROUP BY o_orderpriority
        HAVING COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) > 0.2)),
    s AS (
      SELECT COALESCE(string_agg(v, ',' ORDER BY v), '') AS s FROM (
        SELECT o_orderstatus AS v FROM orders GROUP BY o_orderstatus
        HAVING COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) > 0.2))
    SELECT p.s AS exact_frequent_priorities,
           s.s AS exact_frequent_statuses,
           TRUE AS contains_all_exact
    FROM p, s
    """,
)
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (Karp-Papadimitriou-Shenker counters via
    DataFrame.stat.freqItems): one pass, fixed memory — the 100 TB
    replacement for exact GROUP BY + ORDER BY count when only "which
    values are frequent" matters.

    Oracle strategy: freqItems may over-report but never under-reports
    values whose true frequency exceeds the support, so the plan also
    computes the exact heavy-hitter sets (tiny post-agg relations) and
    emits them plus ``contains_all_exact`` = every exact heavy hitter
    appears in the sketch output. DuckDB reproduces the exact sets and
    asserts TRUE. The two 1-row crossJoins are the reviewed
    broadcast-scalar class (tests/test_plans.py allowlist).
    SPARK_GRAFT_EXACT_TWIN=0 → sketch-only production plan (the single
    one-pass freqItems scan; no exact heavy-hitter group-bys)."""
    o = _t(spark, sf_dir, "orders")
    freq = o.stat.freqItems(["o_orderpriority", "o_orderstatus"], support=0.2)
    if not exact_twin_enabled():
        return freq.select(
            F.concat_ws(",", F.array_sort("o_orderpriority_freqItems"))
            .alias("approx_frequent_priorities"),
            F.concat_ws(",", F.array_sort("o_orderstatus_freqItems"))
            .alias("approx_frequent_statuses"),
        )

    def exact_hh(col: str, alias: str) -> DataFrame:
        counts = o.groupBy(col).agg(F.count("*").alias("c"))
        w = Window.partitionBy()  # global window over a ≤5-row post-agg
        return (
            counts.withColumn("n", F.sum("c").over(w))
            .filter(F.col("c") * F.lit(1.0) / F.col("n") > F.lit(0.2))
            .agg(F.array_sort(F.collect_list(col)).alias(alias))
        )

    def contains_all(exact_col: str, approx_col: str):
        return F.forall(F.col(exact_col),
                        lambda x: F.array_contains(F.col(approx_col), x))

    return (
        freq.crossJoin(exact_hh("o_orderpriority", "exact_p"))
        .crossJoin(exact_hh("o_orderstatus", "exact_s"))
        .select(
            F.concat_ws(",", "exact_p").alias("exact_frequent_priorities"),
            F.concat_ws(",", "exact_s").alias("exact_frequent_statuses"),
            (contains_all("exact_p", "o_orderpriority_freqItems")
             & contains_all("exact_s", "o_orderstatus_freqItems"))
            .alias("contains_all_exact"),
        )
    )


@register(
    "events_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(COUNT(CAST(json_extract_string(props, '$.missing') AS BIGINT))
                AS BIGINT) AS n_missing
    FROM (SELECT event_type,
                 CASE WHEN json_valid(props) THEN props END AS props
          FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    binary variant, then typed try_variant_get extraction — the
    parse-once/extract-many shape that replaces repeated string JSON
    parsing when many fields are read (variant decode is columnar and
    shreddable; get_json_object re-parses the string per call). Missing
    paths yield NULL (counted to pin that semantics)."""
    e = _t(spark, sf_dir, "events")
    # try_parse_json: malformed/NULL props → NULL variant (every
    # extraction NULLs out), matching the oracle's json_valid guard —
    # plain parse_json would raise mid-scan on the first bad blob
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return (
        e.groupBy("event_type")
        .agg(F.min(k).alias("min_k"), F.max(k).alias("max_k"),
             F.count(missing).alias("n_missing"))
        .orderBy("event_type")
    )


@register(
    "maps_function_breadth",
    oracle="""
    SELECT user_id, event_type AS k,
           CAST(n * 2 AS BIGINT) AS v_scaled
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    )
    WHERE n >= 3
    ORDER BY user_id, k
    """,
)
def maps_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (SURVEY §2.12 nested-data slice): per-user
    event-type counts assembled into a map<string,bigint>
    (map_from_entries), thresholded with map_filter, rescaled with
    transform_values, then exploded back to rows. The oracle computes the
    same relationally — equality proves each map op's semantics, not just
    that it runs. Map ops are JVM-side; the only shuffle is the
    (user_id, event_type) count."""
    e = _t(spark, sf_dir, "events")
    # maps cannot carry a NULL key (Spark raises NULL_MAP_KEY at
    # map_from_entries): NULL event_type rows are excluded from the
    # map assembly on both sides
    counts = (e.filter(F.col("event_type").isNotNull())
              .groupBy("user_id", "event_type")
              .agg(F.count("*").alias("n")))
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n")))
        .alias("m"))
    m = F.transform_values(
        F.map_filter(F.col("m"), lambda k, v: v >= 3),
        lambda k, v: v * 2)
    return (
        per_user.select("user_id", F.explode(m).alias("k", "v_scaled"))
        .orderBy("user_id", "k")
    )


@register(
    "agg_regression_price_on_qty",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(corr(l_extendedprice, l_quantity), 6) AS r,
           round(covar_pop(l_extendedprice, l_quantity), 4) AS cov_pop,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression/correlation aggregate family (regr_slope/intercept,
    corr, covar_pop): distributed OLS from sufficient statistics — one
    partial-aggregated pass, no data movement beyond the group shuffle.
    The scale story for ANY closed-form fit: ship moments, not rows.
    Rounded to absorb the engines' summation-order difference in the
    second-moment accumulations."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.regr_slope(y, x), 6).alias("slope"),
             F.round(F.regr_intercept(y, x), 6).alias("intercept"),
             F.round(F.corr(y, x), 6).alias("r"),
             F.round(F.covar_pop(y, x), 4).alias("cov_pop"),
             F.regr_count(y, x).alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "dq_constraint_report",
    oracle="""
    SELECT 'orders_custkey_not_null' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_status_in_domain',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_referential',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ORDER BY rule
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report: per-rule violation counts — the
    publish-with-every-snapshot audit table. Column rules fold into ONE
    conditional-aggregate scan (no per-rule pass); the referential rule
    is a single anti join. At 100 TB: one scan + one shuffle, total."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    col_rules = o.agg(
        F.count_if(F.col("o_custkey").isNull())
        .alias("orders_custkey_not_null"),
        F.count_if(F.col("o_totalprice") <= 0)
        .alias("orders_totalprice_positive"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P"))
        .alias("orders_status_in_domain"),
    )
    report = col_rules.unpivot(
        ids=[], values=None, variableColumnName="rule",
        valueColumnName="n_violations")
    referential = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.lit("orders_custkey_referential").alias("rule"),
             F.count("*").alias("n_violations"))
    )
    return report.unionByName(referential).orderBy("rule")


@register(
    "join_full_outer_daily_traffic",
    oracle="""
    WITH clicks AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY 1
    ),
    errors AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_errors FROM events
      WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(coalesce(c.d, e.d), '%Y-%m-%d') AS day,
           CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(e.n_errors, 0) AS BIGINT) AS n_errors
    FROM clicks c FULL OUTER JOIN errors e ON c.d = e.d
    ORDER BY day
    """,
)
def join_full_outer_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the last uncovered join flavor): daily click and
    error series aligned with neither side dropping days the other
    lacks — the series-alignment shape. Both inputs pre-aggregate to
    day-cardinality before the join."""
    e = _t(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .groupBy(F.col("ts").cast("date").alias("d"))
              .agg(F.count("*").alias("n_clicks")))
    errors = (e.filter(F.col("event_type") == "error")
              .groupBy(F.col("ts").cast("date").alias("e_d"))
              .agg(F.count("*").alias("n_errors")))
    return (
        clicks.join(errors, clicks.d == errors.e_d, "full_outer")
        .select(
            F.date_format(F.coalesce("d", "e_d"), "yyyy-MM-dd").alias("day"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"))
        .orderBy("day")
    )


@register(
    "agg_misc_battery",
    oracle="""
    SELECT o_orderstatus,
           CAST(bool_and(o_totalprice > 0) AS BOOLEAN) AS all_positive,
           CAST(bool_or(o_totalprice > 400000) AS BOOLEAN) AS any_jumbo,
           CAST(bit_and(CAST(o_custkey AS BIGINT)) AS BIGINT) AS key_bit_and,
           CAST(bit_or(CAST(o_custkey AS BIGINT)) AS BIGINT) AS key_bit_or,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           CAST(MIN(o_orderkey) AS BIGINT) AS stable_any_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_misc_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining aggregate families: bool_and/bool_or, bit_and/bit_or,
    collect_set (sorted + CSV-serialized for a deterministic scalar), and the any_value
    shape spelled as MIN for cross-engine determinism (any_value itself
    is legitimately nondeterministic — the battery documents the
    deterministic substitute)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
             F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
             F.bit_and("o_custkey").alias("key_bit_and"),
             F.bit_or("o_custkey").alias("key_bit_or"),
             F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority")))
             .alias("priorities"),
             F.min("o_orderkey").alias("stable_any_key"))
        .orderBy("o_orderstatus")
    )


@register(
    "agg_hll_sketch_union",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem
    ORDER BY l_returnflag
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reusable distinct-count sketches (Apache DataSketches HLL): build
    one sketch per group, then UNION the sketches for the rollup —
    the store-sketches/merge-later pattern that gives mergeable distinct
    counts across partitions, days, or tables without re-scanning rows.

    Oracle strategy: sketch bytes/estimates are engine-internal, so each
    row carries the exact distinct count plus ``within_tolerance`` =
    |estimate − exact| / exact ≤ 10% computed in-plan (the ALL row's
    exact side can't be derived from per-group exacts — partkeys overlap
    across flags — so it is its own countDistinct). DuckDB reproduces
    the exact sides and asserts TRUE; a broken sketch union flips the
    boolean. The 1-row crossJoin is the reviewed broadcast-scalar
    class. SPARK_GRAFT_EXACT_TWIN=0 → sketch-only production plan (build
    sketches once, estimate per group, merge for the rollup; no exact
    count-distinct anywhere)."""
    li = _t(spark, sf_dir, "lineitem")
    if not exact_twin_enabled():
        per_flag = (
            li.groupBy("l_returnflag")
            .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
            .withColumn("approx_parts",
                        F.hll_sketch_estimate("sk").cast("long"))
        )
        total = per_flag.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long")
            .alias("approx_parts")).select(
            F.lit("ALL").alias("l_returnflag"), "approx_parts")
        return (per_flag.select("l_returnflag", "approx_parts")
                .unionByName(total).orderBy("l_returnflag"))
    tol = F.lit(0.10)
    # exact twin WITHOUT the Expand (same rewrite as agg_approx_distinct):
    # reduce to distinct (flag, partkey) pairs once, then sketch + count
    # the pairs — the HLL registers are max-of-hashes, so a sketch built
    # from each distinct value exactly once is bit-identical to one built
    # over duplicates; the ALL row's exact side becomes a countDistinct
    # over the already-reduced pairs instead of a SECOND full lineitem
    # scan. Production mode keeps the sketch-only one-pass plan above.
    red = li.select("l_returnflag", "l_partkey").distinct()
    per_flag = (
        red.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"),
             F.count("l_partkey").alias("exact_parts"))
        .withColumn("approx_parts", F.hll_sketch_estimate("sk"))
    )
    total = (
        per_flag.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_parts"))
        .crossJoin(red.agg(F.countDistinct("l_partkey").alias("exact_parts")))
        .select(F.lit("ALL").alias("l_returnflag"), "exact_parts",
                "approx_parts")
    )
    ok = (F.abs(F.col("approx_parts") - F.col("exact_parts"))
          / F.col("exact_parts") <= tol).alias("within_tolerance")
    return (
        per_flag.select("l_returnflag", "exact_parts", ok)
        .unionByName(total.select("l_returnflag", "exact_parts", ok))
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode_listagg_bitmap",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_linestatus ASC) AS rn
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT g.l_returnflag,
           m.l_linestatus AS mode_status,
           g.statuses,
           g.n_suppliers
    FROM (
      SELECT l_returnflag,
             string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
               AS statuses,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
      FROM lineitem GROUP BY l_returnflag
    ) g JOIN m ON m.l_returnflag = g.l_returnflag AND m.rn = 1
    ORDER BY g.l_returnflag
    """,
)
def agg_mode_listagg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newer aggregate family: ``mode`` (deterministic=True → lowest
    value on ties, which the oracle replays as ORDER BY count DESC,
    value ASC), ordered ``listagg DISTINCT`` (WITHIN GROUP), and an
    EXACT distinct count via roaring-style bitmap aggregation —
    ``bitmap_construct_agg`` ORs fixed-size bitmaps map-side, so the
    shuffle carries one bitmap per (group, 32k-key bucket) instead of
    one row per distinct key (the exact-count analog of HLL). Keys are
    bucketed with ``bitmap_bucket_number`` and the per-bucket counts
    summed: ``bitmap_bit_position`` alone wraps modulo 32768, which
    silently UNDERCOUNTS once keys exceed 32767 (review r9 — the
    bucket group-by is what makes the pattern key-range-safe at any
    SF; the +1 shift keeps 1-based positions from dropping key 0)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql("""
        WITH per_bucket AS (
          SELECT l_returnflag,
                 bitmap_bucket_number(l_suppkey + 1) AS bkt,
                 bitmap_count(bitmap_construct_agg(
                     bitmap_bit_position(l_suppkey + 1))) AS cnt
          FROM lineitem GROUP BY l_returnflag, bkt
        ),
        exact AS (
          SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n_suppliers
          FROM per_bucket GROUP BY l_returnflag
        )
        SELECT g.l_returnflag, g.mode_status, g.statuses, e.n_suppliers
        FROM (
          SELECT l_returnflag,
                 mode(l_linestatus, true) AS mode_status,
                 listagg(DISTINCT l_linestatus, ',')
                   WITHIN GROUP (ORDER BY l_linestatus) AS statuses
          FROM lineitem GROUP BY l_returnflag
        ) g JOIN exact e ON g.l_returnflag = e.l_returnflag
        ORDER BY g.l_returnflag
    """)
