"""Additional TPC-H-shaped query coverage (SURVEY §2.12 closure, round-1
extension): the subquery/decorrelation menu the first relational batch
(operators/relational.py) didn't exercise — scalar correlated subqueries
(Q2/Q15/Q17 shapes), IN-subquery with HAVING (Q18), global scalar
subqueries (Q11/Q22), disjunctive join predicates (Q19), NOT IN (Q16),
and the two-nation disjunctive pair join (Q7).

The driver's testdata lacks partsupp / l_shipmode / l_commitdate /
c_phone, so each classic shape is transposed onto the columns that exist
(lineitem serves as the part↔supplier link); what's preserved is the
PLAN shape — where the subquery sits and what Catalyst must do with it.

Scale notes:
- every scalar subquery here decorrelates to an aggregate + join (never
  a per-row recomputation); the per-group variants reuse the same
  shuffle key as the main join (partkey/orderkey), so AQE can reuse the
  exchange;
- global scalar subqueries (max/avg/total) produce a 1-row relation that
  Spark broadcasts — the right plan at any scale;
- all money aggregates go through exact decimal inner sums
  (functions.numeric) so argmax/threshold comparisons are bit-stable
  across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import (dec_avg_expr, dec_sum_expr, fixed_avg,
                                 fixed_sum)
from ..plans.catalog import register
from ..sources.tables import load_table

_DEC = "decimal(25,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, {dec_avg_expr('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dec_sum_expr('l.l_extendedprice')} AS small_lot_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate joined back on the SAME key
    the fact join uses — lineitem shuffles on l_partkey once and both the
    per-part avg and the brand filter consume that partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        fixed_avg("l_quantity", 0).alias("avg_qty"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(fixed_sum("l_extendedprice", 2).alias("small_lot_revenue"),
             F.count("*").alias("n_rows"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           {dec_sum_expr('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING — the qualifying-orderkey
    set is tiny after the threshold, so it joins back as a (broadcast)
    semi join; the big aggregation reuses the orderkey shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("sq"))
           .filter(F.col("sq") > 250)
           .select("l_orderkey"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fixed_sum("l_quantity", 0).alias("sum_qty"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {dec_sum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + global scalar MAX subquery. The
    1-row max relation is broadcast and compared against the view —
    values come from exact decimal sums, so the argmax is bit-stable and
    both engines agree even on exact ties (all tied rows returned)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
             .cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q11_important_nation_value",
    oracle=f"""
    WITH v AS (
      SELECT s.s_nationkey, {dec_sum_expr('l.l_extendedprice')} AS value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey
    )
    SELECT n.n_name, v.value
    FROM v JOIN nation n ON v.s_nationkey = n.n_nationkey
    WHERE v.value > (SELECT SUM(value) * 0.045 FROM v)
    ORDER BY v.value DESC, n.n_name
    """,
)
def q11_important_nation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group values filtered against a FRACTION of the
    global total (scalar subquery over the same view). Supplier is a
    broadcast dim; the global total is a broadcast 1-row relation."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(fixed_sum("l_extendedprice", 2).alias("value"))
    )
    total = v.agg((F.sum("value") * 0.045).alias("threshold"))
    return (
        v.join(F.broadcast(total), v.value > total.threshold)
        .join(F.broadcast(n), v.s_nationkey == n.n_nationkey)
        .select("n_name", "value")
        .orderBy(F.col("value").desc(), "n_name")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — two nation dims joined to
    opposite ends of the fact chain with a DISJUNCTIVE pair predicate.
    The nation filter can't push below the join as a single conjunct;
    Catalyst still prunes each broadcast side to the two named nations
    (derived IN filters from the OR)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
             .cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT round(100.0 * CAST(
             SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
                 ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)))
                  AS DOUBLE), 6) AS promo_share_pct,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share)
    — two decimal sums in one pass over the broadcast-joined scan, the
    division done once at the end (never per-row)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo).cast("double")
                     / F.sum(rev).cast("double"), 6).alias("promo_share_pct"),
             F.count("*").alias("n_rows"))
    )


@register(
    "q19_disjunctive_pred_join",
    oracle=f"""
    SELECT {dec_sum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunct groups mixing columns
    from BOTH join sides. The equi-key (partkey) still drives a hash
    join; the OR stays as a post-join residual — the plan to verify is
    BroadcastHashJoin + residual filter, never a nested-loop."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_rows"))
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p.p_size IN (1, 5, 9, 13, 17)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts with NOT IN + IN value
    lists (lineitem stands in for partsupp). Both predicates prune the
    broadcast dim before the join; count-distinct expands once on the
    (brand, size) grouping."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & F.col("p_size").isin(1, 5, 9, 13, 17))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q22_idle_balances",
    oracle=f"""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {dec_sum_expr('c.c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT {dec_avg_expr('c_acctbal')}
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey ORDER BY c.c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar AVG subquery + NOT EXISTS anti
    join — rich-but-inactive accounts per nation. The scalar threshold
    broadcasts; the anti join shuffles on custkey. 'Idle' is no order
    SINCE 1999 (not never-ordered: this generator gives virtually every
    customer an order, which left the original never-ordered predicate
    returning 0 rows at the gate SFs — the r9 dead-predicate class the
    non-empty gate now catches)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
    thr = (c.filter(F.col("c_acctbal") > 0)
           .agg(fixed_avg("c_acctbal", 2).alias("thr")))
    return (
        c.join(F.broadcast(thr), c.c_acctbal > F.col("thr"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             fixed_sum("c_acctbal", 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY 1)
    SELECT c.l_partkey AS p_partkey, p.p_brand,
           CAST(MIN(c.l_suppkey) AS BIGINT) AS best_suppkey,
           round(b.min_cost, 6) AS min_unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_size <= 5
    GROUP BY c.l_partkey, p.p_brand, b.min_cost
    ORDER BY p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier achieving the per-part MINIMUM cost —
    correlated scalar-min subquery decorrelated into a two-level agg
    joined back on (partkey, cost). Ties resolved deterministically by
    MIN(suppkey). unit_cost is an IEEE division identical in both
    engines, so the min-equality join matches exactly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    best = cost.groupBy(F.col("l_partkey").alias("bpk")).agg(
        F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(best, (cost.l_partkey == best.bpk)
                  & (cost.unit_cost == best.min_cost))
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_brand", "min_cost")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select("p_partkey", "p_brand", "best_suppkey",
                F.round("min_cost", 6).alias("min_unit_cost"))
        .orderBy("p_partkey")
    )


@register(
    "sql_lateral_top2_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey <= 300
    ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
    """,
)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 orders per customer) through
    the SQL surface — the per-row subquery shape Catalyst plans as a
    single window/join, never one query per outer row. Equivalent to the
    row_number window form (window_top3_parts_per_brand); registered via
    LATERAL to cover the SQL construct itself."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey, o_totalprice DESC, t.o_orderkey
    """)


@register(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    ORDER BY from_region, to_region
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (the one legitimate nested-loop use: both
    sides tiny and the full product is wanted — region pair matrix).
    Anything larger belongs in an equi/bucketed rewrite (see
    temporal.join_range_band_bucketed)."""
    r = _t(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_name").alias("to_region"))
    return (
        a.crossJoin(b)
        .filter(F.col("from_region") != F.col("to_region"))
        .orderBy("from_region", "to_region")
    )
