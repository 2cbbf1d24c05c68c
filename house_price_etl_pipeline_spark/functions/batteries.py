"""Scalar-function batteries: null-handling, string, and date/time
surface (SURVEY §2.4 closure — the reference uses a handful of scalar
functions; an engine a user can switch to needs the standard menu).

Each battery is one catalog query applying the whole function family to
real columns, oracle-checked — so every listed function is value-verified
against an independent engine, not just "does it parse". All JVM-side
expressions inside whole-stage codegen; zero shuffles except the final
presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table


@register(
    "scalar_null_battery",
    oracle="""
    SELECT c_custkey,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_masked,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS bal_is_null_safe,
           CASE WHEN NULLIF(c_acctbal, 0.0) IS NULL THEN 'zero_or_null'
                ELSE 'nonzero' END AS bal_class,
           ifnull(NULLIF(c_name, c_name), 'self_nulled') AS nvl_demo,
           CASE WHEN c_acctbal IS NOT NULL THEN 'has_bal' ELSE 'no_bal' END
             AS nvl2_demo
    FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey
    """,
)
def scalar_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: coalesce / nullif / null-safe equality (<=>)
    / nvl / nvl2 — the semantics ETL repairs hinge on (the reference's
    X7 conditional repair is a special case)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return (
        c.select(
            "c_custkey",
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")),
                       F.lit("suppressed")).alias("seg_masked"),
            F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double"))
            .alias("bal_is_null_safe"),
            F.when(F.nullif("c_acctbal", F.lit(0.0)).isNull(), "zero_or_null")
            .otherwise("nonzero").alias("bal_class"),
            F.nvl(F.nullif("c_name", F.col("c_name")), F.lit("self_nulled"))
            .alias("nvl_demo"),
            F.nvl2("c_acctbal", F.lit("has_bal"), F.lit("no_bal"))
            .alias("nvl2_demo"),
        )
        .orderBy("c_custkey")
    )


@register(
    "scalar_string_battery",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           CAST(length(c_name) AS INTEGER) AS name_len,
           reverse(c_mktsegment) AS seg_rev,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           substring(c_name, 1, 8) AS name_head,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS seg_lev,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           trim(rpad(c_mktsegment, 12, ' ')) AS seg_trim
    FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey
    """,
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper / lpad / rpad / replace / length / reverse /
    instr / substring / levenshtein / concat_ws / trim — value-verified
    (levenshtein in particular backs fuzzy-match dedup)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("up_name"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
            F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("short_name"),
            F.length("c_name").cast("int").alias("name_len"),
            F.reverse("c_mktsegment").alias("seg_rev"),
            F.instr("c_name", "#").cast("int").alias("hash_pos"),
            F.substring("c_name", 1, 8).alias("name_head"),
            F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("int")
            .alias("seg_lev"),
            F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string"))
            .alias("seg_nat"),
            F.trim(F.rpad("c_mktsegment", 12, " ")).alias("seg_trim"),
        )
        .orderBy("c_custkey")
    )


@register(
    "scalar_datetime_battery",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST((2000 * 12 + 1) - (year(o_orderdate) * 12 + month(o_orderdate))
                AS INTEGER) AS whole_months_to_2000,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey
    """,
)
def scalar_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: interval arithmetic / last_day / date_trunc /
    quarter / ISO weekday / day-of-year / month difference / epoch — the
    calendar toolkit behind every time-bucketed rollup. Month difference
    is counted in WHOLE months (both engines' fractional conventions
    differ; the whole-month count is engine-portable)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd")
            .alias("plus_30d"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.date_trunc("month", d), "yyyy-MM-dd")
            .alias("month_start"),
            F.quarter(d).cast("int").alias("qtr"),
            F.dayofweek(F.date_sub(d.cast("date"), 1)).cast("int").alias("iso_dow"),
            F.dayofyear(d).cast("int").alias("doy"),
            # month-INDEX difference, not months_between: Spark counts
            # elapsed months with day fractions, DuckDB counts boundary
            # crossings — the index arithmetic is the portable form
            (F.lit(2000 * 12 + 1) - (F.year(d) * 12 + F.month(d)))
            .cast("int").alias("whole_months_to_2000"),
            F.unix_timestamp(d).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "nested_struct_surgery",
    oracle="""
    SELECT doc_id,
           lang AS meta_lang,
           CAST(strlen(text) AS BIGINT) AS meta_bytes,
           'v2' AS meta_schema_rev
    FROM documents ORDER BY doc_id
    """,
)
def nested_struct_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct column surgery — the in-place schema-evolution ops
    every nested dataset eventually needs: build a struct, ADD a field
    (`withField`), DROP a field (`dropFields`), then read fields back
    out. All pure Catalyst expressions (UpdateFields nodes) — no
    rebuild-the-whole-struct projection, which matters when the struct
    has hundreds of fields at 100 TB; the oracle checks the surviving
    fields' values."""
    d = load_table(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("lang").alias("lang"),
        F.lit("v1").alias("schema_rev"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    evolved = (
        d.select("doc_id", meta.alias("meta"))
        # evolve: bump the revision, drop nothing yet
        .withColumn("meta", F.col("meta").withField("schema_rev", F.lit("v2")))
        # add a derived field, then drop it again (both UpdateFields)
        .withColumn("meta", F.col("meta").withField("tmp_flag", F.lit(True)))
        .withColumn("meta", F.col("meta").dropFields("tmp_flag"))
    )
    return (
        evolved.select(
            "doc_id",
            F.col("meta.lang").alias("meta_lang"),
            F.col("meta.n_bytes").alias("meta_bytes"),
            F.col("meta.schema_rev").alias("meta_schema_rev"),
        )
        .orderBy("doc_id")
    )


@register(
    "sql_collation_casefold",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE lower(c_mktsegment) = 'building')
                AS BIGINT) AS lcase_building_matches,
           CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'building')
                AS BIGINT) AS binary_building_matches
    FROM customer GROUP BY c_mktsegment
    HAVING COUNT(*) FILTER (WHERE lower(c_mktsegment) = 'building') > 0
    ORDER BY c_mktsegment
    """,
)
def sql_collation_casefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: the SAME equality predicate matches or
    not depending on the column's collation — UTF8_LCASE folds case at
    compare time (no lower() rewrite, so an index/stats on the column
    stay usable), UTF8_BINARY does not. The oracle states the semantic
    via explicit lower() since DuckDB compares binary by default. At
    100 TB collation beats wrapping every comparison in lower():
    the cast is once per scan batch, not a derived column that defeats
    pushdown."""
    c = load_table(spark, sf_dir, "customer")
    seg_lcase = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.when(seg_lcase == F.lit("building"), 1))
            .cast("bigint").alias("lcase_building_matches"),
            F.count(F.when(F.col("c_mktsegment") == "building", 1))
            .cast("bigint").alias("binary_building_matches"),
        )
        .filter(F.col("lcase_building_matches") > 0)
        .select(F.col("c_mktsegment").cast("string").alias("c_mktsegment"),
                "lcase_building_matches", "binary_building_matches")
        .orderBy("c_mktsegment")
    )


@register(
    "sql_parameterized_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity >= 30 AND l_discount BETWEEN 0.02 AND 0.08
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sql_parameterized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args=...)): the injection-safe
    templating surface — parameters are BOUND AS LITERALS by the parser,
    so Catalyst still constant-folds and pushes them into the scan
    (same plan as hand-inlined literals; no string interpolation).
    The oracle inlines the same values."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_quantity >= :min_qty
          AND l_discount BETWEEN :lo_disc AND :hi_disc
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        args={"min_qty": 30, "lo_disc": 0.02, "hi_disc": 0.08},
    )


@register(
    "scalar_try_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey + 1 AS BIGINT) AS t_add,
           round(o_totalprice / nullif(o_orderkey % 3, 0), 6) AS t_div,
           TRY_CAST(o_orderpriority AS DOUBLE) AS t_num,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS t_prio_digit
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def scalar_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety battery: Spark 4 runs with ANSI ON, where plain
    arithmetic/casts RAISE on overflow, bad input, or division by zero.
    The try_* family is the null-on-error escape valve — this query
    exercises try_add, try_divide (NULL at %3==0 keys), and try_to_number
    on non-numeric text, mirrored by DuckDB's nullif/TRY_CAST. The
    engine-wide discipline (try_cast/try_divide in every pipeline,
    never bare casts) is what keeps 100 TB jobs from dying at hour 9
    on one malformed row."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.try_add(F.col("o_orderkey"), F.lit(1)).alias("t_add"),
            F.round(F.try_divide(F.col("o_totalprice"),
                                 F.col("o_orderkey") % 3), 6).alias("t_div"),
            F.col("o_orderpriority").try_cast("double").alias("t_num"),
            F.substring("o_orderpriority", 1, 1).try_cast("bigint")
            .alias("t_prio_digit"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "events_json_infer_typed",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM (SELECT event_id,
                 CASE WHEN json_valid(props) THEN props END AS props
          FROM events)
    GROUP BY 1 ORDER BY 1
    """,
)
def events_json_infer_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema INFERENCE for semi-structured ingest: the struct type is
    inferred from the UNION of a bounded sample (spark.read.json merges
    per-row schemas, so a key absent or differently typed in any single
    row still lands in the inferred struct — one arbitrary first() row
    would silently NULL such keys corpus-wide), and that inferred schema
    drives a typed from_json over the whole column — the two-step every
    JSON lake ingestion does (infer once on a sample, parse typed at
    scale; never schema-per-row). The driver-side inference cost is one
    bounded-sample query; the corpus-scale parse is a JVM expression
    with the aggregate pushing through it."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    # Sample NON-NULL props for inference (read.json rejects None
    # elements, and a NULL-heavy corpus could otherwise blank the whole
    # sample); malformed blobs are fine — they infer a _corrupt_record
    # column, and the typed from_json below NULLs them.
    samples = [r["props"] for r in
               (ev.filter(F.col("props").isNotNull())
                .select("props").limit(64).collect())]
    if samples:
        inferred = spark.read.json(
            spark.sparkContext.parallelize(samples, 1)).schema
    else:
        inferred = T.StructType([])
    if "k" not in inferred.fieldNames():
        # no JSON in the sample window, or none of it carried the
        # extracted key (e.g. 64 malformed blobs infer only
        # _corrupt_record): p.k would fail RESOLUTION, not return NULL
        # — extend the schema so every extraction is NULL, exactly
        # what the oracle computes over such a column (review r9)
        inferred = T.StructType(
            list(inferred.fields) + [T.StructField("k", T.LongType())])
    parsed = ev.select(
        "event_id", F.from_json("props", inferred).alias("p"))
    return (
        parsed.groupBy(F.col("p.k").cast("bigint").alias("k"))
        .agg(F.count("*").cast("bigint").alias("n"),
             F.min("event_id").cast("bigint").alias("first_event"))
        .orderBy("k")
    )


@register(
    "setop_union_evolved_schemas",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderdate < '1995-01-01'
    ),
    new AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderdate >= '1995-01-01'
    ),
    u AS (SELECT * FROM old UNION ALL SELECT * FROM new)
    SELECT COALESCE(o_orderpriority, '<pre-schema>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def setop_union_evolved_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved union: an OLD snapshot written before a column
    existed unions with the NEW schema via
    unionByName(allowMissingColumns=True) — absent columns null-fill,
    by NAME, not position (the positional union trap corrupts silently
    when column order drifts). The query rolls the union up by the
    evolved column with a sentinel for pre-schema rows — the
    read-old-and-new-together shape every evolving lake table needs."""
    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderdate") < "1995-01-01")
           .select("o_orderkey", "o_totalprice"))  # pre-evolution schema
    new = (o.filter(F.col("o_orderdate") >= "1995-01-01")
           .select("o_orderkey", "o_totalprice", "o_orderpriority"))
    u = old.unionByName(new, allowMissingColumns=True)
    return (
        u.groupBy(F.coalesce("o_orderpriority", F.lit("<pre-schema>"))
                  .alias("priority"))
        .agg(F.count("*").cast("bigint").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price"))
        .orderBy("priority")
    )
