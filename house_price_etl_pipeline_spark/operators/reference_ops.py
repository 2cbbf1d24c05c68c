"""Reference-semantics operators (SURVEY §2), oracle-checked on testdata.

The reference's non-trivial semantics — Minguo date conversion, the
city-code dict lookup, regex extract with null-on-no-match, conditional
repair, unit conversion — are exercised here against the driver's tables
(the house-price CSV fixtures additionally cover them end-to-end in
tests/test_etl.py). Each query transposes one reference operator onto
testdata columns so the DuckDB oracle can verify the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import minguo_to_date
from ..functions.geo import CITY_CODE_MAP, city_dim, city_from_code
from ..functions.numeric import M2_PER_PING, dec_sum, dec_sum_expr
from ..plans.catalog import register
from ..sources.tables import load_table

_DEC = "decimal(25,6)"

# DuckDB twin of the CITY_CODE_MAP lookup as a CASE expression.
_CITY_CASE = "CASE " + " ".join(
    f"WHEN ({{key}}) = '{k}' THEN '{v}'" for k, v in sorted(CITY_CODE_MAP.items())
) + " END"

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


# --- X2/X4: Minguo → Gregorian, incl. 6- and 7-digit years -----------------

@register(
    "ref_minguo_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(CASE WHEN year(o_orderdate) % 2 = 1
                         THEN o_orderdate + INTERVAL 100 YEAR
                         ELSE o_orderdate END, '%Y-%m-%d') AS parsed_date
    FROM orders ORDER BY o_orderkey
    """,
)
def ref_minguo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Minguo digit string from each order date (odd years shifted
    +100 so both 6-digit and 7-digit ROC years occur — reference
    etl_pipeline_spark.py:47 handles both via ``date[:-4]``), then parse
    it back with the engine's native expression. Round-trip must equal
    the oracle's direct computation."""
    o = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    # +100y only on odd years: Feb 29 exists only in (even) leap years, so
    # the shift can't fabricate an invalid date.
    roc_year = F.when(year % 2 == 1, year + 100 - 1911).otherwise(year - 1911)
    minguo = F.concat(roc_year.cast("string"), F.date_format("o_orderdate", "MMdd"))
    return (
        o.select(
            "o_orderkey",
            F.date_format(minguo_to_date(minguo), "yyyy-MM-dd").alias("parsed_date"),
        )
        .orderBy("o_orderkey")
    )


# --- X3/F4: invalid-date null-and-filter semantics -------------------------

@register(
    "ref_invalid_date_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_linenumber NOT IN (1, 2, 3)) AS BIGINT) AS n_valid,
           CAST(COUNT(*) FILTER (WHERE l_linenumber IN (1, 2, 3)) AS BIGINT) AS n_invalid
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def ref_invalid_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject three flavors of garbage the reference's UDF would RAISE on
    (empty string → int('') ValueError, non-digits, out-of-calendar
    1100231) and verify the engine nulls them instead (SURVEY §7.4). The
    oracle counts by construction rule, so this checks our null semantics
    against ground truth, not against a DuckDB reimplementation."""
    li = load_table(spark, sf_dir, "lineitem")
    minguo = (
        F.when(F.col("l_linenumber") == 1, F.lit("1100231"))   # Feb 31
        .when(F.col("l_linenumber") == 2, F.lit("garbage"))
        .when(F.col("l_linenumber") == 3, F.lit(""))
        .otherwise(F.concat((F.year("l_shipdate") - 1911).cast("string"),
                            F.date_format("l_shipdate", "MMdd")))
    )
    parsed = minguo_to_date(minguo)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(parsed).alias("n_valid"),
            F.sum(F.when(parsed.isNull(), 1).otherwise(0)).alias("n_invalid"),
        )
        .orderBy("l_returnflag")
    )


# --- X1 / §2.10: city-code lookup — map literal AND broadcast join ---------

_KEY_SQL = "substring('abcdefghijklmnopqrstuvwxyz', CAST(c_custkey % 26 AS INTEGER) + 1, 1)"


@register(
    "ref_city_lookup_map",
    oracle=f"""
    SELECT {_CITY_CASE.format(key=_KEY_SQL)} AS city,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def ref_city_lookup_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 as a pure ``create_map`` literal expression: zero shuffle, zero
    Python — the 100 TB-preferred form of a tiny-dim lookup."""
    c = load_table(spark, sf_dir, "customer")
    code = F.lit(_ALPHABET).substr(
        ((F.col("c_custkey") % 26).cast("int") + 1), F.lit(1)
    )
    return (
        c.withColumn("city", city_from_code(code))
        .groupBy("city").agg(F.count("*").alias("n"))
        .orderBy("city")
    )


@register(
    "ref_city_lookup_join",
    oracle=f"""
    SELECT {_CITY_CASE.format(key=_KEY_SQL)} AS city,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def ref_city_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same lookup as an explicit broadcast hash join against the
    26-row dimension — identical results to ref_city_lookup_map by
    construction (SURVEY §2.10): the template for real dimensions."""
    c = load_table(spark, sf_dir, "customer")
    dim = city_dim(spark)
    code = F.lit(_ALPHABET).substr(
        ((F.col("c_custkey") % 26).cast("int") + 1), F.lit(1)
    )
    return (
        c.withColumn("city_code", code)
        .join(F.broadcast(dim), "city_code", "left")
        .groupBy("city").agg(F.count("*").alias("n"))
        .orderBy("city")
    )


# --- X10: regex group extract, null on no-match ----------------------------

@register(
    "ref_regex_section_extract",
    oracle="""
    SELECT doc_id,
           NULLIF(regexp_extract(text, '^(.*join)', 1), '') AS section,
           CAST(length(NULLIF(regexp_extract(text, '^(.*join)', 1), '')) AS BIGINT) AS section_len
    FROM documents ORDER BY doc_id
    """,
)
def ref_regex_section_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 semantics: longest prefix ending in a marker token ('段' in the
    reference, 'join' on testdata docs), NULL — not '' — on no-match
    (pandas str.extract semantics; both engines return '' natively)."""
    d = load_table(spark, sf_dir, "documents")
    sec = F.nullif(F.regexp_extract("text", r"^(.*join)", 1), F.lit(""))
    return (
        d.select(
            "doc_id",
            sec.alias("section"),
            F.length(sec).cast("long").alias("section_len"),
        )
        .orderBy("doc_id")
    )


# --- X7: conditional repair (when/otherwise, Beam division semantics) ------

@register(
    "ref_conditional_repair",
    oracle=f"""
    SELECT l_returnflag,
           round({dec_sum_expr("CASE WHEN l_tax = 0 THEN l_extendedprice / l_quantity ELSE l_tax END")}, 2) AS sum_repaired,
           CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_repaired
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def ref_conditional_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: if the value is 0, recompute as total/quantity, else keep —
    Beam semantics (divide by the denominator column, reference
    etl_pipeline_beam.py:99), NOT the reference Spark variant's
    divide-by-zero bug (etl_pipeline_spark.py:73-74, SURVEY §7.4).

    Note: rounding happens AFTER the aggregate — per-row round(x, 2) on
    doubles is engine-divergent at half-cent boundaries (Spark BigDecimal
    HALF_UP vs DuckDB's C rounding); the ETL pipeline's per-row rounding
    is covered by the golden fixture tests instead."""
    li = load_table(spark, sf_dir, "lineitem")
    repaired = F.when(
        F.col("l_tax") == 0,
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")),
    ).otherwise(F.col("l_tax"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(repaired.cast(_DEC)).cast("double"), 2).alias("sum_repaired"),
            F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_repaired"),
        )
        .orderBy("l_returnflag")
    )


# --- X8/X9: unit conversion + rounding -------------------------------------

@register(
    "ref_unit_conversion_ping",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           floor(l_quantity / {M2_PER_PING} * 100 + 0.5) / 100 AS area_ping,
           floor(l_extendedprice * {M2_PER_PING} * 100 + 0.5) / 100
             AS price_ping
    FROM lineitem WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def ref_unit_conversion_ping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8+X9: m²→坪 division and its inverse on prices, rounded to 2 —
    row-level output so every value is checked, not just aggregates.
    Rounding is spelled floor(x*100+0.5)/100 on BOTH sides: engine
    round() tie-handling on doubles differs between Spark (BigDecimal
    HALF_UP on the exact binary expansion) and DuckDB (C-library FP),
    so a half-cent boundary value could flake the per-row hash — the
    explicit floor idiom is one deterministic rule both engines compute
    identically (review r9; same trick as emb_normalize_quantize)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey", "l_linenumber",
            (F.floor(F.col("l_quantity") / F.lit(M2_PER_PING) * 100
                     + 0.5) / 100).alias("area_ping"),
            (F.floor(F.col("l_extendedprice") * F.lit(M2_PER_PING) * 100
                     + 0.5) / 100).alias("price_ping"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- F2 + P1-P4: prefix filter, projection, renames ------------------------

@register(
    "ref_prefix_filter_rename",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_mktsegment AS segment, c_acctbal AS balance
    FROM customer WHERE c_mktsegment LIKE 'BUILD%'
    ORDER BY customer_id
    """,
)
def ref_prefix_filter_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (startswith → pushdown-able StartsWith) + the rename surface:
    bulk positional toDF (P2) as the reference does at
    etl_pipeline_spark.py:61, then map-based withColumnsRenamed (P3)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").startswith("BUILD"))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .toDF("customer_id", "customer_name", "segment", "balance")  # P2
        .withColumnsRenamed({})  # P3 surface (no-op map: names already final)
        .orderBy("customer_id")
    )


# --- S5/X14: source-file lineage column ------------------------------------

@register(
    "ref_filename_lineage",
    oracle="""
    SELECT 'nation.parquet' AS source_file, CAST(COUNT(*) AS BIGINT) AS n
    FROM nation GROUP BY 1
    """,
)
def ref_filename_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: input_file_name() lineage + X14 basename split. The oracle pins
    the expected basename; a wrong-path read or broken split mismatches."""
    n = load_table(spark, sf_dir, "nation")
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        n.withColumn("source_file", basename)
        .groupBy("source_file").agg(F.count("*").alias("n"))
    )
