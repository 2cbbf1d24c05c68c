"""The two reference ETL pipelines, rebuilt as pure DataFrame transforms.

Building-transaction pipeline ≙ reference `etl_pipeline_spark.py:51-80`;
land-transaction pipeline ≙ reference `etl_pipeline_beam.py:10-111`.
Both are single narrow-transformation chains: no shuffle, one stage,
filters/projections pushed into the CSV scan, zero Python UDFs (the
reference's three UDFs are native expressions here — SURVEY §2.4 X1-X3).

Deliberate divergences from the reference (SURVEY §7.4):
- invalid dates → NULL-and-filter instead of raising (X2/X3);
- the unit-price repair divides by the AREA (Beam semantics,
  `etl_pipeline_beam.py:99`) — the reference Spark variant divides by the
  zero unit price itself (`etl_pipeline_spark.py:73-74`), a bug;
- float64 everywhere (the reference mixes float32/float64, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import minguo_to_date
from ..functions.geo import city_code_from_filename, city_from_code
from ..functions.numeric import dec_avg, m2_to_ping, ping_price_from_m2

# Chinese → English rename maps (reference etl_pipeline_spark.py:43-45,
# etl_pipeline_beam.py:41-45).
_COMMON = {
    "鄉鎮市區": "township_dist",
    "交易標的": "transaction_sign",
    "土地位置建物門牌": "position",
    "交易年月日": "transaction_date",
    "總價元": "total_price",
    "單價元平方公尺": "unit_price_m2",
}
BUILDING_RENAMES = {**_COMMON,
                    "建物移轉總面積平方公尺": "building_area_m2",
                    "建築完成年月": "completion_date"}
LAND_RENAMES = {**_COMMON, "土地移轉總面積平方公尺": "land_area_m2"}

BUILDING_OUTPUT = ["city", "township_dist", "transaction_sign", "position",
                   "building_area_ping", "completion_date", "transaction_date",
                   "total_price", "unit_price_ping"]
LAND_OUTPUT = ["city", "township_dist", "transaction_sign", "position", "section",
               "land_area_ping", "transaction_date", "total_price",
               "unit_price_ping"]


def _common_tail(df: DataFrame, area_col: str) -> DataFrame:
    """Shared cleaning tail: dates, casts, repair, unit conversion.

    ``area_col`` is ``building_area_m2`` or ``land_area_m2``.
    """
    repaired_unit_price = F.when(
        F.col("unit_price_m2").try_cast("double") == 0,
        # Beam semantics: total / area (reference etl_pipeline_beam.py:99).
        # try_divide: NULL (not an ANSI error) when the area is 0 too.
        F.round(F.try_divide(F.col("total_price").try_cast("double"),
                             F.col(area_col).try_cast("double")), 2),
    ).otherwise(F.col("unit_price_m2").try_cast("double"))

    return (
        df
        # Minguo → DateType; NULL on garbage, then filter — replaces the
        # reference's check_date UDF + "True"/"False" flag + drop
        # (etl_pipeline_spark.py:63-67) with pushdown-friendly expressions.
        .withColumn("transaction_date", minguo_to_date("transaction_date"))
        .filter(F.col("transaction_date").isNotNull())
        # Lenient numeric coercion matching pd.to_numeric(errors=
        # 'coerce') at etl_pipeline_beam.py:98: parse as DOUBLE first —
        # a direct try_cast('long') silently NULLs decimal-formatted
        # strings like '2000000.0' that pandas coerces fine (review r9)
        # — then truncate to the reference's integer TWD type.
        .withColumn("total_price",
                    F.col("total_price").try_cast("double")
                    .try_cast("long"))
        .withColumn("unit_price_m2", repaired_unit_price)
        .withColumn(area_col, F.col(area_col).try_cast("double"))
        # m² → 坪 with 2-decimal rounding (etl_pipeline_spark.py:76-78).
        .withColumn(area_col.replace("_m2", "_ping"), m2_to_ping(area_col))
        .withColumn("unit_price_ping", ping_price_from_m2("unit_price_m2"))
    )


def clean_building_transactions(raw: DataFrame) -> DataFrame:
    """Building pipeline (reference `etl_pipeline_spark.py:51-80`).

    Input: all-string frame from ``load_raw_csv`` (with 檔名 lineage col).
    """
    return (
        raw
        # prefix filter: house+land transactions (etl_pipeline_spark.py:54)
        .filter(F.col("交易標的").startswith("房地"))
        # city from filename char 7 — map-literal, no UDF, no join
        .withColumn("city", city_from_code(city_code_from_filename("檔名")))
        .select("city", *BUILDING_RENAMES)
        .withColumnsRenamed(BUILDING_RENAMES)
        .transform(lambda df: _common_tail(df, "building_area_m2"))
        .select(*BUILDING_OUTPUT)
    )


def clean_land_transactions(raw: DataFrame) -> DataFrame:
    """Land pipeline (reference `etl_pipeline_beam.py:10-111`).

    Adds the regex-derived ``section`` column: longest prefix ending in 段,
    NULL on no match (pandas ``str.extract`` semantics — Spark's
    ``regexp_extract`` returns ``''`` there, so wrap in nullif; SURVEY X10).
    """
    return (
        raw
        .filter(F.col("交易標的") == "土地")  # etl_pipeline_beam.py:22
        .withColumn("city", city_from_code(city_code_from_filename("檔名")))
        .select("city", *LAND_RENAMES)
        .withColumnsRenamed(LAND_RENAMES)
        .withColumn("section",
                    F.nullif(F.regexp_extract("position", r"^(.*段)", 1),
                             F.lit("")))
        .transform(lambda df: _common_tail(df, "land_area_m2"))
        .select(*LAND_OUTPUT)
    )


def avg_price_by_year(cleaned: DataFrame, city: str = "宜蘭縣") -> DataFrame:
    """The reference's one documented analytic (README.md:103-106):
    average unit price by year for one city — the flagship query shape."""
    return (
        cleaned.filter(F.col("city") == city)
        .groupBy(F.year("transaction_date").alias("year"))
        # dec_avg, not plain avg: partition-order-independent result
        # (the numeric.py discipline every oracled aggregate follows)
        .agg(F.round(dec_avg("unit_price_ping"), 2)
             .alias("avg_unit_price_ping"))
        .orderBy("year")
    )


def materialize_partitioned(cleaned: DataFrame, path: str,
                            mode: str = "overwrite") -> None:
    """Post-ingest physical layout (SURVEY §4): parquet partitioned by
    (city, transaction year). The flagship analytic filters on city and
    groups by year, so at 100 TB it touches exactly the directories it
    needs — partition pruning instead of a full scan. CSV is an
    ingest-only format here; everything downstream reads this layout."""
    (cleaned
     .withColumn("year", F.year("transaction_date"))
     .write.mode(mode)
     .partitionBy("city", "year")
     .parquet(path))
