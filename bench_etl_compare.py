#!/usr/bin/env python
"""Head-to-head: the reference's UDF-based Spark ETL vs this engine's
native-expression pipeline, on identical reference-shaped CSV input.

The reference publishes no numbers (BASELINE.md), so this script MAKES
the comparison measurable: it generates N rows of raw house-price CSV
(BOM + embedded English header + Minguo dates + garbage values — the
real files' shape, FIXTURES.md §A), then times two end-to-end pipelines
to a fully-materialized noop sink:

- **reference-faithful**: a from-scratch reimplementation of
  `etl_pipeline_spark.py:51-80`'s dataflow INCLUDING its three
  row-at-a-time Python UDFs (`add_city` :11-23, `date_format` :47,
  `check_date` :26-33 via dateutil) and the validity-flag
  filter-then-drop (:65-67). Logic follows SURVEY §2.4 X1-X3; no
  reference code is copied.
- **native (this engine)**: `sources/csv_house.py` +
  `operators/etl.py:clean_building_transactions` — same semantics as
  native expressions (SURVEY's rebuild thesis: X1-X3 need no UDF).

Both read the same files, produce the same rows (asserted), and run the
flagship analytic. Prints ONE JSON line.

Usage:
    python bench_etl_compare.py [n_rows_per_city]   # default 50_000
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from house_price_etl_pipeline_spark.operators.etl import (
    avg_price_by_year, clean_building_transactions)
from house_price_etl_pipeline_spark.session import get_spark
from house_price_etl_pipeline_spark.sources.csv_house import load_raw_csv

HEADER_ZH = (
    "鄉鎮市區,交易標的,土地位置建物門牌,土地移轉總面積平方公尺,"
    "建物移轉總面積平方公尺,建築完成年月,交易年月日,總價元,單價元平方公尺"
)
HEADER_EN = (
    "The villages and towns urban district,transaction sign,"
    "land sector position building sector house number plate,"
    "land shifting total area square meter,"
    "building shifting total area square meter,"
    "construction to complete the years,transaction year month and day,"
    "total price NTD,the unit price (NTD / square meter)"
)
# letter → reference city-code files (X1 keys); g = 宜蘭縣 (the flagship's city)
CITY_CODES = ["a", "b", "e", "f", "g", "h", "j", "k"]
DISTRICTS = ["礁溪鄉", "宜蘭市", "羅東鎮", "大安區", "中山區", "板橋區"]
SIGNS = ["房地(土地+建物)", "土地", "車位", "房地(土地+建物)"]


def gen_city_file(path: Path, code: str, n: int, seed: int) -> None:
    rows = []
    for i in range(n):
        h = (i * 2654435761 + seed * 97) & 0x7FFFFFFF
        district = DISTRICTS[h % len(DISTRICTS)]
        sign = SIGNS[h % len(SIGNS)]
        area_land = f"{50 + h % 300}.{h % 100:02d}"
        area_bldg = f"{30 + h % 200}.{h % 100:02d}" if sign != "土地" else "0"
        # Minguo dates: mostly valid, ~1% garbage (invalid calendar day).
        # No EMPTY dates: the reference's date_format UDF raises on ''
        # (int('') — SURVEY X2 edge semantics), so its production data
        # cannot contain them in surviving rows; the native pipeline
        # handles them anyway (tests/test_etl.py), but this comparison
        # feeds both pipelines only what the reference can survive.
        if h % 97 == 0:
            tx_date = "1100231"          # Feb 31 → must be dropped
        else:
            tx_date = f"{100 + h % 12}{1 + h % 12:02d}{1 + h % 28:02d}"
        total = str(1_000_000 + (h % 1000) * 10_000) if h % 89 else "garbage"
        unit = "0" if h % 7 == 0 else str(30_000 + h % 200_000)
        rows.append(f"{district},{sign},大湖段{h % 999}地號,"
                    f"{area_land},{area_bldg},,{tx_date},{total},{unit}")
    path.write_text("﻿" + HEADER_ZH + "\n" + HEADER_EN + "\n"
                    + "\n".join(rows) + "\n", encoding="utf-8")


def reference_pipeline(spark, glob: str):
    """The reference dataflow with its UDFs, reimplemented
    (etl_pipeline_spark.py:40-80 per SURVEY §2.4/§3.1)."""
    from dateutil import parser as dateparser

    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    city_map = {"a": "台北市", "b": "台中市", "e": "高雄市", "f": "新北市",
                "g": "宜蘭縣", "h": "桃園縣", "j": "新竹縣", "k": "苗栗縣"}

    @udf(StringType())
    def add_city(filename):                      # ref :11-23
        return city_map.get(filename.split("/")[-1][6], "")

    @udf(StringType())
    def date_format_udf(d):                      # ref :47 (raises on '')
        return str(int(d[:-4]) + 1911) + "-" + d[-4:-2] + "-" + d[-2:]

    @udf(StringType())
    def check_date(d):                           # ref :26-33
        try:
            dateparser.parse(d)
            return "True"
        except Exception:
            return "False"

    eng = ["district", "transaction_sign", "position", "land_area_m2",
           "building_area_m2", "complete_date", "transaction_date",
           "total_price", "unit_price_m2"]
    df = (spark.read.option("header", True).csv(glob)
          .toDF(*eng)
          .filter(F.col("transaction_sign") != "transaction sign")
          .filter(F.col("transaction_sign").startswith("房地"))
          .withColumn("filename", F.input_file_name())
          .withColumn("city", add_city("filename"))
          .select("city", "district", "transaction_sign", "position",
                  "building_area_m2", "transaction_date", "total_price",
                  "unit_price_m2")
          # reference order (etl_pipeline_spark.py:63-67): reformat
          # first, then the validity flag over the FORMATTED string,
          # filter on the "True"/"False" strings, drop the helper
          .withColumn("transaction_date", date_format_udf("transaction_date"))
          .withColumn("check_date", check_date("transaction_date"))
          .filter(F.col("check_date") == "True")
          .drop("check_date")
          .withColumn("transaction_date",
                      F.col("transaction_date").try_cast("date"))
          .withColumn("building_area_m2",
                      F.col("building_area_m2").try_cast("double"))
          .withColumn("total_price", F.col("total_price").try_cast("long"))
          .withColumn("unit_price_m2",
                      F.col("unit_price_m2").try_cast("double"))
          # Beam-semantics conditional repair (SURVEY X7)
          .withColumn("unit_price_m2",
                      F.when(F.col("unit_price_m2") == 0,
                             F.round(F.col("total_price")
                                     / F.col("building_area_m2"), 2))
                      .otherwise(F.col("unit_price_m2")))
          .withColumn("building_area_ping",
                      F.round(F.col("building_area_m2") / 3.30579, 2))
          .withColumn("unit_price_ping",
                      F.round(F.col("unit_price_m2") * 3.30579, 2)))
    return df


def main() -> None:
    n_per_city = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="etl_compare")
    base = Path(tempfile.mkdtemp(prefix="etl_compare_"))
    try:
        for i, code in enumerate(CITY_CODES):
            gen_city_file(base / f"101S4_{code}_lvr_land_a.csv",
                          code, n_per_city, seed=i)
        glob = str(base / "*_a.csv")

        def mat(df):
            df.write.format("noop").mode("overwrite").save()

        # warmup both paths once (JVM + Python UDF workers)
        mat(reference_pipeline(spark, glob).limit(1000))
        mat(clean_building_transactions(load_raw_csv(spark, glob)).limit(1000))

        t0 = time.perf_counter()
        ref_df = reference_pipeline(spark, glob)
        mat(ref_df)
        t_ref = time.perf_counter() - t0

        t0 = time.perf_counter()
        ours_df = clean_building_transactions(load_raw_csv(spark, glob))
        mat(ours_df)
        t_native = time.perf_counter() - t0

        # same rows out (the rebuild-thesis check)
        n_ref, n_ours = ref_df.count(), ours_df.count()

        t0 = time.perf_counter()
        flagship = avg_price_by_year(ours_df).collect()
        t_flagship = time.perf_counter() - t0

        print(json.dumps({
            "metric": "etl_udf_vs_native",
            "rows_in": n_per_city * len(CITY_CODES),
            "rows_out_reference": n_ref,
            "rows_out_native": n_ours,
            "reference_udf_sec": round(t_ref, 3),
            "native_sec": round(t_native, 3),
            "speedup": round(t_ref / t_native, 2),
            "flagship_sec": round(t_flagship, 3),
            "flagship_years": len(flagship),
            "unit": "sec",
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
