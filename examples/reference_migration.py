"""Switching from ashleycheng/house-price-etl-pipeline to this engine.

Runnable end-to-end (``python examples/reference_migration.py``): builds
a reference-shaped raw CSV drop (BOM, embedded English header row,
Minguo dates), then runs every job the reference runs, mapped 1:1 to
this engine's API. Each step names the reference entry point it
replaces (file:line in /root/reference).

| reference job                                  | here                                   |
|------------------------------------------------|----------------------------------------|
| web_crawler/crawler.py (poll, unzip, publish)  | sources.acquisition (wait_for_downloads → publish_to_landing) |
| etl_pipeline_spark.py (building batch ETL)     | load_raw_csv → clean_building_transactions |
| etl_pipeline_beam.py (land batch ETL)          | load_raw_csv → clean_land_transactions |
| BigQuery write overwrite/truncate/append       | sinks.write_table(mode=...) / write_jdbc_table (external warehouse) |
| cloud_function/main.py + beam_auto (event run) | streaming.ingest.run_ingest_available_now |
| "avg price by year" BigQuery analytic          | operators.etl.avg_price_by_year        |

The Python UDFs (add_city, date_format, check_date —
etl_pipeline_spark.py:46-48) do not exist here: their semantics are
native Catalyst expressions (functions/geo.py, functions/dates.py), so
the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from house_price_etl_pipeline_spark.operators.etl import (
    avg_price_by_year,
    clean_building_transactions,
    clean_land_transactions,
)
from house_price_etl_pipeline_spark.session import get_spark
from house_price_etl_pipeline_spark.sources.csv_house import load_raw_csv
from house_price_etl_pipeline_spark.sources.sinks import read_table, write_table
from house_price_etl_pipeline_spark.streaming.ingest import (
    run_ingest_available_now,
)

# Reference-shaped raw file content: BOM on the first header cell, the
# embedded second English header row, Minguo dates, 房地/土地 rows.
_HEADER = ("﻿鄉鎮市區,交易標的,土地位置建物門牌,土地移轉總面積平方公尺,"
           "建物移轉總面積平方公尺,建築完成年月,交易年月日,總價元,單價元平方公尺")
_ENGLISH = ("The villages and towns urban district,transaction sign,"
            "land sector position building sector house number plate,"
            "land shifting total area square meter,"
            "building shifting total area square meter,"
            "construction to complete the years,"
            "transaction year month and day,total price NTD,"
            "the unit price (NTD / square meter)")
_ROWS = [
    "中正區,房地(土地+建物),大安段一小段1地號,120.5,86.2,0990312,1100718,12000000,139211",
    "板橋區,房地(土地+建物),文化段100地號,95.0,70.4,1010505,1100802,9800000,139204",
    "中正區,土地,大安段二小段9地號,200.0,0,,1100901,15000000,75000",
    "潭子區,車位,潭子段55地號,30.0,12.0,1050101,1101010,800000,66666",
]


def make_raw_drop(work: str, season: str = "101S4") -> str:
    """Reproduce the crawler's output through the acquisition layer
    (web_crawler/crawler.py): a season ZIP lands in the download dir,
    the completion poll unzips it, and publication renames the *a.csv
    members {season}_{file} into the landing dir (char 7 of the
    published basename is the city code the 縣市 derivation reads)."""
    import zipfile

    from house_price_etl_pipeline_spark.sources.acquisition import (
        publish_to_landing, wait_for_downloads)

    dl = os.path.join(work, "downloads")
    os.makedirs(dl, exist_ok=True)
    with zipfile.ZipFile(os.path.join(dl, f"{season}.zip"), "w") as zf:
        for code in ("a", "f"):  # a=台北市, f=新北市
            zf.writestr(f"{code}_lvr_land_a.csv",
                        "\n".join([_HEADER, _ENGLISH, *_ROWS]) + "\n")
    wait_for_downloads(dl, poll_seconds=0.01, max_polls=1)
    landing = os.path.join(work, "landing")
    publish_to_landing(dl, [season], landing)
    return os.path.join(landing, "*_a.csv")


def main() -> None:
    spark = get_spark(cores=4)
    work = tempfile.mkdtemp(prefix="ref_migration_")
    glob = make_raw_drop(work)

    # --- etl_pipeline_spark.py:40-89 (building transactions) -----------
    raw = load_raw_csv(spark, glob)
    buildings = clean_building_transactions(raw)
    print("building transactions:")
    buildings.show(5, truncate=False)

    # --- etl_pipeline_beam.py:10-46 (land transactions) ----------------
    land = clean_land_transactions(raw)
    print("land transactions:")
    land.show(5, truncate=False)

    # --- BigQuery sink modes (spark:86-89 overwrite; beam:165-171
    #     truncate; beam_auto:174-181 append) → parquet table ----------
    table = os.path.join(work, "buildings")
    write_table(buildings, table, mode="overwrite")
    write_table(buildings, table, mode="append")
    print("sink rows after overwrite+append:",
          read_table(spark, table).count())

    # --- the actual external-warehouse shape (BigQuery WRITE_TRUNCATE,
    #     etl_pipeline_spark.py:86-89) → JDBC with a declared schema ---
    from house_price_etl_pipeline_spark.sources.sinks import (
        derby_url, read_jdbc_table, write_jdbc_table)
    url = derby_url(os.path.join(work, "warehouse_db"))
    write_jdbc_table(buildings.select("city", "unit_price_ping"),
                     url, "building_prices", mode="overwrite",
                     schema_ddl="city VARCHAR(12)")
    print("warehouse rows:",
          read_jdbc_table(spark, url, "building_prices").count())

    # --- cloud_function/main.py event-driven rerun → one streaming
    #     query with checkpointed exactly-once ingest ------------------
    out_dir = os.path.join(work, "ingested")
    run_ingest_available_now(
        spark,
        src_dir=os.path.dirname(glob),
        out_dir=out_dir,
        checkpoint_dir=os.path.join(work, "_ckpt"),
    )
    print("event-driven ingest rows:", read_table(spark, out_dir).count())

    # --- README.md:103-106: "Average land price by year in Yilan
    #     County" — the documented analytic --------------------------
    print("avg price by year (the reference's documented analytic):")
    avg_price_by_year(buildings, city="台北市").show()

    spark.stop()


if __name__ == "__main__":
    main()
