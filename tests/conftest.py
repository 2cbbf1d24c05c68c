from __future__ import annotations

import os

import duckdb
import pytest

from house_price_etl_pipeline_spark.session import get_spark
from house_price_etl_pipeline_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cores=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


HOUSE_HEADER_ZH = (
    "鄉鎮市區,交易標的,土地位置建物門牌,土地移轉總面積平方公尺,"
    "建物移轉總面積平方公尺,建築完成年月,交易年月日,總價元,單價元平方公尺"
)
HOUSE_HEADER_EN = (
    "The villages and towns urban district,transaction sign,land sector position building sector house number plate,"
    "land shifting total area square meter,building shifting total area square meter,"
    "construction to complete the years,transaction year month and day,total price NTD,"
    "the unit price (NTD / square meter)"
)


@pytest.fixture(scope="session")
def house_csv_fixture(tmp_path_factory) -> str:
    """Reference-shaped raw CSVs (FIXTURES.md §A): BOM on header, embedded
    English header row, Minguo dates, garbage values, zero unit prices."""
    d = tmp_path_factory.mktemp("house_csv")
    files = {
        "101S4_g_lvr_land_a.csv": [
            "礁溪鄉,房地(土地+建物),大湖段572地號,100.5,82.64,0991231,1100718,5000000,60500",
            "礁溪鄉,房地(土地+建物),無段之地,50.0,33.06,,1100231,1000000,0",
            "宜蘭市,土地,金六結段123地號,66.12,0,,990101,2000000,0",
            "宜蘭市,車位,大湖段9地號,10,10,,1100101,300000,3000",
            "羅東鎮,房地(土地+建物),北成段77地號,88.8,99.17,1050630,1070315,8000000,garbage",
        ],
        "101S4_a_lvr_land_a.csv": [
            "大安區,房地(土地+建物),仁愛段100地號,120.0,165.29,1001010,1111111,30000000,181500",
            "大安區,土地,沒有那個字,200.0,0,,1111212,12000000,0",
        ],
    }
    for fname, rows in files.items():
        (d / fname).write_text(
            "﻿" + HOUSE_HEADER_ZH + "\n" + HOUSE_HEADER_EN + "\n"
            + "\n".join(rows) + "\n",
            encoding="utf-8",
        )
    return str(d)
