"""City-code → city-name mapping (reference `etl_pipeline_spark.py:11-23`).

The reference uses a 26-entry Python dict inside a row-at-a-time UDF keyed
on char 7 of the source filename. Semantically this is a broadcast hash
join of the fact table against a tiny dimension. We express it both ways:

- :func:`city_from_code` — a ``create_map`` literal expression (pure
  Catalyst, constant-folded, zero shuffle, zero Python);
- :func:`city_dim` — an explicit 26-row DataFrame to exercise Spark's
  broadcast-join machinery with identical results (SURVEY §2.10).

At 100 TB the map-literal form is strictly better (no join at all); the
dim-table form is the template for *real* dimensions that don't fit in a
literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Keyed by char 7 (1-based) of the raw filename, e.g.
# ``101S4_g_lvr_land_a.csv`` → 'g' → 宜蘭縣. 26 entries, verbatim semantics
# of reference etl_pipeline_spark.py:15-20 (content is public open data
# city codes, not code).
CITY_CODE_MAP: dict[str, str] = {
    "a": "台北市", "b": "台中市", "c": "基隆市", "d": "台南市",
    "e": "高雄市", "f": "新北市", "g": "宜蘭縣", "h": "桃園縣",
    "i": "嘉義市", "j": "新竹縣", "k": "苗栗縣", "l": "臺中縣",
    "m": "南投縣", "n": "彰化縣", "o": "新竹市", "p": "雲林縣",
    "q": "嘉義縣", "r": "臺南縣", "s": "高雄縣", "t": "屏東縣",
    "u": "花蓮縣", "v": "臺東縣", "w": "金門縣", "x": "澎湖縣",
    "y": "陽明山", "z": "連江縣",
}

def _map_literal() -> Column:
    # built lazily: F.lit needs an active SparkContext
    return F.create_map(
        *[F.lit(x) for kv in sorted(CITY_CODE_MAP.items()) for x in kv]
    )


def city_code_from_filename(col: Column | str) -> Column:
    """Char 7 of the basename of a path column (reference ``name[6]``)."""
    c = F.col(col) if isinstance(col, str) else col
    basename = F.element_at(F.split(c, "/"), -1)
    return F.substring(basename, 7, 1)


def city_from_code(code: Column | str) -> Column:
    """Map-literal lookup; NULL for unknown codes (dict.get semantics)."""
    c = F.col(code) if isinstance(code, str) else code
    return F.element_at(_map_literal(), c)


def city_dim(spark: SparkSession) -> DataFrame:
    """The same mapping as an explicit broadcast-able dimension table."""
    return spark.createDataFrame(
        sorted(CITY_CODE_MAP.items()), schema="city_code string, city string"
    )
