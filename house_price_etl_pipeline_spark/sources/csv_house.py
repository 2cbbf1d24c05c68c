"""Loader for reference-shaped raw house-price CSVs (FIXTURES.md §A).

Input quirks handled (all from the reference, SURVEY §2.1/S3):

- multi-file glob, all columns read as string (no inferSchema) —
  reference `etl_pipeline_spark.py:40-41`;
- row 1 header is Chinese with a UTF-8 BOM on the first cell — stripped
  via a rename pass (reference `etl_pipeline_beam.py:21`);
- row 2 of EVERY file is an English header row that must be dropped as
  data (reference `etl_pipeline_spark.py:53`) — done here with a single
  filter on 交易標的, which Catalyst pushes into the CSV scan;
- source-file lineage attached as 檔名 via ``input_file_name()``
  (reference `etl_pipeline_spark.py:56`).

Scale note: one Spark CSV scan over a glob plans one task per file split
— the per-file pandas loop of the reference Beam path (and its ToList
single-worker barrier, `etl_pipeline_beam.py:162`) has no equivalent
here by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BOM = "﻿"

# The English header row embedded as data row 1 of each file carries this
# value in the 交易標的 column (reference etl_pipeline_spark.py:53).
ENGLISH_HEADER_MARKER = "transaction sign"


def load_raw_csv(spark: SparkSession, path_glob: str) -> DataFrame:
    """Glob-scan raw house CSVs → all-string DataFrame with 檔名 lineage."""
    df = spark.read.option("header", True).csv(path_glob)
    # Strip the BOM the first header cell arrives with.
    renames = {c: c.lstrip(BOM) for c in df.columns if c.startswith(BOM)}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    df = df.withColumn("檔名", F.input_file_name())
    # Drop the per-file embedded English header row once, at the source.
    # NULL-safe: a data row with an EMPTY 交易標的 cell reads as NULL, and
    # a bare != would silently drop it too (review r9) — only the
    # literal header marker is a header row.
    return df.filter((F.col("交易標的") != ENGLISH_HEADER_MARKER)
                     | F.col("交易標的").isNull())
