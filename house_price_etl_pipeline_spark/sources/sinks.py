"""Format-pluggable writers — the engine's sink surface (SURVEY §2.7).

The reference writes to BigQuery three ways: overwrite
(`etl_pipeline_spark.py:86-89`), truncate+create (`etl_pipeline_beam.py:
165-171`), and append from the event-driven path
(`etl_pipeline_beam_auto.py:174-181`). Here the sink is parquet (or any
Spark DataSource format) with the same three mode semantics, plus the
two physical-layout levers that matter at 100 TB and have no reference
equivalent:

- **partitionBy**: directory-partitioned layout → partition PRUNING on
  read (a `WHERE city = X AND year = Y` query touches one directory, not
  100 TB). The reference instead relies on BigQuery clustering it never
  configures.
- **bucketBy**: pre-shuffled, hash-bucketed table layout → joins and
  aggs on the bucket key skip their exchange entirely (co-located join).
  Bucketed tables require ``saveAsTable`` (metastore-tracked).

Both are exercised in tests/test_sinks.py, including the
exchange-elimination claim (no Exchange node in a bucketed-join plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                fmt: str = "parquet",
                partition_by: list[str] | None = None) -> None:
    """Overwrite/append a (optionally directory-partitioned) table.

    mode='overwrite' ≙ reference K1/K2 (WRITE_TRUNCATE); mode='append' ≙
    K3, the event-driven accumulate. Dynamic partition overwrite is left
    to the session conf (spark.sql.sources.partitionOverwriteMode).
    """
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_cols: list[str],
                         n_buckets: int, mode: str = "overwrite",
                         sort_cols: list[str] | None = None) -> None:
    """Hash-bucketed (and optionally sorted) metastore table: each bucket
    file holds one hash slice of ``bucket_cols``, so a join or groupBy on
    those columns reads co-located buckets and plans NO exchange."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
