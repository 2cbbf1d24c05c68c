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

from ..functions.numeric import dec_sum_expr
from ..plans.catalog import register


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


# --- external-warehouse (JDBC) sink exemplar --------------------------------
#
# The reference's only sink is an external warehouse: BigQuery with
# WRITE_TRUNCATE (etl_pipeline_spark.py:86-89) and a schema-declared
# truncate/append Beam sink (etl_pipeline_beam.py:165-171). The engine-
# portable analog is Spark's JDBC DataSource — same three semantics
# (declared schema, overwrite/truncate, append), exercised end-to-end
# against Derby (embedded, ships in Spark's JVM classpath) in
# tests/test_sinks.py and the `sink_jdbc_roundtrip` catalog query.
# Swapping Derby for Postgres/Redshift/BigQuery-via-JDBC is a URL+driver
# change; none of the call sites change.

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC URL (auto-creates the database directory)."""
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc_table(df: DataFrame, url: str, table: str,
                     mode: str = "overwrite", truncate: bool = False,
                     schema_ddl: str | None = None,
                     driver: str | None = None,
                     batch_size: int = 10_000) -> None:
    """Write to an external warehouse table over JDBC.

    Mode semantics, mirroring the reference's BigQuery dispositions:
    - ``mode='overwrite', truncate=True`` ≙ WRITE_TRUNCATE: ``TRUNCATE
      TABLE`` then insert — the table's schema/grants/indexes survive;
    - ``mode='overwrite', truncate=False`` ≙ CREATE_IF_NEEDED +
      replace: drop and re-create, with ``schema_ddl`` (a
      ``col TYPE, ...`` fragment → ``createTableColumnTypes``)
      declaring warehouse-side column types explicitly — the analog of
      the Beam sink's declared schema (etl_pipeline_beam.py:154-161);
    - ``mode='append'`` ≙ WRITE_APPEND (the event-driven path).

    ``batch_size`` maps to JDBC ``batchsize``: rows per executor-side
    INSERT batch — each Spark partition writes through its own
    connection, so the write parallelism IS the partition count (at
    scale: coalesce to what the warehouse tolerates)."""
    w = (df.write.format("jdbc")
         .option("url", url)
         .option("dbtable", table)
         .option("batchsize", str(batch_size))
         .mode(mode))
    if driver:
        w = w.option("driver", driver)
    if truncate:
        w = w.option("truncate", "true")
    if schema_ddl:
        w = w.option("createTableColumnTypes", schema_ddl)
    w.save()


def read_jdbc_table(spark: SparkSession, url: str, table: str,
                    driver: str | None = None,
                    partition_column: str | None = None,
                    lower_bound=None, upper_bound=None,
                    num_partitions: int | None = None) -> DataFrame:
    """Read an external table over JDBC. With ``partition_column`` +
    bounds + ``num_partitions`` the scan is split into range predicates
    executed in parallel (one connection per partition) — without them a
    JDBC read is a single-task scan, which is the #1 scale trap of
    warehouse ingestion."""
    r = (spark.read.format("jdbc")
         .option("url", url)
         .option("dbtable", table))
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound))
             .option("numPartitions", str(num_partitions or 4)))
    return r.load()


@register(
    "sink_jdbc_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dec_sum_expr('o_totalprice')} AS sum_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sink_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-warehouse round-trip under the value-hash gate: aggregate
    orders, WRITE it to an embedded-Derby warehouse table over JDBC with
    a declared schema (overwrite ≙ the reference's WRITE_TRUNCATE,
    etl_pipeline_spark.py:86-89), then READ the table back as a
    partitioned JDBC scan and return it — so the values the driver
    hashes have physically passed through the external system's types.
    Exactness holds because sum_price is an exact decimal sum emitted as
    DOUBLE on both engines and the warehouse column is declared DOUBLE
    (bit-preserving round-trip)."""
    import os

    from pyspark.sql import functions as F

    from ..functions.numeric import dec_sum
    from .tables import load_table

    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             dec_sum("o_totalprice").alias("sum_price"))
    )
    # Deterministic DB path per (JVM, sf_dir): bench retries re-invoke
    # this query many times — a fresh mkdtemp per call would accumulate
    # orphaned Derby directories AND booted embedded-Derby instances in
    # the JVM. Reuse one database; the overwrite-write makes each
    # invocation's state fresh anyway.
    from ..fsutil import query_workspace
    db_root = query_workspace("jdbc_sink", sf_dir)
    url = derby_url(db_root + "/db")
    write_jdbc_table(agg, url, "order_stats", mode="overwrite",
                     schema_ddl="o_orderstatus VARCHAR(4), "
                                "n_orders BIGINT, sum_price DOUBLE")
    back = read_jdbc_table(spark, url, "order_stats",
                           partition_column="n_orders", lower_bound=0,
                           upper_bound=1 << 40, num_partitions=2)
    return back.orderBy("o_orderstatus")
