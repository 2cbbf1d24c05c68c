"""SparkSession factory.

Single place where execution-relevant configuration lives, so local tests
and the driver's bench run exercise the same settings we would ship on a
real cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  the 100 TB safety net for skewed keys and mis-estimated shuffles.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this would be ~2-3x total executor cores (AQE coalesces down).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive/UTC timestamps) byte-for-byte.
- Arrow enabled for the few Pandas-UDF code paths (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "house_price_etl_pipeline_spark",
              cores: int | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    n = cores if cores is not None else default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.maxMetadataStringLength", "2000")  # full plan strings
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Perf debugging: SPARK_GRAFT_EVENTLOG=/some/dir enables the event
    # log so a bench run can be post-mortemed job-by-job (driver gaps vs
    # task time) with the history server or a JSON parse.
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        # plain single-file JSONL (no rolling dir, no zstd) so offline
        # parsers (scripts/scale_probe.py) can read it with stdlib only
        builder = (builder.config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.dir", ev_dir)
                   .config("spark.eventLog.compress", "false")
                   .config("spark.eventLog.rolling.enabled", "false"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-created session.

    The driver passes us its own SparkSession in ``entry()``/``queries()``;
    we cannot rebuild it, but timezone + AQE + shuffle sizing are runtime
    settable and required for oracle parity and sane local plans.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
        conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static configs on some builds; non-fatal
    return spark
