"""Custom connector via the Python DataSource API (Spark 4).

The reference's ingest edge is bespoke plumbing — a Selenium crawler
plus a Cloud Function relaunching Dataflow per file (SURVEY §2.1 S2-S4,
§2.8 T1). In Spark the extension point for "a source the engine doesn't
ship" is the DataSource API; this module exercises it end-to-end with a
deterministic synthetic-events generator source:

- **partition planning**: the driver plans N contiguous id-range
  `InputPartition`s; each executor generates ONLY its range — no driver
  -side data, no coordination, embarrassingly parallel (the property any
  scalable source must have);
- **Arrow batch reads**: `read()` yields pyarrow RecordBatches built
  from vectorized numpy arithmetic — the columnar fast path (one Arrow
  batch per ~64k rows beats row-tuple yields by an order of magnitude);
- **determinism**: every column is a pure integer-mixing function of the
  row id (no RNG state), so the SAME rows appear for any partition
  count, any executor placement, any retry — and a SQL oracle can
  replicate the generator exactly (the catalog entry is value-hash
  checked like any table-backed query, rare for a custom connector).

Spark's own `rate`/`range` sources follow the same recipe; this is the
batch, schema-rich version with options (`rows`, `partitions`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..plans.catalog import register

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

# Integer-mixing constants (Knuth multiplicative hashing). Any engine can
# replay these with plain BIGINT arithmetic.
_USER_MIX = 2654435761
_TYPE_MIX = 40503
_VALUE_MIX = 1103515245
_TS_STEP_S = 37
_TS_SPAN_S = 30 * 86400


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "4")))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _IdRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IdRange):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        user_id = (ids * _USER_MIX) % 150
        type_idx = (ids * _TYPE_MIX) % len(EVENT_TYPES)
        ts_s = (ids * _TS_STEP_S) % _TS_SPAN_S
        value = ((ids * _VALUE_MIX + 12345) % 1000) / 10.0
        types = np.asarray(EVENT_TYPES, dtype=object)[type_idx]
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(ts_s), pa.array(user_id),
             pa.array(types, type=pa.string()), pa.array(value)],
            names=["event_id", "ts_s", "user_id", "event_type", "value"],
        )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, ts_s bigint, user_id bigint, "
                "event_type string, value double")

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


def read_synthetic_events(spark: SparkSession, rows: int = 10000,
                          partitions: int = 8) -> DataFrame:
    register_synthetic_source(spark)
    return (spark.read.format("synthetic_events")
            .option("rows", str(rows)).option("partitions", str(partitions))
            .load())


@register(
    "pysource_synthetic_events",
    oracle=f"""
    WITH gen AS (
      SELECT i AS event_id,
             (i * {_USER_MIX}) % 150 AS user_id,
             (i * {_TYPE_MIX}) % 5 AS type_idx,
             CAST(((i * {_VALUE_MIX} + 12345) % 1000) / 10.0 AS DOUBLE) AS value
      FROM (SELECT unnest(range(0, 10000)) AS i)
    )
    SELECT (['click', 'view', 'purchase', 'signup', 'error'])[type_idx + 1]
             AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM gen GROUP BY 1 ORDER BY 1
    """,
)
def pysource_synthetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python data source. The oracle replays
    the generator's integer-mixing formulas in SQL — a custom connector
    under the same value-hash gate as every parquet-backed query."""
    ev = read_synthetic_events(spark, rows=10000, partitions=8)
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
             .alias("sum_value"))
        .orderBy("event_type")
    )


# --- writer side: two-phase-commit JSON-lines sink -------------------------

class _ShardCommit:
    """Picklable commit message: staged shard path + row count."""

    def __init__(self, shard: str, n_rows: int):
        self.shard, self.n_rows = shard, n_rows


class JsonAuditWriter:
    """Per-partition JSON-lines shards with two-phase commit: executors
    write to a staging name and report a commit message; only the driver
    -side commit() renames shards into place and publishes a _MANIFEST
    with per-shard row counts. A failed/speculative task's shard is
    never visible (abort() deletes staging) — the exactly-once recipe
    every distributed sink follows (same contract as Spark's own
    HadoopMapReduceCommitProtocol)."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(shard, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ShardCommit(shard, n)

    def commit(self, messages):
        import json
        import os

        manifest = {}
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.rename(m.shard, final)
            manifest[os.path.basename(final)] = m.n_rows
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.shard):
                os.remove(m.shard)


try:  # writer base classes exist on Spark >= 4.0 only
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _ShardCommitMsg(_ShardCommit, WriterCommitMessage):
        pass

    class _JsonAuditDataSourceWriter(JsonAuditWriter, DataSourceWriter):
        def write(self, iterator):
            base = JsonAuditWriter.write(self, iterator)
            return _ShardCommitMsg(base.shard, base.n_rows)

    class JsonAuditDataSource(DataSource):
        """`jsonaudit` format: writer-side twin of `synthetic_events`."""

        @classmethod
        def name(cls) -> str:
            return "jsonaudit"

        def writer(self, schema, overwrite: bool):
            return _JsonAuditDataSourceWriter(self.options, overwrite)

    def register_jsonaudit_sink(spark: SparkSession) -> None:
        spark.dataSource.register(JsonAuditDataSource)
except ImportError:  # pragma: no cover
    def register_jsonaudit_sink(spark: SparkSession) -> None:
        raise NotImplementedError("Python DataSource writer needs Spark >= 4.0")
