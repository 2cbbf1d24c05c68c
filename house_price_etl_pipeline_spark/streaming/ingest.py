"""Structured-Streaming file ingest — the idiomatic replacement for the
reference's event-driven plumbing (SURVEY §2.8 T1/T2, §3.3).

The reference needs three components to process a newly-landed file: a
GCS Finalize trigger, a Cloud Function issuing a Dataflow REST launch
(`cloud_function/main.py:4-37`), and a templated pipeline with a runtime
ValueProvider (`etl_pipeline_beam_auto.py:13-30`). Spark's file source
subsumes all of it: directory listing discovers new files, the checkpoint
gives exactly-once per-file processing, ``pathGlobFilter`` is the suffix
filter (`cloud_function/main.py:8`), and ``Trigger.AvailableNow`` drains
everything pending then stops — re-run on a schedule or keep a continuous
query for true streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.etl import clean_building_transactions

# All-string schema matching the raw house CSV header (streaming sources
# require an explicit schema — no inference on a stream).
RAW_HOUSE_SCHEMA = T.StructType([
    T.StructField(name, T.StringType())
    for name in (
        "鄉鎮市區", "交易標的", "土地位置建物門牌", "土地移轉總面積平方公尺",
        "建物移轉總面積平方公尺", "建築完成年月", "交易年月日", "總價元",
        "單價元平方公尺",
    )
])


def stream_house_csv(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming scan of a landing directory of raw house CSVs.

    ``pathGlobFilter='*a.csv'`` replicates the Cloud Function's suffix
    predicate (reference cloud_function/main.py:8); the embedded English
    header row and BOM handling match sources/csv_house.py.
    """
    raw = (
        spark.readStream.schema(RAW_HOUSE_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "*a.csv")
        .csv(src_dir)
    )
    raw = raw.withColumn("檔名", F.input_file_name())
    return raw.filter(F.col("交易標的") != "transaction sign")


def run_ingest_available_now(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all pending files through the building-transactions pipeline
    into an APPEND parquet sink (reference K3 semantics,
    etl_pipeline_beam_auto.py:174-181), then stop. The checkpoint makes
    re-runs incremental: already-seen files are never reprocessed —
    exactly-once without the reference's external trigger machinery."""
    cleaned = clean_building_transactions(stream_house_csv(spark, src_dir))
    q = (
        cleaned.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_foreach_batch(stream_df, spark, target_dir: str,
                                checkpoint_dir: str, key_cols: list[str],
                                order_col: str):
    """Streaming upsert sink via foreachBatch: each micro-batch is merged
    into a parquet-backed table keeping the latest row per key (CDC
    compaction — SURVEY K3's append sink upgraded to upsert semantics,
    which no built-in file sink offers).

    Inside foreachBatch the batch DataFrame is a normal batch frame: we
    union it with the current target, keep the winner per key via a
    deterministic row_number over (order_col DESC), and atomically swap
    the target. At scale the overwrite becomes partition-overwrite-
    dynamic on the key's partition column; semantics are identical.
    Exactly-once: foreachBatch re-runs a failed batch with the same
    batch_id against the already-committed target — the merge is
    idempotent because keep-latest of an already-merged batch is a
    no-op."""
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def merge_batch(batch_df, batch_id: int) -> None:
        if os.path.isdir(target_dir):
            current = batch_df.sparkSession.read.parquet(target_dir)
            merged = current.unionByName(batch_df)
        else:
            merged = batch_df
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        winners = (merged.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
        tmp = target_dir + f"_staging_{batch_id}"
        winners.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target_dir):
            shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)

    return (stream_df.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
