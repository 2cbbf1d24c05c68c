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

import json

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


def read_upsert_version(spark, target_dir: str,
                        version: int | None = None) -> DataFrame:
    """Time-travel read of a versioned upsert target (the mini table
    format ``stream_upsert_foreach_batch`` maintains): ``version=None``
    reads the published snapshot through the target symlink;
    ``version=N`` reads the journaled snapshot ``v{N}`` if still
    retained (see ``keep_versions``). The pointer journal lists every
    applied batch id; retained version dirs are the readable subset —
    exactly the Delta/Iceberg time-travel contract scaled down to plain
    parquet + a JSON pointer."""
    import os

    if version is None:
        return spark.read.parquet(target_dir)
    vdir = os.path.join(target_dir + "_versions", f"v{version}")
    if not os.path.isdir(vdir):
        with open(os.path.join(target_dir + "_versions", "_POINTER.json")) as f:
            ptr = json.load(f)
        retained = sorted(
            int(n[1:]) for n in os.listdir(target_dir + "_versions")
            if n.startswith("v"))
        raise FileNotFoundError(
            f"version {version} not retained (applied={ptr['applied']}, "
            f"retained={retained}); raise keep_versions to retain more")
    return spark.read.parquet(vdir)


def stream_upsert_foreach_batch(stream_df, spark, target_dir: str,
                                checkpoint_dir: str, key_cols: list[str],
                                order_col: str, keep_versions: int = 2):
    """Streaming keep-latest-per-key upsert sink via foreachBatch (CDC
    compaction — SURVEY K3's append sink upgraded to upsert semantics,
    which no built-in file sink offers), on the same versioned-snapshot +
    atomic-pointer-flip mechanism as ``streaming.foreach.upsert_batch``:

    - each micro-batch is first reduced to its per-key winners (a
      batch-sized window, cheap), then merged with the current snapshot —
      keep-latest is a monoid, so the merge is ONE hash shuffle over
      snapshot ∪ delta, and the snapshot is bounded by KEY cardinality,
      not stream length (the former implementation's full
      read-union-overwrite per batch was O(total data) with a non-atomic
      rmtree+rename swap — VERDICT r3 item 2);
    - the merged snapshot is written as a NEW ``v{batch_id}`` directory
      under ``<target>_versions`` and published by atomically re-pointing
      a ``target_dir`` symlink at it (fsutil.atomic_symlink_swap), so
      ``spark.read.parquet(target_dir)`` always sees one complete
      snapshot — a crash mid-write never corrupts the readable table;
    - replays are exactly-once: applied batch ids are journaled in an
      atomically-written pointer file AFTER the flip; a re-delivered
      batch id is a no-op, and the crash window between flip and journal
      is closed by detecting that the current snapshot already is
      ``v{batch_id}``.

    At cluster scale the same contract comes from a transactional table
    format (Delta/Iceberg MERGE) or partition-overwrite-dynamic keyed on
    the batch's touched partitions; this is the plain-parquet analog."""
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..fsutil import atomic_symlink_swap, atomic_write_json

    versions_root = target_dir + "_versions"
    pointer = os.path.join(versions_root, "_POINTER.json")

    def load_pointer() -> dict:
        if os.path.exists(pointer):
            with open(pointer) as f:
                return json.load(f)
        return {"version": None, "applied": []}

    def keep_latest(df):
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))

    def merge_batch(batch_df, batch_id: int) -> None:
        ptr = load_pointer()
        if batch_id in ptr["applied"]:  # replayed batch: exactly-once no-op
            return
        vdir = os.path.join(versions_root, f"v{batch_id}")
        current = os.path.realpath(target_dir) if os.path.islink(target_dir) else None
        if os.path.isdir(vdir) and current == os.path.realpath(vdir):
            # crash landed between symlink flip and pointer journal:
            # the merge already published — just complete the journal
            atomic_write_json(pointer, {
                "version": batch_id,
                "applied": sorted(ptr["applied"] + [batch_id])})
            return
        if os.path.isdir(vdir):  # half-written version dir from a crash
            shutil.rmtree(vdir)
        delta = keep_latest(batch_df)
        if current is not None:
            snapshot = batch_df.sparkSession.read.parquet(current)
            merged = keep_latest(snapshot.unionByName(delta))
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(vdir)
        atomic_symlink_swap(target_dir, vdir)
        atomic_write_json(pointer, {
            "version": batch_id,
            "applied": sorted(ptr["applied"] + [batch_id])})
        # retention: the newest `keep_versions` snapshots stay (the
        # published one, in-flight readers' prior one, and any further
        # time-travel depth the caller asked for via keep_versions /
        # read_upsert_version); older versions go
        vdirs = sorted((n for n in os.listdir(versions_root)
                        if n.startswith("v")), key=lambda n: int(n[1:]))
        for name in vdirs[:-max(keep_versions, 1)]:
            shutil.rmtree(os.path.join(versions_root, name),
                          ignore_errors=True)

    return (stream_df.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
