"""Persistent, incrementally-maintained LSH band index for ingest-time
near-dup rejection — the production form of ``stream_dedup_ingest``.

``stream_dedup_ingest`` checks arriving docs against a STATIC corpus
index built per run. A real continuously-ingesting pipeline needs the
index to be (a) on storage, partitioned so a bucket probe prunes, and
(b) GROWING: a document that arrived ten minutes ago must already veto
its near-duplicate arriving now. This module maintains exactly that:

- the index is parquet at ``<index_dir>/bands``, one row per
  (band_id, band_hash, doc_id), written in per-batch subdirectories
  (``batch-<id>``) so a replayed micro-batch overwrites its own output
  instead of double-appending — idempotent appends on plain parquet;
- each micro-batch computes per-row band keys for the arriving docs
  (pure JVM expressions — ``joins._rowwise_band_keys``, no shuffle),
  probes the CURRENT index with a bucket equi-join, emits accept/reject
  decisions to ``<index_dir>/decisions/batch-<id>``, and appends the
  ACCEPTED docs' bands to the index — so within-stream duplicates are
  caught from the second batch on;
- candidates within the SAME batch are also checked (self-join on the
  batch's bands), so two near-dups arriving together don't both pass.

At 100 TB the band relation is bucketed by (band_id, band_hash) and the
probe is a storage-pruned point lookup per band; the per-batch subdir
trick is replaced by the table format's transactional append. LSH
candidates here are decisions-by-candidate (no exact verify in the hot
path — verification runs offline, same split as stream_dedup_ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BANDS_SUBDIR = "bands"
DECISIONS_SUBDIR = "decisions"


def _bands_glob(index_dir: str) -> str:
    return os.path.join(index_dir, BANDS_SUBDIR, "batch-*")


def build_band_index(spark: SparkSession, docs: DataFrame,
                     index_dir: str) -> None:
    """Seed the index from an existing corpus (batch): per-row band keys
    → parquet under batch-seed. docs: (doc_id, text)."""
    from .joins import _rowwise_band_keys

    bands = _rowwise_band_keys(
        docs.select("doc_id", F.split("text", " ").alias("ws")))
    bands.write.mode("overwrite").parquet(
        os.path.join(index_dir, BANDS_SUBDIR, "batch-seed"))


def read_band_index(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_bands_glob(index_dir))


def read_decisions(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(
        os.path.join(index_dir, DECISIONS_SUBDIR, "batch-*"))


def run_index_ingest(spark: SparkSession, docs_stream: DataFrame,
                     index_dir: str, checkpoint_dir: str) -> None:
    """Drain the arriving-docs stream through the growing index.

    Per batch: probe (batch bands ⋈ index bands) ∪ (batch self-join on
    band, earlier doc_id wins) → rejected set; decisions written first,
    accepted bands appended second — a crash between the two writes
    replays the batch id and overwrites both (idempotent)."""
    from .joins import _rowwise_band_keys

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        bands = _rowwise_band_keys(
            batch_df.select("doc_id", F.split("text", " ").alias("ws"))
        ).localCheckpoint(eager=True)  # two consumers below

        # Unseeded-index detection is an explicit filesystem check, NOT
        # a bare except around the read: a corrupted parquet or a
        # transient IO error must propagate and fail the batch (the
        # checkpoint replays it) rather than silently running the probe
        # with idx=None and permanently admitting duplicates.
        import glob as _glob
        bands_root = os.path.join(index_dir, BANDS_SUBDIR)
        seeded = os.path.isdir(bands_root) and any(
            _glob.glob(os.path.join(bands_root, "batch-*")))
        idx = sess.read.parquet(_bands_glob(index_dir)) if seeded else None
        matches = []
        if idx is not None:
            matches.append(
                bands.join(idx.withColumnRenamed("doc_id", "matched_doc"),
                           ["band_id", "band_hash"])
                # a replayed batch finds its own accepted bands already
                # in the index — self-matches are not duplicates
                .filter(F.col("matched_doc") != F.col("doc_id"))
                .select("doc_id", "matched_doc"))
        # same-batch twins: earlier (smaller) doc_id wins
        x, y = bands.alias("x"), bands.alias("y")
        matches.append(
            x.join(y, (F.col("x.band_id") == F.col("y.band_id"))
                   & (F.col("x.band_hash") == F.col("y.band_hash"))
                   & (F.col("x.doc_id") > F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_id"),
                    F.col("y.doc_id").alias("matched_doc")))
        all_matches = matches[0]
        for m in matches[1:]:
            all_matches = all_matches.unionByName(m)
        verdicts = (
            batch_df.select("doc_id")
            .join(all_matches.groupBy("doc_id")
                  .agg(F.min("matched_doc").alias("matched_doc")),
                  "doc_id", "left")
            .select("doc_id",
                    F.col("matched_doc").isNotNull().alias("is_dup"),
                    "matched_doc")
            .localCheckpoint(eager=True)
        )
        # decisions first, accepted bands second; both keyed by batch id
        # (overwrite) so a replay is idempotent
        verdicts.write.mode("overwrite").parquet(
            os.path.join(index_dir, DECISIONS_SUBDIR, f"batch-{batch_id}"))
        accepted = verdicts.filter(~F.col("is_dup")).select("doc_id")
        (bands.join(accepted, "doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(index_dir, BANDS_SUBDIR,
                               f"batch-{batch_id}")))

    q = (docs_stream.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
