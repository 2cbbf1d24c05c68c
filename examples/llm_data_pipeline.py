"""End-to-end LLM training-data pipeline on this engine.

Runnable (``python examples/llm_data_pipeline.py [sf_dir]``): chains the
north-star operator families over the driver testdata the way a real
corpus build runs them, printing the accounting at each stage:

  1. exact dedup           → drop byte-identical documents
  2. near-dup dedup        → MinHash+LSH candidates, exact verify,
                             connected components, keep cluster minima
  3. decontamination       → drop docs matching the eval-suite
                             fingerprints (exact) and report n-gram
                             containment suspects (fuzzy)
  4. quality + language    → per-doc scores the selection step uses
  5. train/val split       → deterministic md5 hash split (survives
                             repartition / re-run / engine swap)
  6. tokenize → pack       → vocab, id-encoding, context-window packing
                             manifest (from lengths alone)

Every stage is the same code path as the oracle-checked catalog entry
it demonstrates — this file only sequences them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.corpus import (
    BENCH_MOD, corpus_decontaminate_exact, corpus_containment_topk)
from house_price_etl_pipeline_spark.operators.dedup import (
    dedup_corpus_after_neardup, dedup_exact_count)
from house_price_etl_pipeline_spark.operators.packing import (
    text_pack_sequences, text_vocab_build)
from house_price_etl_pipeline_spark.operators.sampling import (
    sample_train_val_split)
from house_price_etl_pipeline_spark.operators.text import (
    text_language_id, text_quality_score)
from house_price_etl_pipeline_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(cores=8)

    print("== 1. exact dedup ==")
    dedup_exact_count(spark, sf_dir).show()

    print("== 2. near-dup dedup (MinHash+LSH -> verify -> components) ==")
    dedup_corpus_after_neardup(spark, sf_dir).show()

    print(f"== 3. decontamination (eval suite = 1-in-{BENCH_MOD} docs) ==")
    kept = corpus_decontaminate_exact(spark, sf_dir)
    print(f"   kept after exact decontamination: {kept.count()}")
    print("   top containment suspects (fuzzy overlap with the bench):")
    corpus_containment_topk(spark, sf_dir).show(5)

    print("== 4. quality + language scoring ==")
    text_quality_score(spark, sf_dir).show(5)
    text_language_id(spark, sf_dir).groupBy("pred_lang").count().show()

    print("== 5. deterministic train/val split ==")
    (sample_train_val_split(spark, sf_dir)
     .groupBy("split").agg(F.count("*").alias("n_docs")).orderBy("split")
     .show())

    print("== 6. tokenize -> vocab -> pack ==")
    print("   top vocab entries:")
    text_vocab_build(spark, sf_dir).show(5)
    print("   packing manifest (context windows from lengths alone):")
    text_pack_sequences(spark, sf_dir).show(5)

    print("== 7. export: protobuf records in TFRecord shards ==")
    # the delivery format a training job consumes: each doc serialized
    # as a protobuf record, shards framed with CRC-checked TFRecord
    # framing, one .tfrecord file per bucket
    import tempfile

    from house_price_etl_pipeline_spark.operators.multimodal import (
        encode_doc_protobuf, tfrecord_pack, tfrecord_unpack)
    from house_price_etl_pipeline_spark.sources.tables import load_table

    out_dir = tempfile.mkdtemp(prefix="tfrecord_export_")
    docs = load_table(spark, sf_dir, "documents")
    shards = (encode_doc_protobuf(docs)
              .withColumn("bucket", F.col("doc_id") % 8))
    for row in (shards.groupBy("bucket")
                .agg(F.sort_array(F.collect_list(
                    F.struct("doc_id", "payload"))).alias("recs"))
                .collect()):
        path = os.path.join(out_dir, f"part-{row.bucket:05d}.tfrecord")
        with open(path, "wb") as f:
            f.write(tfrecord_pack([bytes(r.payload) for r in row.recs]))
    n_files = len(os.listdir(out_dir))
    n_records = sum(
        len(tfrecord_unpack(open(os.path.join(out_dir, p), "rb").read()))
        for p in os.listdir(out_dir))
    print(f"   wrote {n_files} .tfrecord shards, {n_records} records "
          f"(checksums verified on read-back) -> {out_dir}")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
