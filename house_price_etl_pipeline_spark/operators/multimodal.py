"""Multimodal column plumbing (north-star extension, BASELINE.json).

Media (image/audio/video) are opaque ``binary`` payloads with a typed
metadata struct travelling next to them — the schema pattern every
multimodal training pipeline uses. The container has no media libs, so
the *decode* kernel is stubbed (deterministic fake behind
``SPARK_GRAFT_FAKE_DECODE``; real path raises NotImplementedError) while
everything Spark-side — schema, binary handling, Arrow batch shape,
``mapInPandas`` partition flow — is real and tested (tests/test_multimodal.py).

The driver testdata has no binary column, so payloads are derived from
``documents.text`` (UTF-8 bytes): content-addressing (sha256), sizing and
batch plumbing behave identically to real media bytes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.catalog import register
from ..sources.tables import load_table

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct): the canonical
    multimodal layout. sha256 content-addressing enables exact media
    dedup with the same hash-groupBy as text (operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id, 'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata extraction, flattened for the
    oracle (struct columns don't hash portably across engines)."""
    m = media_table(spark, sf_dir)
    return (
        m.select(
            "doc_id",
            F.col("meta.mime").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.sha256").alias("sha256"),
        )
        .orderBy("doc_id")
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch decode kernel. Real media decode needs PIL/ffmpeg — not
    in this container — so it's stubbed: deterministic fake features from
    the payload bytes (same plumbing, schema and batch shape as the real
    thing). Set SPARK_GRAFT_FAKE_DECODE=0 to see the real-path error."""
    if os.environ.get("SPARK_GRAFT_FAKE_DECODE", "1") != "1":
        raise NotImplementedError(
            "real media decode requires PIL/torchvision/ffmpeg (unavailable "
            "in this container); set SPARK_GRAFT_FAKE_DECODE=1 for the "
            "deterministic stub"
        )
    payloads = pdf["payload"]
    n_bytes = payloads.map(len).astype("int64")
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "n_bytes": n_bytes,
        "width": (n_bytes % 640 + 1).astype("int32"),
        "height": (n_bytes % 480 + 1).astype("int32"),
        "feature": [
            [float(len(b)), float(b[0] if len(b) else 0),
             float(b[-1] if len(b) else 0), float(sum(b[:16]) % 256)]
            for b in payloads
        ],
    })


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python worker per partition
    — the correct shape for CPU-bound media kernels at scale (no per-row
    serde; batch size = spark.sql.execution.arrow.maxRecordsPerBatch)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


@register("mm_decode_features")  # Pandas-UDF path → rows-only check
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub over the media table; deterministic fake features so
    the rows-only check is stable round-to-round."""
    return (
        decode_media(media_table(spark, sf_dir))
        .select("doc_id", "n_bytes", "width", "height", "feature")
        .orderBy("doc_id")
    )
