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


@register(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) % 640 + 1 AS INTEGER) AS width,
           CAST(length(text) % 480 + 1 AS INTEGER) AS height,
           concat_ws(',',
             CAST(length(text) AS VARCHAR),
             CAST(ascii(substring(text, 1, 1)) AS VARCHAR),
             CAST(ascii(substring(text, length(text), 1)) AS VARCHAR),
             CAST(list_sum(list_transform(
                    range(1, LEAST(length(text), 16) + 1),
                    i -> ascii(substring(text, i, 1)))) % 256 AS VARCHAR)
           ) AS feature_csv
    FROM documents ORDER BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub over the media table, under the value-hash gate: the
    deterministic fake kernel's features are pure byte arithmetic
    (length, first/last byte, capped prefix sum), which DuckDB replays
    as character arithmetic — valid because the corpus is ASCII and
    non-empty (verified: octet_length == length for every doc at every
    SF). The mapInPandas plumbing (Arrow batches, schema, 1→1 rows) is
    exactly what a real PIL/ffmpeg kernel would ride; the oracle now
    hash-checks its output end-to-end. Integral-valued features
    CSV-serialize exactly (catalog outputs are scalar-only)."""
    return (
        decode_media(media_table(spark, sf_dir))
        .select(
            "doc_id", "n_bytes", "width", "height",
            F.concat_ws(",", F.transform(
                "feature", lambda x: x.cast("bigint").cast("string"))
            ).alias("feature_csv"),
        )
        .orderBy("doc_id")
    )


# --- resize + frame-sample (the other two brief-listed media kernels) ------

RESIZE_W, RESIZE_H = 64, 64            # fake "image" target: 4096 bytes
FRAME_BYTES, FRAME_STRIDE = 256, 4     # fake "video": 256-byte frames, keep every 4th

RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("was_padded", T.BooleanType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def resize_media(media: DataFrame, w: int = RESIZE_W,
                 h: int = RESIZE_H) -> DataFrame:
    """'Resize' every payload to exactly w*h bytes (truncate or
    zero-pad) — the stub stand-in for an interpolating image resize,
    with the real kernel's plumbing: 1→1 rows through mapInPandas, new
    binary payload out, metadata recomputed. A real implementation
    swaps the body for PIL/cv2 over the same batch iterator."""
    target = w * h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            p = pdf["payload"]
            resized = p.map(lambda b: bytes(b[:target]).ljust(target, b"\0"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": resized,
                "width": w, "height": h,
                "n_bytes": target,
                "was_padded": p.map(len) < target,
            })

    return media.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling: treat each payload as a sequence of fixed-size
    frames and keep every ``stride``-th full frame — the 1→N batch shape
    (one output row per sampled frame) a video pipeline needs; a real
    kernel decodes via ffmpeg instead of slicing bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(b) // frame_bytes, stride):
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(b[i*frame_bytes:(i+1)*frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": out_id,
                 "frame_idx": pd.array(out_idx, dtype="int32"),
                 "frame": out_frame})

    return media.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


@register(
    "mm_resize_pad_stats",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM({RESIZE_W * RESIZE_H}) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN strlen(text) < {RESIZE_W * RESIZE_H}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_padded
    FROM documents
    """,
)
def mm_resize_pad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel under the value-hash gate: the fake resize's byte
    arithmetic (truncate-or-pad to w*h) is replayed by the oracle from
    strlen(text) — the Python batch path must agree exactly."""
    r = resize_media(media_table(spark, sf_dir))
    return r.agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload").cast("long")).alias("total_bytes"),
        F.sum(F.when(F.col("was_padded"), 1).otherwise(0)).cast("long")
        .alias("n_padded"),
    )


@register(
    "mm_frame_sample_stats",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_with_frames,
           CAST(SUM(CAST((strlen(text) // {FRAME_BYTES} + {FRAME_STRIDE - 1})
                    // {FRAME_STRIDE} AS BIGINT)) AS BIGINT) AS n_frames,
           CAST(SUM(CAST((strlen(text) // {FRAME_BYTES} + {FRAME_STRIDE - 1})
                    // {FRAME_STRIDE} AS BIGINT) * {FRAME_BYTES}) AS BIGINT)
             AS total_frame_bytes
    FROM documents WHERE strlen(text) >= {FRAME_BYTES}
    """,
)
def mm_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample kernel under the value-hash gate: sampled-frame
    counts and bytes per the stride arithmetic, replayed by the oracle
    from strlen(text)."""
    f = sample_frames(media_table(spark, sf_dir))
    return (
        f.groupBy("doc_id").agg(F.count("*").alias("nf"))
        .agg(F.count("*").alias("n_docs_with_frames"),
             F.sum("nf").alias("n_frames"),
             (F.sum("nf") * FRAME_BYTES).alias("total_frame_bytes"))
    )


AUDIO_WIN = 32  # samples per energy window (8-bit PCM reading of payload)


@register(
    "mm_audio_window_energy",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, text,
             CAST(i AS INT) AS widx
      FROM documents,
           UNNEST(generate_series(0, CAST(strlen(text) // {AUDIO_WIN} AS BIGINT) - 1))
             AS s(i)
      WHERE strlen(text) >= {AUDIO_WIN}
    )
    SELECT doc_id, widx,
           list_reduce(
             list_transform(
               generate_series(1, {AUDIO_WIN}),
               j -> (ord(substr(text, widx * {AUDIO_WIN} + j, 1)) - 128.0)
                    * (ord(substr(text, widx * {AUDIO_WIN} + j, 1)) - 128.0)),
             (a, b) -> a + b) AS energy
    FROM w ORDER BY doc_id, widx
    """,
)
def mm_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio kernel under the value-hash gate: the payload read as
    unsigned 8-bit PCM, windowed into AUDIO_WIN-sample frames, per-frame
    energy = Σ (s-128)² — the feature-extraction shape of every audio
    curation pipeline (VAD gating, silence trimming, loudness
    normalization), with the same honest-stub discipline as the image
    kernels: numpy does real byte math in an Arrow-batched mapInPandas
    partition flow, and the oracle replays the identical arithmetic from
    the text bytes (ASCII corpus → ord == byte). Energies are integer
    sums well under 2^53, so float64 equality is exact. Zero shuffle:
    the kernel is a narrow per-partition map; the orderBy exists for the
    deterministic compare."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_widx, out_energy = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.uint8)
                n_win = len(x) // AUDIO_WIN
                if n_win == 0:
                    continue
                frames = (x[:n_win * AUDIO_WIN]
                          .reshape(n_win, AUDIO_WIN).astype(np.float64))
                energy = ((frames - 128.0) ** 2).sum(axis=1)
                out_doc.extend([doc_id] * n_win)
                out_widx.extend(range(n_win))
                out_energy.extend(energy.tolist())
            yield pd.DataFrame({"doc_id": out_doc, "widx": out_widx,
                                "energy": out_energy})

    m = media_table(spark, sf_dir).select("doc_id", "payload")
    return (
        m.mapInPandas(kernel, schema="doc_id long, widx int, energy double")
        .orderBy("doc_id", "widx")
    )
