"""NULL-robustness parity audit (round 9).

The synthetic testdata never emits NULL or empty text, so Spark/DuckDB
NULL-semantics divergences in the documents-table queries stay latent
until a real corpus hits them (round-8 ADVICE found exactly one, in
BM25: Spark's size(split(NULL)) = -1 vs DuckDB's NULL-skipping AVG).
A 100 TB corpus WILL contain NULL and empty documents, so this module
re-runs every documents-table oracled query against a NULL-augmented
replica of the sf0.001 corpus and demands the same row-count + schema +
order-insensitive value parity as the driver gate.

Classic traps this catches:
- ``x NOT IN (subquery)`` oracles: one NULL in the subquery makes the
  predicate never-true in SQL, while a Spark left_anti join on the same
  key keeps every probe row — silent full-corpus divergence.
- ``size(split(NULL))`` = -1 in Spark feeding averages/filters vs
  DuckDB's NULL-propagating ``len(string_split(NULL))``.
- Python kernels (mapInPandas/applyInPandas) crashing outright on None
  cells the JVM expressions would have carried through.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from house_price_etl_pipeline_spark.plans.catalog import REGISTRY, load_all
from tests.test_oracle_parity import _assert_parity

load_all()

DOC_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "documents" in q.oracle
)

# Augmentation rows: NULL text, empty text, and a NULL-lang doc. Ids are
# far outside the generator's range and chosen so none is a benchmark
# member (doc_id % 97 != 0) — benchmark-side NULLs are exercised
# separately where a query's semantics make that case meaningful.
AUGMENT_ROWS = [
    (900001, None, "en", "web", 0),
    (900002, "", "en", "web", 0),
    (900005, None, None, "books", None),
]


@pytest.fixture(scope="session")
def null_corpus_dir(spark, tmp_path_factory) -> str:
    sf001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                           "/root/testdata/sf0.001")
    base = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    extra = spark.createDataFrame(
        AUGMENT_ROWS,
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = str(tmp_path_factory.mktemp("null_corpus"))
    base.unionByName(extra).coalesce(1).write.parquet(
        os.path.join(out, "documents.parquet"))
    # queries joining documents against other tables still need them
    for name in ("embeddings",):
        src = os.path.join(sf001, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out, f"{name}.parquet"))
    return out


@pytest.fixture(scope="session")
def null_duck(null_corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{null_corpus_dir}/documents.parquet/*.parquet')")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{null_corpus_dir}/embeddings.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_null_corpus_parity(name, spark, null_duck, null_corpus_dir):
    _assert_parity(name, spark, null_duck, null_corpus_dir)


EMB_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "embeddings" in q.oracle
)

# NULL embedding (undecodable vector) and NULL label (unlabeled vector).
# Vectors keep the corpus dim (64) — ragged dims are a generator bug,
# not a NULL-semantics case.
EMB_AUGMENT_ROWS = [
    (900001, None, 3),
    (900002, [0.25] * 64, None),
]


@pytest.fixture(scope="session")
def null_emb_dir(spark, tmp_path_factory) -> str:
    sf001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                           "/root/testdata/sf0.001")
    base = spark.read.parquet(os.path.join(sf001, "embeddings.parquet"))
    extra = spark.createDataFrame(
        EMB_AUGMENT_ROWS,
        "vec_id long, embedding array<float>, label int")
    out = str(tmp_path_factory.mktemp("null_embeddings"))
    base.unionByName(extra).coalesce(1).write.parquet(
        os.path.join(out, "embeddings.parquet"))
    for name in ("documents",):
        src = os.path.join(sf001, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out, f"{name}.parquet"))
    return out


@pytest.fixture(scope="session")
def null_emb_duck(null_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{null_emb_dir}/embeddings.parquet/*.parquet')")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{null_emb_dir}/documents.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_null_embedding_parity(name, spark, null_emb_duck, null_emb_dir):
    _assert_parity(name, spark, null_emb_duck, null_emb_dir)


EVENT_QUERIES = sorted(
    n for n, q in REGISTRY.items() if q.oracle and "FROM events" in q.oracle
)

# NULL value + NULL props; malformed JSON props; NULL event_type with a
# props doc missing the extracted key. ts / event_id / user_id stay
# non-NULL: event time is the streaming watermark column and the
# engine's documented ingestion contract (like every Structured
# Streaming pipeline's) is that event time is present — NULL-ts repair
# belongs at the source, not in every operator.
EVENT_AUGMENT_ROWS = [
    (9000001, "2024-01-15 12:00:00", 3, "click", None, None),
    (9000002, "2024-01-15 12:05:00", 4, "view", 1.5, "{not valid json"),
    (9000003, "2024-01-15 12:10:00", 5, None, 2.0, "{}"),
    # NULL-value event OUTSIDE user 6's existing ts range: a resample
    # grid whose bounds ignore NULL-value events would shrink vs the
    # oracle's (review r9 — the in-range NULL above dodged it)
    (9000004, "2024-02-05 00:00:00", 6, "view", None, '{"k": 5}'),
    # a user (< 20, not in the generated data) whose ONLY event has a
    # NULL value: the grid must still exist, filled with NULLs
    (9000005, "2024-02-06 00:00:00", 19, "click", None, "{}"),
]


@pytest.fixture(scope="session")
def null_events_dir(spark, tmp_path_factory) -> str:
    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.sources.tables import load_table

    sf001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                           "/root/testdata/sf0.001")
    # through load_table so ts lands as µs on both engines (the raw
    # file is TIMESTAMP(NANOS), which Spark's writer can't round-trip)
    base = load_table(spark, sf001, "events")
    extra = spark.createDataFrame(
        EVENT_AUGMENT_ROWS,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path_factory.mktemp("null_events"))
    base.unionByName(extra).coalesce(1).write.parquet(
        os.path.join(out, "events.parquet"))
    for name in ("customer", "orders", "lineitem", "nation", "region",
                 "supplier", "part", "documents", "embeddings"):
        src = os.path.join(sf001, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out, f"{name}.parquet"))
    return out


@pytest.fixture(scope="session")
def null_events_duck(null_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{null_events_dir}/events.parquet/*.parquet')")
    for name in ("customer", "orders", "lineitem", "nation", "region",
                 "supplier", "part", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet("
            f"'{null_events_dir}/{name}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_null_events_parity(name, spark, null_events_duck,
                            null_events_dir):
    _assert_parity(name, spark, null_events_duck, null_events_dir)


# --- media/binary boundary (VERDICT r9 item 7) -----------------------------
#
# The mm_* catalog queries derive payloads from documents.text, so the
# NULL-corpus parity above already exercises NULL text through them.
# These cases feed NULL BINARY cells straight into the operator-level
# media kernels — the Arrow-crash class (bytes(None) / np.frombuffer
# (None) / FromString(None)) the r9 audit fixed for vectors: every
# kernel must drop NULL payloads JVM-side, never ship None to Python.

MM_DOC_QUERIES = sorted(n for n in DOC_QUERIES if n.startswith("mm_"))


@pytest.mark.parametrize("name", MM_DOC_QUERIES)
def test_null_corpus_parity_media_queries(name, spark, null_duck,
                                          null_corpus_dir):
    """The mm_* catalog queries stay oracle-green on the NULL-augmented
    corpus (subset of the full audit, named so a media regression is
    identifiable at a glance)."""
    _assert_parity(name, spark, null_duck, null_corpus_dir)


@pytest.fixture()
def null_media(spark):
    """Media frame with NULL payloads mixed among real blobs."""
    return spark.createDataFrame(
        [(1, b"hello world, this is media payload one"),
         (2, None),
         (3, b"x" * 300),
         (4, None)],
        "doc_id long, payload binary")


def test_media_kernels_drop_null_payloads(spark, null_media):
    from house_price_etl_pipeline_spark.operators.multimodal import (
        decode_bmp_features, decode_png_features, decode_wav_features,
        resize_media, sample_frames, wrap_media)

    for codec, decoder in (("bmp", decode_bmp_features),
                           ("wav", decode_wav_features),
                           ("png", decode_png_features)):
        wrapped = wrap_media(null_media, codec)
        assert sorted(r.doc_id for r in wrapped.select("doc_id")
                      .collect()) == [1, 3], codec
        decoded = decoder(wrapped)
        assert sorted(r.doc_id for r in decoded.select("doc_id")
                      .collect()) == [1, 3], codec
        # NULL straight into the decoder (no wrap_media in front) must
        # also drop, not crash the Arrow kernel — but the surviving
        # blobs are not valid containers here, so only assert the
        # JVM-side filter by decoding a frame that is ALL NULL
        empty = decoder(null_media.filter("doc_id IN (2, 4)"))
        assert empty.count() == 0, codec
    r = resize_media(null_media)
    assert sorted(x.doc_id for x in r.select("doc_id").collect()) == [1, 3]
    f = sample_frames(null_media)
    assert sorted(set(x.doc_id for x in f.select("doc_id")
                      .collect())) == [3]    # only doc 3 has a full frame


def test_protobuf_decode_drops_null_payloads(spark):
    from house_price_etl_pipeline_spark.operators.multimodal import (
        decode_doc_protobuf, encode_doc_protobuf)

    docs = spark.createDataFrame(
        [(1, "hello there", "en", 11), (2, None, None, None)],
        "doc_id long, text string, lang string, n_chars long")
    enc = encode_doc_protobuf(docs)
    # encoding maps NULL cells to proto3 defaults — both rows encode
    assert enc.count() == 2
    # inject a NULL wire payload (a corrupt/absent blob upstream)
    withnull = enc.unionByName(spark.createDataFrame(
        [(3, None)], "doc_id long, payload binary"))
    dec = decode_doc_protobuf(withnull)
    got = {r.doc_id: (r.lang, r.n_chars, r.tokens) for r in dec.collect()}
    assert got == {1: ("en", 11, 2), 2: ("", 0, 0)}
