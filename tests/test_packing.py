"""Tokenize→vocab→encode→pack chain invariants (operators/packing.py).
Oracle parity checks values; these pin the packing contract itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.packing import (
    CONTEXT_LEN,
    text_encode_ids,
    text_pack_sequences,
    vocab,
)
from house_price_etl_pipeline_spark.sources.tables import load_table


def test_every_chunk_full_except_last(spark, sf_dir):
    chunks = text_pack_sequences(spark, sf_dir).collect()
    assert len(chunks) > 1
    *full, last = chunks
    assert all(c.n_tokens == CONTEXT_LEN for c in full)
    assert 0 < last.n_tokens <= CONTEXT_LEN
    assert [c.chunk_id for c in chunks] == list(range(len(chunks)))  # gapless


def test_packing_conserves_tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_tokens = d.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    packed = text_pack_sequences(spark, sf_dir)
    assert packed.agg(F.sum("n_tokens")).first()[0] == n_tokens


def test_encode_round_trips_through_vocab(spark, sf_dir):
    """Decoding the id sequences (CSV-serialized — catalog outputs are
    scalar-only) through the inverted vocab must reproduce the original
    text for every encoded doc."""
    v = {r.token_id: r.token for r in vocab(spark, sf_dir).collect()}
    enc = {r.doc_id: [int(i) for i in r.ids.split(",")]
           for r in text_encode_ids(spark, sf_dir).collect()}
    docs = dict(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300).select("doc_id", "text").collect())
    assert set(enc) == set(docs)
    for doc_id, ids in enc.items():
        assert " ".join(v[i] for i in ids) == docs[doc_id]
