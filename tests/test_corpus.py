"""Corpus-construction operator semantics (operators/corpus.py) that the
oracle-parity check can't pin: the short-doc n-gram guard (Spark's
sequence(1, 0) counts DOWN — the when-guard must yield an empty array,
not [1, 0]), chunk coverage/overlap arithmetic, and benchmark
self-exclusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators import corpus as C


def test_grams_guard_short_docs(spark):
    df = spark.createDataFrame(
        [("a",), ("a b",), ("a b c",), ("a b c d",)], ["text"])
    out = df.select(C._grams(F.split(F.col("text"), " "), 3).alias("g"))
    got = [r.g for r in out.collect()]
    assert got == [[], [], ["a b c"], ["a b c", "b c d"]]


def test_chunk_covers_every_token_with_overlap(spark, sf_dir):
    chunks = C.corpus_chunk_overlap(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max("n_chunk_tokens").alias("max_chunk"),
        F.sum("n_chunk_tokens").alias("sum_chunk"),
    ).join(docs, "doc_id")
    for r in per_doc.collect():
        # starts are 1, 1+stride, ... ≤ n_tokens
        expect_chunks = (r.n_tokens - 1) // C.CHUNK_STRIDE + 1
        assert r.n_chunks == expect_chunks, r
        assert r.max_chunk <= C.CHUNK_TOKENS
        # with stride < window every token is covered at least once:
        # total sliced tokens ≥ n_tokens
        assert r.sum_chunk >= r.n_tokens


def test_decontaminate_exact_drops_benchmark_and_dups(spark, sf_dir):
    kept = C.corpus_decontaminate_exact(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench_ids = {r.doc_id for r in
                 docs.filter(F.col("doc_id") % C.BENCH_MOD == 0).collect()}
    bench_texts = {r.text for r in
                   docs.filter(F.col("doc_id") % C.BENCH_MOD == 0).collect()}
    kept_ids = {r.doc_id for r in kept.collect()}
    assert not (kept_ids & bench_ids)
    dup_ids = {r.doc_id for r in
               docs.filter(F.col("text").isin(list(bench_texts))).collect()}
    assert not (kept_ids & dup_ids)  # exact dups of benchmark texts gone


def test_ngram_report_excludes_benchmark_docs(spark, sf_dir):
    rep = C.corpus_decontaminate_ngram(spark, sf_dir)
    assert rep.filter(F.col("doc_id") % C.BENCH_MOD == 0).count() == 0
    assert rep.filter(F.col("n_overlap") <= 0).count() == 0


def test_bigram_pmi_value_recomputes(spark, sf_dir):
    import math

    top = C.corpus_bigram_pmi(spark, sf_dir).limit(1).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    n_uni = toks.count()
    n1 = toks.filter(F.col("t") == top.w1).count()
    n2 = toks.filter(F.col("t") == top.w2).count()
    n_big = docs.select(
        F.sum(F.greatest(F.size(F.split("text", " ")) - 1, F.lit(0)))
    ).collect()[0][0]
    expect = math.log(
        (top.n_ab / n_big) / ((n1 / n_uni) * (n2 / n_uni)))
    assert top.pmi == pytest.approx(expect, abs=2e-6)
