"""Semantic pins for the tokenizer/model-prep family
(`operators/tokenizer.py`) beyond the oracle-parity value-hash:
conservation laws, cap bounds, and quantization fixed points that a
matching-but-wrong oracle could not fake.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators import tokenizer as tok

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_chunks_conserve_tokens(spark):
    """Every token lands in exactly one chunk: per-doc chunk n_tokens
    sums equal the doc's token count (boundaries split, never drop)."""
    chunks = tok.text_cdc_chunks(spark, SF_DIR)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("chunk_toks"))
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("doc_toks"))
    )
    bad = (per_doc.join(docs, "doc_id")
           .filter(F.col("chunk_toks") != F.col("doc_toks")).count())
    assert bad == 0


def test_cdc_chunks_are_edit_local(spark):
    """The CDC property: editing ONE token changes at most the chunks
    overlapping the edit — chunk fingerprints after the edit differ
    from the original in at most 1 md5 (the edited token's chunk is
    not a boundary token here, so the boundary set is unchanged)."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    toks = base.split(" ")
    # pick a non-boundary token to edit (bucket != 0 keeps boundaries)
    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % tok.CDC_MOD

    edit_pos = next(i for i, t in enumerate(toks) if bucket(t) != 0)
    edited = list(toks)
    edited[edit_pos] = "EDITED"
    assert bucket("EDITED") != 0, "pick a replacement that is no boundary"

    def chunk_md5s(text):
        df = spark.createDataFrame(
            [(1, text)], ["doc_id", "text"])
        t = F.split(F.col("text"), " ")
        bpos = F.filter(F.sequence(F.lit(1), F.size(t)),
                        lambda i: tok._tok_bucket(F.element_at(t, i)) == 0)
        starts = F.concat(F.array(F.lit(1)),
                          F.transform(bpos, lambda x: x + 1))
        ends = F.concat(bpos, F.array(F.size(t)))
        out = df.select(F.explode(F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(starts)),
                lambda i: F.struct(
                    (F.element_at(ends, i) - F.element_at(starts, i) + 1)
                    .alias("n"),
                    F.md5(F.concat_ws(" ", F.slice(
                        t, F.element_at(starts, i),
                        F.element_at(ends, i)
                        - F.element_at(starts, i) + 1)).cast("binary"))
                    .alias("m"))),
            lambda c: c["n"] >= 1)).alias("c")).select("c.m").collect()
        return [r.m for r in out]

    a, b = chunk_md5s(" ".join(toks)), chunk_md5s(" ".join(edited))
    assert len(a) == len(b)
    assert sum(1 for x, y in zip(a, b) if x != y) <= 1


def test_bpe_top_pairs_counts_crafted_corpus(spark, tmp_path):
    """Crafted corpus with known pair counts: doc 1 'x y x y x y'
    yields x-y 3x and y-x 2x, doc 2 adds one more y-x, doc 3 (single
    token) contributes nothing."""
    docs = [(1, "x y x y x y", "en", "s", 11),
            (2, "y x", "en", "s", 3),
            (3, "solo", "en", "s", 4)]
    sf = tmp_path / "sf"
    sf.mkdir()
    (spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"])
     .coalesce(1).write.parquet(str(sf / "documents.parquet")))
    out = {r.pair: r.n_pairs
           for r in tok.bpe_top_pairs(spark, str(sf)).collect()}
    assert out == {"x y": 3, "y x": 3}


def test_source_cap_bounds_every_source(spark):
    out = tok.curation_source_cap(spark, SF_DIR)
    per_source = out.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= tok.SOURCE_CAP
                              for r in per_source)
    # kept docs are the LONGEST of their source: the minimum kept
    # length must be >= the max dropped length (with doc_id tiebreak,
    # so compare strictly shorter)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept_min = (out.groupBy("source").agg(F.min("n_chars").alias("kmin")))
    dropped = (docs.join(out.select("doc_id"), "doc_id", "left_anti")
               .groupBy("source").agg(F.max("n_chars").alias("dmax")))
    viol = (kept_min.join(dropped, "source")
            .filter(F.col("dmax") > F.col("kmin")).count())
    assert viol == 0


def test_quality_filter_kept_iff_score_above_half(spark):
    out = tok.quality_model_filter(spark, SF_DIR)
    n = out.count()
    assert n > 0
    assert out.filter(
        (F.col("kept") & (F.col("quality_score") < 0.5))
        | (~F.col("kept") & (F.col("quality_score") > 0.5))).count() == 0
    # the cut must actually cut at these weights (not all-keep/all-drop)
    kept = out.filter("kept").count()
    assert 0 < kept < n


def test_pq_codebook_vectors_quantize_to_themselves(spark):
    """Fixed point: vectors 0..PQ_K-1 ARE the codebook, so each must
    quantize to its own code with dist2 == 0 in every subspace."""
    out = (tok.emb_product_quantize(spark, SF_DIR)
           .filter(F.col("vec_id") < tok.PQ_K).collect())
    assert len(out) == tok.PQ_K * tok.PQ_M
    assert all(r.code == r.vec_id and r.dist2 == 0.0 for r in out)


def test_incremental_rollup_is_cutoff_invariant(spark):
    """The partial-merge rollup must equal the one-pass rollup for ANY
    snapshot/delta split point — re-aggregatable state is associative."""
    import house_price_etl_pipeline_spark.operators.analytics as an
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    full = {
        r.ym: (r.n_orders, r.sum_price)
        for r in o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.count("*").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("double").alias("sum_price")).collect()
    }
    for cutoff in ("1993-06-01", "1996-01-01", "1999-01-01"):
        orig = an.ROLLUP_CUTOFF
        an.ROLLUP_CUTOFF = cutoff
        try:
            merged = {r.ym: (r.n_orders, r.sum_price)
                      for r in an.rollup_incremental_maintenance(
                          spark, SF_DIR).collect()}
        finally:
            an.ROLLUP_CUTOFF = orig
        assert merged == full, f"cutoff {cutoff} broke the merge"
