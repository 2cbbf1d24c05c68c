"""Tokenizer-training & model-prep operators (LLM-pipeline extensions,
round 2): BPE merge-candidate mining, content-defined chunking, a
linear quality-model filter, per-source anti-domination caps, and
product quantization of embeddings.

Reference parity note: the reference (586-LoC GCP ETL,
``house_price_etl/pipeline.py``) has none of this — the family belongs
to the mandated LLM training-data extension (SURVEY §7 north star).

Scale notes (the 100 TB story for each):

- **BPE pair mining** = the inner statistic of one byte-pair-encoding
  training round: corpus-wide counts of adjacent token pairs. The pair
  expansion is a NARROW per-row transform (no explode-then-window);
  the only shuffle is the pair-count aggregation, whose map-side
  partial aggregation collapses each partition to its distinct-pair
  footprint first. Top-k is TakeOrderedAndProject, never a global sort.
- **Content-defined chunking** = Rabin-style boundaries, the dedup-
  stable way to split documents (a one-token edit shifts at most one
  chunk, unlike fixed windows). The boundary rule hashes each TOKEN
  (md5 % CDC_MOD == 0), so boundaries are content-local by
  construction. The whole operator — boundary positions, chunk slices,
  per-chunk fingerprints — is pure per-row higher-order functions:
  ZERO shuffle, runs at scan speed on any corpus size. (HOF lambdas
  run interpreted per element — fine at ~100 tokens/doc; the guide's
  matmul caveat does not apply to O(n) string work.)
- **Quality-model filter** = model-based curation's serving shape: a
  logistic regression over cheap text features, scored inline as a
  narrow JVM expression (weights are literals — at 100 TB you'd
  broadcast them; either way the scan never shuffles). The keep
  decision tests the LINEAR margin (z >= 0), not the sigmoid, so the
  boundary is exact float-free-of-exp and engine-stable.
- **Source cap** = anti-domination: no source may contribute more than
  CAP docs, preferring longer ones. One shuffle on `source`; the
  per-group top-N is rank-within-partition, never a global sort. At
  100 TB with a skewed source distribution the AQE skew split handles
  the hot source, same as any windowed top-N.
- **Product quantization** = the memory-side of vector search: split
  each vector into PQ_M subspaces, snap each subspace to its nearest
  codeword, store codes (PQ_M bytes) instead of floats. Codebook here
  is the first PQ_K vectors' subvectors (deterministic, so the DuckDB
  oracle can replay it); production would use k-means codebooks
  (`sim_kmeans_lloyd` is that operator) — the assignment plan is
  identical. The codebook side is a BROADCAST (PQ_M*PQ_K tiny rows);
  the only shuffle is the per-(vec,subspace) argmin aggregation, and
  lexicographic min(struct(dist, code)) makes ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

BPE_TOP_K = 50
CDC_MOD = 8          # expected chunk length ≈ CDC_MOD tokens
SOURCE_CAP = 20      # max docs per source
PQ_M = 4             # subspaces
PQ_SUB = 16          # dims per subspace (PQ_M * PQ_SUB = 64 = emb dim)
PQ_K = 8             # codewords per subspace

# Quality-model weights (a trained logistic regression's serving half).
QW_BIAS = -2.0
QW_NTOK = 0.015
QW_UNIQ = 3.0
QW_STOP = -6.0
_STOPWORDS = ("the", "a")


def _toks() -> Column:
    return F.split(F.col("text"), " ")


@register(
    "bpe_top_pairs",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    p AS (SELECT t[i] || ' ' || t[i+1] AS pair
          FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i))
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY pair
    ORDER BY n_pairs DESC, pair LIMIT {BPE_TOP_K}
    """,
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training round's merge statistic: corpus-wide adjacent
    token-pair counts, top-k candidates by frequency (ties broken by
    pair text, so the merge pick is deterministic). Pair expansion is a
    narrow transform over ``sequence(1, n-1)``; the single shuffle is
    the pair-count agg (map-side partials collapse each partition to
    its distinct pairs first); top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    # materialize the token array BEFORE the index lambda: an inlined
    # split(text) inside element_at re-tokenizes the whole doc per pair
    # (O(n²) per row — measured 13.3 s vs 1.1 s at sf0.1)
    dt = d.select(_toks().alias("t"))
    t = F.col("t")
    # guard: sequence(1, 0) counts DOWN in Spark — 1-token docs must
    # yield an empty pair array, not a bogus descending range
    idx = F.when(F.size(t) >= 2, F.sequence(F.lit(1), F.size(t) - 1)
                 ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(idx, lambda i: F.concat_ws(
        " ", F.element_at(t, i), F.element_at(t, i + 1)))
    return (
        dt.select(F.explode(pairs).alias("pair"))
        .groupBy("pair").agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "pair")
        .limit(BPE_TOP_K)
    )


def _tok_bucket(tok: Column) -> Column:
    """Engine-portable per-token hash bucket: first 4 md5 hex chars →
    int % CDC_MOD (the same md5-prefix idiom as sampling.py)."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 4),
                  16, 10).cast("long") % CDC_MOD


# ONE definition of the CDC chunk CTE chain (review r9: a second,
# hand-duplicated copy of these CTEs would silently desynchronize the
# two oracles from the shared Spark kernel on any boundary-rule edit)
_CDC_CHUNKS_SQL = f"""
    WITH b AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             list_filter(generate_series(1, len(string_split(text, ' '))),
                         i -> ('0x' || substr(md5(string_split(text, ' ')[i]), 1, 4))::UBIGINT
                              % {CDC_MOD} = 0) AS bpos
      FROM documents
    ),
    se AS (
      SELECT doc_id, t,
             list_concat([1], list_transform(bpos, x -> x + 1)) AS starts,
             list_concat(bpos, [len(t)]) AS ends
      FROM b
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             CAST(ends[i] - starts[i] + 1 AS BIGINT) AS n_tokens,
             md5(array_to_string(t[starts[i]:ends[i]], ' ')) AS chunk_md5
      FROM se, UNNEST(generate_series(1, len(starts))) AS u(i)
      WHERE starts[i] <= ends[i]
    )
"""

_CDC_MAIN_SQL = _CDC_CHUNKS_SQL + """
    SELECT doc_id, chunk_idx, n_tokens, chunk_md5
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """


def _cdc_chunk_rows(d: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_md5) — the shared CDC kernel
    (see text_cdc_chunks for semantics). Each derived array (tokens,
    boundary positions, starts/ends) is MATERIALIZED into a column
    before the next lambda references it: inlining them would re-run
    the md5 boundary scan per chunk element (O(n·chunks) per row)."""
    dt = d.select("doc_id", _toks().alias("t"))
    t = F.col("t")
    db = dt.select(
        "doc_id", "t",
        F.filter(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: _tok_bucket(F.element_at(t, i)) == 0).alias("bpos"))
    dse = db.select(
        "doc_id", "t",
        F.concat(F.array(F.lit(1)),
                 F.transform("bpos", lambda x: x + 1)).alias("starts"),
        F.concat(F.col("bpos"), F.array(F.size(t))).alias("ends"))
    starts, ends = F.col("starts"), F.col("ends")
    chunks = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(starts)),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                (F.element_at(ends, i) - F.element_at(starts, i) + 1)
                .cast("bigint").alias("n_tokens"),
                F.md5(F.concat_ws(
                    " ",
                    F.slice(t, F.element_at(starts, i),
                            F.element_at(ends, i)
                            - F.element_at(starts, i) + 1)).cast("binary")
                ).alias("chunk_md5"),
            )),
        lambda c: c["n_tokens"] >= 1)
    return (
        dse.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_md5")
    )


@register("text_cdc_chunks", oracle=_CDC_MAIN_SQL)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: a token whose hash bucket is 0 ENDS a
    chunk, so boundaries move with content (a one-token edit disturbs
    at most one chunk — the property that makes chunk-level dedup
    stable under small edits, vs fixed windows where one edit shifts
    every downstream chunk). Emits (doc_id, chunk_idx, n_tokens,
    chunk_md5). Entirely per-row higher-order functions — boundary
    scan, slice, fingerprint — ZERO shuffle at any corpus size; the
    orderBy exists only for the deterministic oracle compare.
    Degenerate case kept explicit: a boundary on the last token makes
    the trailing (start > end) pseudo-chunk empty — filtered, and the
    raw chunk_idx numbering (with the gap) is replayed by the oracle."""
    d = load_table(spark, sf_dir, "documents")
    return _cdc_chunk_rows(d).orderBy("doc_id", "chunk_idx")


# DuckDB CTE producing the same chunk rows as _cdc_chunk_rows — shared
# by the text_cdc_chunks and dedup_cdc_shared_chunks oracles.
@register(
    "dedup_cdc_shared_chunks",
    oracle=_CDC_CHUNKS_SQL + """
    SELECT chunk_md5,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM chunks
    GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_md5
    """,
)
def dedup_cdc_shared_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup report: CDC chunks appearing in two or more
    distinct documents — the scalable stand-in for suffix-array exact
    substring dedup (boundaries are content-local, so a passage copied
    between documents fingerprints identically even at different
    offsets). Chunking itself is shuffle-free (_cdc_chunk_rows); the
    one corpus-scale shuffle is the chunk_md5 count agg. At 100 TB the
    output relation (shared chunks only) is the small side and feeds
    an anti-join back onto the chunk stream to cut duplicated
    passages."""
    d = load_table(spark, sf_dir, "documents")
    return (
        _cdc_chunk_rows(d)
        .groupBy("chunk_md5")
        .agg(F.count_distinct("doc_id").alias("n_docs"),
             F.count("*").alias("n_occurrences"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(),
                 F.col("n_occurrences").desc(), "chunk_md5")
    )


@register(
    "quality_model_filter",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             {QW_BIAS} + {QW_NTOK} * n_tok + {QW_UNIQ} * (n_uniq / n_tok)
                       + {QW_STOP} * (n_stop / n_tok) AS z
      FROM f
    )
    SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
           CAST(z >= 0.0 AS BOOLEAN) AS kept
    FROM z ORDER BY doc_id
    """,
)
def quality_model_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality curation: a logistic regression over cheap
    text features (token count, type-token ratio, stopword ratio),
    scored inline. The whole model is a narrow JVM expression over the
    scan — weights are literals here; at 100 TB they'd broadcast, the
    plan is unchanged. The keep decision is the LINEAR margin z >= 0
    (exactly sigmoid >= 0.5) so the cut is decided without exp() —
    the feature arithmetic (IEEE doubles, identical association order)
    agrees bit-for-bit across engines, while the displayed sigmoid is
    rounded to absorb libm's last-ulp exp differences."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select("doc_id", _toks().alias("t"))  # tokenize ONCE per row
    t = F.col("t")
    n_tok = F.size(t).cast("double")
    n_uniq = F.size(F.array_distinct(t)).cast("double")
    n_stop = F.size(F.filter(
        t, lambda x: x.isin(*_STOPWORDS))).cast("double")
    z = (F.lit(QW_BIAS) + F.lit(QW_NTOK) * n_tok
         + F.lit(QW_UNIQ) * (n_uniq / n_tok)
         + F.lit(QW_STOP) * (n_stop / n_tok))
    return (
        dt.select(
            "doc_id",
            F.round(1.0 / (1.0 + F.exp(-z)), 6).alias("quality_score"),
            (z >= 0.0).alias("kept"),
        )
        .orderBy("doc_id")
    )


@register(
    "curation_source_cap",
    oracle=f"""
    SELECT source, doc_id, n_chars, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= {SOURCE_CAP}
    ORDER BY source, rnk
    """,
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domination cap: no source contributes more than SOURCE_CAP
    documents, keeping the longest first (deterministic doc_id
    tiebreak) — the rule that stops one crawled domain from flooding a
    training mix. One shuffle on `source`; rank-within-partition, no
    global sort; a skewed hot source is exactly what AQE's skew split
    handles at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars",
                 F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= SOURCE_CAP)
        .orderBy("source", "rnk")
    )


@register(
    "emb_product_quantize",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cb AS (
      SELECT m.m AS sub, v.vec_id AS code,
             v.e[m.m * {PQ_SUB} + 1 : (m.m + 1) * {PQ_SUB}] AS cw
      FROM v, UNNEST(generate_series(0, {PQ_M - 1})) AS m(m)
      WHERE v.vec_id < {PQ_K}
    ),
    d AS (
      SELECT v.vec_id, cb.sub, cb.code,
             list_reduce(
               list_transform(
                 generate_series(1, {PQ_SUB}),
                 j -> (v.e[cb.sub * {PQ_SUB} + j] - cb.cw[j])
                      * (v.e[cb.sub * {PQ_SUB} + j] - cb.cw[j])),
               (acc, x) -> acc + x) AS dist2
      FROM v, cb
    )
    SELECT vec_id, CAST(sub AS INT) AS sub,
           CAST((min(struct_pack(d := dist2, c := code))).c AS BIGINT) AS code,
           round((min(struct_pack(d := dist2, c := code))).d, 6) AS dist2
    FROM d GROUP BY vec_id, sub ORDER BY vec_id, sub
    """,
)
def emb_product_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each vector's PQ_M subvectors snap to the
    nearest of PQ_K codewords, compressing 64 floats to PQ_M small
    codes — the storage half of IVF-PQ vector search. The codebook
    (first PQ_K vectors' subvectors — deterministic so the oracle can
    replay it; production swaps in k-means codebooks with the same
    plan) is PQ_M×PQ_K tiny rows and BROADCASTS; distances are exact
    left-fold double arithmetic (replayed by DuckDB list_reduce); the
    argmin is min(struct(dist, code)) — lexicographic, so ties pick
    the lowest codeword in both engines. The one shuffle is the
    per-(vec, subspace) min aggregation."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id",
                 F.transform("embedding",
                             lambda x: x.cast("double")).alias("e"))
    subs = F.explode(
        F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub")
    cb = (
        v.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code"), "e")
        .select("code", "e", subs)
        .select("sub", "code",
                F.slice(F.col("e"), F.col("sub") * PQ_SUB + 1,
                        PQ_SUB).alias("cw"))
    )
    pairs = v.select("vec_id", "e", subs).join(
        F.broadcast(cb), "sub")
    dist2 = F.aggregate(
        F.zip_with(
            F.slice(F.col("e"), F.col("sub") * PQ_SUB + 1, PQ_SUB),
            F.col("cw"),
            lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x)
    best = F.min(F.struct(dist2.alias("d"), F.col("code").alias("c")))
    return (
        pairs.groupBy("vec_id", F.col("sub").cast("int").alias("sub"))
        .agg(best.alias("b"))
        .select("vec_id", "sub", F.col("b.c").alias("code"),
                F.round(F.col("b.d"), 6).alias("dist2"))
        .orderBy("vec_id", "sub")
    )
