"""Corpus-construction operators (training-data-pipeline extensions,
round 2): benchmark decontamination (exact + n-gram), document chunking
with overlap, and bigram-collocation (PMI) mining.

These are the steps between "deduplicated documents" and "training
tokens" in an LLM data pipeline, each expressed as the Spark plan that
survives 100 TB:

- **Exact decontamination** = anti-join of the corpus against the
  benchmark fingerprint set. Eval suites are tiny (thousands of docs)
  next to a corpus, so the fingerprints BROADCAST: the corpus never
  shuffles, the whole operator is a map-side hash-probe over the scan.
- **N-gram decontamination** = the fuzzy version: a doc is flagged when
  it shares ≥1 distinct n-gram with any benchmark doc. Benchmark
  n-grams explode to a still-small distinct set → broadcast inner join
  against the corpus's per-doc distinct n-grams → count per doc. The
  corpus side explodes but never shuffles on text; the one shuffle is
  the per-doc overlap count on doc_id. GRAM_N here is 3 because the
  synthetic corpus has a 31-token vocabulary (8-grams almost never
  collide on random token soup); production uses 8-13 — the plan is
  unchanged by N.
- **Chunking** = per-row sequence(start, n, stride) + slice — pure
  narrow expressions (posexplode of a computed starts array), zero
  shuffle, zero Python: the shape that turns documents into
  fixed-window training samples at scan speed.
- **PMI collocations** = two token-count aggregations (unigram, bigram)
  + two BROADCAST joins of the bigram relation against the (vocab-sized)
  unigram relation + a 1-row totals broadcast. At 100 TB the unigram
  relation is still vocab-sized; only the bigram count agg shuffles.

Reference parity note: the reference (586-LoC GCP ETL) has no corpus
operators at all — this family is part of the north-star "LLM
training-data pipeline" extension mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

# Benchmark membership: a synthetic "eval suite" carved deterministically
# from the corpus itself (1-in-97 docs by key) so the operator is
# oracle-checkable on the driver's fixed tables.
BENCH_MOD = 97
GRAM_N = 3          # production: 8-13; see module docstring
CHUNK_TOKENS = 16   # chunk window (tokens)
CHUNK_STRIDE = 12   # overlap = CHUNK_TOKENS - CHUNK_STRIDE
PMI_TOP_K = 50


def _toks() -> Column:
    return F.split(F.col("text"), " ")


def _is_bench() -> Column:
    return F.col("doc_id") % BENCH_MOD == 0


@register(
    "corpus_decontaminate_exact",
    oracle=f"""
    SELECT doc_id, md5(text) AS text_md5
    FROM documents
    WHERE text IS NULL OR md5(text) NOT IN
          (SELECT md5(text) FROM documents
           WHERE doc_id % {BENCH_MOD} = 0 AND text IS NOT NULL)
    ORDER BY doc_id
    """,
)
def corpus_decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact benchmark decontamination: drop every document whose full
    text matches an eval-suite document. Broadcast anti-join on the md5
    fingerprint — the corpus side is a single scan with a map-side hash
    probe, no shuffle at any corpus size (the broadcast side is the
    benchmark, which is small by construction).

    NULL semantics, explicit on both sides (round 9): a NULL-text
    document is never contaminated (anti-join NULL keys match nothing →
    KEPT), and NULL-text benchmark rows are excluded from the
    fingerprint set — the oracle's bare ``NOT IN`` would otherwise go
    never-true the moment ONE benchmark doc had NULL text, silently
    decontaminating the whole corpus."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    bench = (d.filter(_is_bench() & F.col("text").isNotNull())
             .select(fp.alias("bench_md5")).distinct())
    return (
        d.select("doc_id", fp.alias("text_md5"))
        .join(F.broadcast(bench),
              F.col("text_md5") == F.col("bench_md5"), "left_anti")
        .orderBy("doc_id")
    )


def _grams(tokens: Column, n: int = GRAM_N) -> Column:
    """All n-grams of a token array as 'w1 w2 ... wn' strings; empty
    array for docs shorter than n (sequence(1,0) would count DOWN in
    Spark — the when-guard is load-bearing)."""
    size = F.size(tokens)
    starts = F.when(
        size >= n, F.sequence(F.lit(1), size - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))


@register(
    "corpus_decontaminate_ngram",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT DISTINCT array_to_string(t[i:i+{GRAM_N - 1}], ' ') AS g
           FROM toks, UNNEST(generate_series(1, len(t)-{GRAM_N - 1})) AS s(i)
           WHERE doc_id % {BENCH_MOD} = 0),
    dg AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{GRAM_N - 1}], ' ') AS g
           FROM toks, UNNEST(generate_series(1, len(t)-{GRAM_N - 1})) AS s(i)
           WHERE doc_id % {BENCH_MOD} <> 0)
    SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM dg JOIN bg USING (g)
    GROUP BY dg.doc_id
    ORDER BY dg.doc_id
    """,
)
def corpus_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram benchmark contamination report: per non-benchmark doc, how
    many DISTINCT benchmark n-grams it contains (>0 rows only — the
    docs a pipeline would quarantine). The benchmark's distinct n-gram
    set broadcasts; the corpus side computes its per-doc distinct grams
    with narrow expressions (array_distinct before explode bounds the
    explode fan-out) and probes the broadcast — one shuffle total, the
    per-doc count on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    # materialize tokens before _grams: the gram lambda slices the
    # token array per start index — an inlined split would re-tokenize
    # the doc per gram (O(n²) per row)
    dt = d.select("doc_id", _is_bench().alias("is_bench"),
                  _toks().alias("t"))
    grams = _grams(F.col("t"))
    bench_grams = (
        dt.filter("is_bench")
        .select(F.explode(F.array_distinct(grams)).alias("g"))
        .distinct()
    )
    doc_grams = (
        dt.filter(~F.col("is_bench"))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
        .orderBy("doc_id")
    )


CONTAIN_N = 2        # bigram containment (looser than GRAM_N on purpose)
CONTAIN_TOP_K = 20


@register(
    "corpus_containment_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT DISTINCT doc_id AS bench_id,
                  array_to_string(t[i:i+{CONTAIN_N - 1}], ' ') AS g
           FROM toks, UNNEST(generate_series(1, len(t)-{CONTAIN_N - 1})) AS s(i)
           WHERE doc_id % {BENCH_MOD} = 0),
    bs AS (SELECT bench_id, COUNT(*) AS nb FROM bg GROUP BY 1),
    dg AS (SELECT DISTINCT doc_id,
                  array_to_string(t[i:i+{CONTAIN_N - 1}], ' ') AS g
           FROM toks, UNNEST(generate_series(1, len(t)-{CONTAIN_N - 1})) AS s(i)
           WHERE doc_id % {BENCH_MOD} <> 0),
    ov AS (SELECT bg.bench_id, dg.doc_id, COUNT(*) AS c
           FROM bg JOIN dg USING (g) GROUP BY 1, 2)
    SELECT bench_id, doc_id,
           round(c * 1.0 / nb, 6) AS containment
    FROM ov JOIN bs USING (bench_id)
    ORDER BY c * 1.0 / nb DESC, bench_id, doc_id
    LIMIT {CONTAIN_TOP_K}
    """,
)
def corpus_containment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair n-gram CONTAINMENT score (|bench ∩ doc| / |bench| —
    asymmetric, the standard contamination metric: 'how much of this
    eval document appears inside that training document', which Jaccard
    under-reports when the training doc is much longer), reported as
    the top-CONTAIN_TOP_K most-contaminating (bench, doc) pairs.

    Scale shape: the benchmark gram index is broadcast (small by
    construction); the corpus side is one explode + map-side hash probe,
    and the only pair-scale relation is the overlap aggregation, whose
    size is bounded by actually-overlapping pairs — never
    |bench| × |corpus|. Top-k via TakeOrderedAndProject, no global
    sort; ranking at full precision with a total (score, bench_id,
    doc_id) order so boundary ties are deterministic in both engines."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select("doc_id", _is_bench().alias("is_bench"), _toks().alias("t"))
    grams = F.array_distinct(_grams(F.col("t"), CONTAIN_N))
    bench_grams = (
        dt.filter("is_bench")
        .select(F.col("doc_id").alias("bench_id"),
                F.explode(grams).alias("g"))
    )
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count("*").alias("nb"))
    doc_grams = (
        dt.filter(~F.col("is_bench"))
        .select("doc_id", F.explode(grams).alias("g"))
    )
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("bench_id", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    score = F.col("c") * F.lit(1.0) / F.col("nb")
    return (
        overlap.join(F.broadcast(bench_sizes), "bench_id")
        .orderBy(score.desc(), "bench_id", "doc_id")
        .limit(CONTAIN_TOP_K)
        .select("bench_id", "doc_id", F.round(score, 6).alias("containment"))
    )


@register(
    "corpus_chunk_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST((i - 1) // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(len(t[i:i+{CHUNK_TOKENS - 1}]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[i:i+{CHUNK_TOKENS - 1}], ' ')) AS chunk_md5
    FROM toks, UNNEST(generate_series(1, len(t), {CHUNK_STRIDE})) AS s(i)
    ORDER BY doc_id, chunk_idx
    """,
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (window CHUNK_TOKENS, stride
    CHUNK_STRIDE): the document→training-sample shredder. Starts are a
    per-row sequence(1, n_tokens, stride); each chunk is a slice —
    all narrow whole-stage-codegen expressions, no shuffle, no Python.
    Chunk text is fingerprinted (md5) rather than carried verbatim so
    the output stays narrow; a real pipeline would write the text
    column instead — same plan."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS)
    return (
        d.select("doc_id", toks.alias("t"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int")
            .alias("chunk_idx"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "corpus_bigram_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM toks, UNNEST(t) AS u(tok) GROUP BY u.tok),
    big AS (SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM toks, UNNEST(generate_series(1, len(t)-1)) AS s(i)
            GROUP BY t[i], t[i+1]),
    tot AS (SELECT (SELECT SUM(n) FROM uni) AS n_uni,
                   (SELECT SUM(n_ab) FROM big) AS n_big)
    SELECT w1, w2, n_ab,
           round(ln((n_ab / n_big) /
                    ((u1.n / n_uni) * (u2.n / n_uni))), 6) AS pmi
    FROM big
    CROSS JOIN tot
    JOIN uni u1 ON big.w1 = u1.tok
    JOIN uni u2 ON big.w2 = u2.tok
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
)
def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information —
    PMI = ln(p(ab) / (p(a)·p(b))) over corpus token streams. Two count
    aggregations (the bigram one is the only corpus-scale shuffle), then
    the bigram relation joins the vocab-sized unigram relation twice via
    BROADCAST and the 1-row totals relation via broadcast cross join
    (allowlisted 1-row BNLJ class in tests/test_plans.py). The arithmetic
    is ordered identically to the oracle so the doubles agree."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE into a column — an inlined split inside the pair
    # lambda re-splits the doc per element_at (O(n²) per row)
    dt = d.select(_toks().alias("t"))
    toks = F.col("t")
    uni = (
        dt.select(F.explode(toks).alias("tok"))
        .groupBy("tok").agg(F.count("*").cast("bigint").alias("n"))
    )
    pairs = F.transform(
        F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    big = (
        dt.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    tot = (
        uni.agg(F.sum("n").alias("n_uni"))
        .crossJoin(big.agg(F.sum("n_ab").alias("n_big")))
    )
    u1 = uni.select(F.col("tok").alias("tok1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("tok").alias("tok2"), F.col("n").alias("n2"))
    pmi = F.round(
        F.log(
            (F.col("n_ab") / F.col("n_big"))
            / ((F.col("n1") / F.col("n_uni")) * (F.col("n2") / F.col("n_uni")))
        ),
        6,
    )
    return (
        big.crossJoin(F.broadcast(tot))
        .join(F.broadcast(u1), F.col("w1") == F.col("tok1"))
        .join(F.broadcast(u2), F.col("w2") == F.col("tok2"))
        .select("w1", "w2", "n_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP_K)
    )


@register(
    "corpus_source_composition",
    oracle="""
    WITH per AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS total_tokens,
             round(AVG(n_chars), 6) AS avg_chars
      FROM documents GROUP BY source, lang
    ), tot AS (SELECT SUM(total_tokens) AS corpus_tokens FROM per)
    SELECT source, lang, n_docs, total_tokens, avg_chars,
           round(total_tokens / corpus_tokens, 6) AS token_share
    FROM per CROSS JOIN tot
    ORDER BY source, lang
    """,
)
def corpus_source_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report: per (source, lang) doc counts, token
    totals, and each cell's share of all corpus tokens — the mixing
    table a data pipeline tunes sampling weights against. One group-by
    shuffle; the share denominator is a 1-row re-aggregate of the
    already-tiny report, broadcast back (allowlisted 1-row class)."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(_toks())).cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )
    tot = per.agg(F.sum("total_tokens").alias("corpus_tokens"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "lang", "n_docs", "total_tokens", "avg_chars",
            F.round(F.col("total_tokens") / F.col("corpus_tokens"), 6)
            .alias("token_share"),
        )
        .orderBy("source", "lang")
    )


TOKEN_BUDGET = 3000  # per-language token cap (absolute, as in production)


@register(
    "corpus_token_budget_cap",
    oracle=f"""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             round(len(list_distinct(string_split(text, ' ')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
               AS score
      FROM documents
    ), c AS (
      SELECT lang, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY score DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT lang, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    ORDER BY lang, doc_id
    """,
)
def corpus_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget selection: rank each language's docs by
    a quality proxy (token diversity) and keep the best until the
    language's cumulative token count hits the budget — the mixing/
    rebalancing step that follows the composition report above.

    Scale shape (round 10): the running sum is NOT one window per
    language — ``Window.partitionBy(lang)`` funnels each language's
    ENTIRE stratum through a single sort task, and a 100 TB corpus has
    maybe 30 languages for thousands of cores. Instead the per-stratum
    prefix sum is two-phase (packing.py's pattern, per stratum): rows
    are bucketed by a DETERMINISTIC band of the score itself (bucket
    asc ≡ score desc, ties inside one bucket by construction), phase 1
    aggregates one subtotal per (lang, bucket) — a langs×parallelism-
    sized collect — and phase 2 runs the window per (lang, bucket) plus
    the broadcast offset of all earlier buckets of that language. Same
    (score desc, doc_id) total order as the oracle, no stratum-sized
    task anywhere."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select("lang", "doc_id", _toks().alias("t"))  # tokenize once
    toks = F.col("t")
    n_tokens = F.size(toks).cast("bigint")
    score = F.round(
        F.size(F.array_distinct(toks)) / n_tokens.cast("double"), 6)
    # max(core count, data-scaled) buckets: the data-scaled term bounds
    # rows per (lang, bucket) window task at corpus scale, the core
    # floor keeps the local spread (VERDICT r14 item 9). Results are
    # bucket-count-independent — buckets only split the window work
    # along the (score desc, doc_id) total order.
    from ..sources.tables import scaled_partitions
    n_buckets = max(2, spark.sparkContext.defaultParallelism,
                    scaled_partitions(spark, sf_dir, "documents",
                                      rows_per_partition=100_000))
    # deterministic score-band bucket: score ∈ [0, 1]; bucket ascending
    # == score descending, and equal scores share a bucket, so
    # (bucket, score desc, doc_id) is the same total order both phases
    # see — no sampled range partitioner, no cross-job nondeterminism.
    # NULL scores (NULL-text docs, the standing NULL audit's corpus)
    # sort LAST under desc in both engines, so they land in the last
    # bucket explicitly — a NULL bucket would silently drop the row at
    # the offsets equi-join (found by test_null_corpus_parity)
    bucket = F.when(
        F.col("score").isNull(), F.lit(n_buckets - 1)
    ).otherwise(F.least(
        F.lit(n_buckets - 1),
        F.floor((F.lit(1.0) - F.col("score")) * n_buckets))).cast("int")
    # NULL-lang rows form their own stratum (Spark window partitioning
    # groups NULLs); the join below is keyed on a NULL-free sentinel so
    # they are not silently dropped by equi-join NULL semantics
    base = (
        dt.select("lang", "doc_id", n_tokens.alias("n_tokens"),
                  score.alias("score"))
        .withColumn("_lg", F.coalesce(F.col("lang"), F.lit("\x00null")))
        .withColumn("_b", bucket)
    )
    subs = (base.groupBy("_lg", "_b")
            .agg(F.sum("n_tokens").alias("t")).collect())
    per: dict = {}
    for r in subs:
        # a bucket whose rows all have NULL n_tokens sums to NULL —
        # zero contribution to later buckets' offsets
        per.setdefault(r._lg, {})[int(r._b)] = int(r.t or 0)
    rows = []
    for lg, d_ in per.items():
        running = 0
        for b in range(n_buckets):
            rows.append((lg, b, running))
            running += d_.get(b, 0)
    off = spark.createDataFrame(rows, "_lg string, _b int, _off long")
    w = (Window.partitionBy("_lg", "_b")
         .orderBy(F.col("score").desc(), "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        base.join(F.broadcast(off), ["_lg", "_b"])
        .select("lang", "doc_id", "n_tokens", "score", "_lg", "_b", "_off")
        .withColumn("cum_tokens",
                    (F.sum("n_tokens").over(w) + F.col("_off"))
                    .cast("bigint"))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("lang", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")
    )


MIX_ALPHA_SQRT = True  # temperature alpha = 0.5 (sqrt scaling)


@register(
    "corpus_mixture_temperature",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (SELECT source, n_tokens,
                 CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(25,12)) AS pw
          FROM s),
    tot AS (SELECT SUM(pw) AS z, SUM(n_tokens) AS total_tokens FROM w)
    SELECT source, n_tokens,
           round(CAST(pw AS DOUBLE) / CAST(z AS DOUBLE), 10) AS weight,
           CAST(round(CAST(pw AS DOUBLE) / CAST(z AS DOUBLE)
                      * total_tokens, 0) AS BIGINT) AS target_tokens
    FROM w CROSS JOIN tot
    ORDER BY source
    """,
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture design (alpha = 0.5): each source's
    sampling weight is n_tokens^alpha renormalized — the standard
    rebalancing that upsamples small high-quality sources without
    letting the biggest domain dominate. Per-source token counts are
    the only corpus-scale shuffle (20 groups); the normalizer is a
    1-row broadcast back over the source-sized relation. The sqrt
    powers are cast to DECIMAL before summing so the denominator is
    order-independent and bit-identical to the oracle — a raw double
    SUM would vary with aggregation order."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.select("source", F.size(_toks()).cast("bigint").alias("nt"))
        .groupBy("source").agg(F.sum("nt").cast("bigint").alias("n_tokens"))
    )
    w = s.select(
        "source", "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double"))
        .cast("decimal(25,12)").alias("pw"))
    tot = w.agg(F.sum("pw").alias("z"),
                F.sum("n_tokens").alias("total_tokens"))
    weight = F.round(
        F.col("pw").cast("double") / F.col("z").cast("double"), 10)
    target = F.round(
        F.col("pw").cast("double") / F.col("z").cast("double")
        * F.col("total_tokens"), 0).cast("bigint")
    return (
        w.crossJoin(F.broadcast(tot))
        .select("source", "n_tokens", weight.alias("weight"),
                target.alias("target_tokens"))
        .orderBy("source")
    )
