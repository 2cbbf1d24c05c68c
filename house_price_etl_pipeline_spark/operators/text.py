"""Text-analysis operators over the ``documents`` table (north-star
extensions, BASELINE.json): language-ID, quality scoring, token counting,
fingerprinting, n-gram profiles.

All pure column expressions — split/filter/transform/aggregate higher-order
functions stay inside whole-stage codegen; there is no Python in any of
these paths, so they scan at parquet speed at 100 TB. The heuristics are
deliberately simple (marker-token scoring, ratio features): the *shape* is
what a training-data pipeline needs; swapping in real marker tables is a
broadcast join away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

# Marker-token sets per language (synthetic vocab: the driver's documents
# are space-separated English-ish tokens with random lang labels, so these
# exercise the real n-gram/marker scoring machinery on that vocab).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("table", "row", "line"),
    "de": ("group", "order", "filter"),
    "fr": ("join", "merge", "sort"),
    "zh": ("scan", "hash", "key"),
}
_LANG_ORDER = tuple(LANG_MARKERS)  # tie-break priority, fixed

STOPWORDS = ("the", "a", "of", "and")


def _tokens(col: str = "text", coalesce_empty: bool = False) -> Column:
    src = F.coalesce(F.col(col), F.lit("")) if coalesce_empty else F.col(col)
    return F.split(src, " ")


def _marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    """Occurrence count (multiset, not distinct) of marker tokens."""
    return F.size(F.filter(tokens, lambda t: t.isin(*markers))).cast("bigint")


def _marker_hits_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        f"CAST(len(list_filter(string_split(text, ' '),"
        f" t -> t IN ({inlist}))) AS BIGINT)"
    )


# --- language identification ----------------------------------------------

_LANGID_SCORE_SQL = ",\n".join(
    f"           {_marker_hits_sql(m)} AS score_{lang}"
    for lang, m in LANG_MARKERS.items()
)
_LANGID_PRED_SQL = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(f"score_{lang} >= score_{other}"
                   for other in _LANG_ORDER if other != lang)
    + f" THEN '{lang}'"
    for lang in _LANG_ORDER
) + " END"


@register(
    "text_language_id",
    oracle=f"""
    SELECT doc_id, {_LANGID_PRED_SQL.replace(chr(10), ' ')} AS pred_lang,
           score_en, score_es, score_de, score_fr, score_zh
    FROM (
      SELECT doc_id,
{_LANGID_SCORE_SQL}
      FROM documents
    ) ORDER BY doc_id
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language scoring + deterministic argmax (first language
    in _LANG_ORDER wins ties — mirrored exactly in the oracle CASE)."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE: five per-language marker filters over an inlined
    # split would re-tokenize the doc five times per row
    dt = d.select("doc_id", _tokens().alias("tk"))
    toks = F.col("tk")
    scored = dt.select(
        "doc_id",
        *[_marker_hits(toks, m).alias(f"score_{lang}")
          for lang, m in LANG_MARKERS.items()],
    )
    pred = None
    for lang in reversed(_LANG_ORDER):
        cond = None
        for other in _LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    return (
        scored.select(
            "doc_id", pred.alias("pred_lang"),
            "score_en", "score_es", "score_de", "score_fr", "score_zh",
        )
        .orderBy("doc_id")
    )


# --- quality scoring -------------------------------------------------------

@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, n_distinct_tokens, stopword_ratio, avg_token_len,
           round(0.4 * least(n_tokens / 100.0, 1.0)
               + 0.3 * (n_distinct_tokens / CAST(n_tokens AS DOUBLE))
               + 0.3 * (1.0 - stopword_ratio), 6) AS quality
    FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
             round({_marker_hits_sql(STOPWORDS)} / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
             round((length(text) - len(string_split(text, ' ')) + 1)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_token_len
      FROM documents
    ) ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / diversity / stopword-ratio features + a weighted quality
    score — the standard pre-training corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select("doc_id", "text", _tokens().alias("tk"))  # tokenize once
    toks = F.col("tk")
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    stop_ratio = F.round(_marker_hits(toks, STOPWORDS) / n_tokens.cast("double"), 6)
    # total chars minus separators, over token count
    avg_len = F.round(
        (F.length("text") - n_tokens + 1) / n_tokens.cast("double"), 6
    )
    base = dt.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        stop_ratio.alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
    )
    quality = F.round(
        0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * (F.col("n_distinct_tokens") / F.col("n_tokens").cast("double"))
        + 0.3 * (1.0 - F.col("stopword_ratio")),
        6,
    )
    return base.withColumn("quality", quality).orderBy("doc_id")


# --- token counting --------------------------------------------------------

@register(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens, regex word tokens, and the chars/4 BPE
    approximation — the three standard budget estimators."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(_tokens()).cast("bigint").alias("ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(r"[a-z0-9]+")).cast("bigint")
            .alias("re_tokens"),
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# --- fingerprinting --------------------------------------------------------

@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form content fingerprint: whitespace-normalize, lowercase,
    md5 — engine-portable (identical hex in Spark and DuckDB), the exact
    -dedup key at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        d.select(
            "doc_id",
            F.md5(canon.cast("binary")).alias("fingerprint"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_trigram_profile",
    oracle="""
    SELECT doc_id,
           CAST(len(list_distinct(list_transform(range(1, length(text) - 1),
                i -> substring(text, CAST(i AS INTEGER), 3)))) AS BIGINT) AS n_distinct_trigrams,
           CAST(length(text) - 2 AS BIGINT) AS n_trigrams
    FROM documents WHERE length(text) >= 3 ORDER BY doc_id
    """,
)
def text_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram shingle profile (the unit under MinHash): distinct
    vs total shingles per doc, via sequence+transform higher-order fns.

    The documents parquet arrives as ONE input split, and the per-char
    interpreted HOF is the expensive part — repartition FIRST so the
    ~300x per-row expansion runs on every core, not one task (same
    lesson as the dedup shingle pipelines; 3.75 s → 0.78 s at sf0.1).
    Width = max(core count, data-scaled): a bare defaultParallelism
    repartition would CAP the stage at core count (and bottleneck a
    100 TB corpus through 32 tasks); the data-scaled term grows with
    the corpus while the core floor keeps the small-corpus spread
    (VERDICT r14 item 9)."""
    from ..sources.tables import scaled_partitions

    width = max(spark.sparkContext.defaultParallelism,
                scaled_partitions(spark, sf_dir, "documents",
                                  rows_per_partition=2000))
    d = load_table(spark, sf_dir, "documents").repartition(width)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.col("text").substr(i, F.lit(3)),
    )
    return (
        d.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct_trigrams"),
            (F.length("text") - 2).cast("bigint").alias("n_trigrams"),
        )
        .orderBy("doc_id")
    )


# --- tf-idf ------------------------------------------------------------------

@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_docs_with FROM tok GROUP BY t),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tok.doc_id, tok.t, tok.tf,
             round(tok.tf * ln(CAST(n.n_docs AS DOUBLE) / df.n_docs_with), 6) AS tfidf
      FROM tok JOIN df USING (t) CROSS JOIN n
    )
    SELECT doc_id, t AS term, tf, tfidf
    FROM (SELECT *, row_number() OVER (ORDER BY tfidf DESC, doc_id, t) AS rn
          FROM scored)
    WHERE rn <= 100
    ORDER BY tfidf DESC, doc_id, term
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tf-idf, top-100 (doc, term) pairs: explode → two hash aggs
    (term frequency per doc, document frequency per term) → broadcast of
    the corpus size → TakeOrderedAndProject. The df table is vocabulary-
    sized — tiny next to the corpus — so AQE broadcasts it; at 100 TB
    this is two shuffles total (both on bounded-cardinality keys)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # driver scalar: one count job, broadcast as literal
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    )
    df_tbl = tok.groupBy("t").agg(F.count("*").alias("n_docs_with"))
    tfidf = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("n_docs_with")), 6
    )
    # top-100 via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps + one bounded merge). The previous row_number over a global
    # un-partitioned window shuffled the ENTIRE scored (doc, term)
    # relation into a single task — the one-partition anti-pattern this
    # module's docstring forbids (review r9).
    return (
        tok.join(df_tbl, "t")
        .select("doc_id", F.col("t").alias("term"), "tf", tfidf.alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), "doc_id", "term")
        .limit(100)
    )


# --- UDTF surface (SURVEY §2.9 U3: absent in reference; exemplar here) ------

@register(
    "text_udtf_positional_tokens",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE doc_id < 100),
         UNNEST(range(1, len(ws) + 1)) AS r(i)
    ORDER BY doc_id, pos
    """,
)
def text_udtf_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) exemplar: one input row → N output
    rows with schema (pos, token), consumed via a SQL LATERAL join. The
    engine-surface demonstration for UDTFs; for pure tokenization the
    native posexplode(split()) is the hot-path form (it is what the
    oracle models and what dedup/text ops use)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class PositionalTokens:
        def eval(self, text: str):
            if text is None:
                return  # no text, no rows — the oracle's UNNEST(range(
                #         1, len(NULL)+1)) semantics; '' still yields
                #         one ('', pos 0) row in both engines
            for i, t in enumerate(text.split(" ")):
                yield i, t

    spark.udtf.register("positional_tokens", PositionalTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT d.doc_id, s.pos, s.token
        FROM documents d, LATERAL positional_tokens(d.text) s
        WHERE d.doc_id < 100
        ORDER BY doc_id, pos
    """)


# --- pattern extraction / redaction (the PII-scrub plan shape) -------------

# On real corpora this regex is an email/phone/SSN alternation; the
# driver's synthetic vocab has no digits, so the exemplar pattern matches
# word families instead — the PLAN (extract-all → explode → count, and
# replace-all → fingerprint) is byte-for-byte the PII pipeline's.
PATTERN = r"\b(s[a-z]+)\b"


@register(
    "text_pattern_extract",
    oracle=r"""
    SELECT m AS matched, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(text, '\b(s[a-z]+)\b', 1)) AS m
      FROM documents
    )
    GROUP BY m ORDER BY n_hits DESC, m
    """,
)
def text_pattern_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract-all + frequency: every regex hit exploded to a row, counted
    corpus-wide (total + per-doc reach). regexp_extract_all is JVM-side
    codegen; the only shuffle is on the (small) matched-string key."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id",
                 F.explode(F.regexp_extract_all("text", F.lit(PATTERN), 1))
                 .alias("matched"))
        .groupBy("matched")
        .agg(F.count("*").alias("n_hits"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n_hits").desc(), "matched")
    )


@register(
    "text_redact_pattern",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(text, '\b(s[a-z]+)\b', '<REDACTED>', 'g'))
             AS redacted_fp,
           CAST(len(regexp_extract_all(text, '\b(s[a-z]+)\b', 1)) AS BIGINT)
             AS n_redactions
    FROM documents WHERE doc_id < 500 ORDER BY doc_id
    """,
)
def text_redact_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass: replace every pattern hit, emit the redacted-text
    fingerprint + per-doc redaction count (the audit pair a PII scrub
    job writes). Pure narrow map — no shuffle at all."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return (
        d.select(
            "doc_id",
            F.md5(F.regexp_replace("text", PATTERN, "<REDACTED>").cast("binary"))
            .alias("redacted_fp"),
            F.size(F.regexp_extract_all("text", F.lit(PATTERN), 1))
            .cast("bigint").alias("n_redactions"),
        )
        .orderBy("doc_id")
    )


# --- repetition & entropy quality (Gopher-style signals) -------------------

@register(
    "text_repetition_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM tok GROUP BY doc_id)
    SELECT tok.doc_id,
           CAST(tot.n AS BIGINT) AS n_tokens,
           round(CAST(MAX(tok.c) AS DOUBLE) / tot.n, 6) AS top_token_share,
           round(-SUM((tok.c / CAST(tot.n AS DOUBLE))
                      * ln(tok.c / CAST(tot.n AS DOUBLE))), 6) AS token_entropy
    FROM tok JOIN tot ON tok.doc_id = tot.doc_id
    GROUP BY tok.doc_id, tot.n ORDER BY tok.doc_id
    """,
)
def text_repetition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition + entropy quality signals (the Gopher-rule shape):
    top-token share flags degenerate repetition, Shannon entropy of the
    token distribution flags low-diversity docs. explode → (doc, token)
    count → per-doc rollup: both shuffles key on doc_id, so the second
    reuses the first's partitioning."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(_tokens()).alias("t"))
        .groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(w).cast("double")
    return (
        tok.withColumn("plogp", p * F.log(p))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"),
             F.round(F.max("c").cast("double") / F.sum("c"), 6)
             .alias("top_token_share"),
             F.round(-F.sum("plogp"), 6).alias("token_entropy"))
        .orderBy("doc_id")
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, lang AS labeled,
             {_LANGID_PRED_SQL.replace(chr(10), ' ')} AS predicted
      FROM (
        SELECT doc_id, lang,
{_LANGID_SCORE_SQL}
        FROM documents
      )
    )
    SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY labeled, predicted ORDER BY labeled, predicted
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation shape: the language-ID confusion matrix
    (labeled × predicted counts) — the rollup any filter/classifier in a
    data pipeline publishes with each run. Reuses the scorer; adds one
    tiny-key shuffle."""
    d = load_table(spark, sf_dir, "documents")
    pred = text_language_id(spark, sf_dir).select(
        "doc_id", F.col("pred_lang").alias("predicted"))
    return (
        d.select("doc_id", F.col("lang").alias("labeled"))
        .join(pred, "doc_id")
        .groupBy("labeled", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("labeled", "predicted")
    )


@register(
    "fuzzy_match_part_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a
    JOIN names b
      ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching with blocking — the entity-resolution /
    data-cleaning op (find near-identical names without an all-pairs
    scan). Shape at scale: (1) DISTINCT the names first — the candidate
    relation is vocabulary-sized, not fact-table-sized; (2) equi-join on
    a cheap blocking key (first char here; first-char + length-band in
    production) so Catalyst plans a hash join, never a cartesian; (3)
    the O(len^2) levenshtein runs only on within-block survivors as a
    JVM-side post-join filter. Recall is the blocking key's recall by
    design — pairs differing in their first character are out of scope,
    identically in engine and oracle."""
    names = (load_table(spark, sf_dir, "part")
             .select("p_name").distinct())
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(b, (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
               & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, u.t AS t
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           UNNEST(ts) AS u(t)
    ),
    vocab AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t),
    tot AS (SELECT SUM(n) AS total FROM vocab),
    scored AS (
      SELECT tok.doc_id,
             CAST(-ln(vocab.n / CAST(total AS DOUBLE)) AS DECIMAL(25,12))
               AS nll
      FROM tok JOIN vocab USING (t) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the simplified CCNet shape): the
    corpus's own token distribution is the model; each document scores
    its average per-token negative log-probability — low = in-domain
    text, high = unusual token mix; threshold it and you have LM-based
    quality filtering. Plan: one vocab-count aggregation (vocab-sized
    output), the 1-row total, then the token stream joins the
    BROADCAST vocab and aggregates per doc — the doc_id shuffle is the
    only corpus-scale exchange. Per-token -ln p values are summed as
    DECIMAL so the per-doc total is aggregation-order-independent and
    bit-identical to the oracle."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("t"))
    vocab = tok.groupBy("t").agg(F.count("*").cast("bigint").alias("n"))
    tot = vocab.agg(F.sum("n").alias("total"))
    nll = (-F.log(F.col("n") / F.col("total").cast("double"))
           ).cast("decimal(25,12)")
    return (
        tok.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_tokens"),
             F.round(F.sum(nll).cast("double") / F.count("*"), 6)
             .alias("avg_neg_logprob"))
        .orderBy("doc_id")
    )


# fixed retrieval query for the oracled BM25 ranking (tokens from the
# synthetic vocab; three terms of different document frequency so the
# idf weighting actually reorders the tf ranking)
BM25_QUERY_TERMS = ("window", "merge", "scan")
BM25_K1, BM25_B = 1.2, 0.75


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         string_split(coalesce(text, ''), ' ') AS t
                  FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     AVG(len(t)) AS avgdl
              FROM toks),
    tok AS (SELECT doc_id, len(t) AS dl, u.tok AS term
            FROM toks, UNNEST(t) AS u(tok)
            WHERE u.tok IN ('window', 'merge', 'scan')),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
           FROM tok GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS n_docs_with FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             CAST(ln((stats.n_docs - dfq.n_docs_with + 0.5)
                     / (dfq.n_docs_with + 0.5) + 1.0)
                  * (tf.tf * {BM25_K1 + 1.0})
                  / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                             + ({BM25_B} * tf.dl) / stats.avgdl))
                  AS DECIMAL(25,12)) AS c
      FROM tf JOIN dfq USING (term) CROSS JOIN stats)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           round(CAST(SUM(c) AS DOUBLE), 6) AS bm25
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval ranking (Robertson/Lucene idf variant,
    k1=1.2 b=0.75) for a fixed query over the corpus — the standard
    relevance scorer a training-data pipeline uses for quality-by-query
    mining and dedup-aware retrieval eval.

    Plan shape is the at-scale one: the token stream is FILTERED to the
    query terms before any aggregation, so the tf aggregation is
    bounded by |docs containing a query term| × |query|, never corpus
    token count; document frequency comes from the same tiny relation;
    N and avgdl are one stats aggregate collected as two driver
    scalars. One doc_id-keyed shuffle of the filtered stream is the
    only corpus-scale exchange — the same discipline as
    text_unigram_logprob (whose decimal per-term summation this reuses
    for aggregation-order-independent, oracle-bit-identical totals).
    TakeOrderedAndProject serves the top-k."""
    d = load_table(spark, sf_dir, "documents")
    # NULL text is coalesced to '' BEFORE tokenizing (here and in the
    # oracle): Spark's size(split(NULL)) is -1, which would silently
    # drag avgdl below the oracle's NULL-skipping AVG(len(...)) on any
    # corpus with NULL documents — make the semantics explicit instead
    # of relying on the generator never emitting NULL text (ADVICE r8).
    toks = _tokens(coalesce_empty=True)
    stats = d.select(F.size(toks).alias("dl")) \
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")) \
        .collect()[0]
    n_docs = float(stats.n)
    # empty corpus: avg over zero rows is NULL — any non-zero avgdl
    # keeps the (vacuously empty) plan well-formed instead of float(None)
    avgdl = float(stats.avgdl) if stats.avgdl is not None else 1.0

    tok = (d.select("doc_id", F.size(toks).alias("dl"),
                    F.explode(toks).alias("term"))
           .filter(F.col("term").isin(*BM25_QUERY_TERMS)))
    tf_tbl = (tok.groupBy("doc_id", "term")
              .agg(F.count("*").alias("tf"), F.min("dl").alias("dl")))
    df_tbl = tf_tbl.groupBy("term").agg(
        F.count("*").alias("n_docs_with"))
    idf = F.log((F.lit(n_docs) - F.col("n_docs_with") + 0.5)
                / (F.col("n_docs_with") + 0.5) + 1.0)
    contrib = (idf * (F.col("tf") * (BM25_K1 + 1.0))
               / (F.col("tf")
                  + BM25_K1 * ((1.0 - BM25_B)
                               + (BM25_B * F.col("dl")) / F.lit(avgdl)))
               ).cast("decimal(25,12)")
    return (
        tf_tbl.join(F.broadcast(df_tbl), "term")
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_terms_matched"),
             F.round(F.sum("c").cast("double"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id").limit(10)
    )
