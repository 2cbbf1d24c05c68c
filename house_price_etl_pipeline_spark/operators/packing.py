"""Tokenize → vocabulary → id-encode → pack into fixed context windows:
the concrete LLM training-data preparation chain (north-star extension
beyond SURVEY §2 — the step after dedup/quality filtering, before
training).

Scale design:
- **vocab build**: the global frequency rank runs on the AGGREGATED
  token table (vocab-sized, ≪ corpus), so the single-partition ranking
  window touches thousands of rows no matter how many documents exist;
- **encode**: token→id is a broadcast join of the exploded corpus
  against the (small) vocab — the only corpus-scale shuffle is the
  per-doc regroup, keyed on doc_id;
- **packing**: the context-window manifest is computed from per-doc
  token COUNTS only (offset arithmetic + a tiny per-chunk rollup) —
  tokens are never exploded, so packing cost scales with the number of
  documents, not the number of tokens. The one global cumulative sum
  runs over per-doc lengths; on a real cluster that prefix-sum is the
  classic two-phase (per-partition subtotal + offset) pattern, which is
  exactly what Spark's window over a range-partitioned sort performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

CONTEXT_LEN = 128


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t"))


def vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, token_id, freq): ids assigned by frequency rank (ties by
    token text) — the id assignment every tokenizer publishes."""
    counts = _tok(spark, sf_dir).groupBy("t").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), "t")
    return counts.select(F.col("t").alias("token"), "freq",
                         F.row_number().over(w).cast("int").alias("token_id"))


@register(
    "text_vocab_build",
    oracle="""
    SELECT token, CAST(freq AS BIGINT) AS freq,
           CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER)
             AS token_id
    FROM (
      SELECT t AS token, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY t
    )
    ORDER BY token_id
    """,
)
def text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab(spark, sf_dir).select("token", "freq", "token_id").orderBy("token_id")


@register(
    "text_encode_ids",
    oracle="""
    WITH v AS (
      SELECT t AS token,
             CAST(row_number() OVER (ORDER BY freq DESC, t) AS INTEGER) AS token_id
      FROM (
        SELECT t, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t
      )
    ),
    tok AS (
      SELECT doc_id,
             generate_subscripts(l, 1) - 1 AS pos,
             unnest(l) AS t
      FROM (SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE doc_id < 300)
    )
    SELECT tok.doc_id,
           string_agg(CAST(v.token_id AS VARCHAR), ',' ORDER BY tok.pos) AS ids,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM tok JOIN v ON tok.t = v.token
    GROUP BY tok.doc_id ORDER BY tok.doc_id
    """,
)
def text_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded as token-id sequences (order-preserving):
    exploded corpus ⨝ broadcast vocab, regrouped per doc with positions
    restored via sort_array over (pos, id) structs — no assumption that
    collect_list preserves order. The id sequence is CSV-serialized so
    the output schema is scalar-only."""
    v = vocab(spark, sf_dir).select("token", "token_id")
    tok = _tok(spark, sf_dir).filter(F.col("doc_id") < 300)
    enc = (
        tok.join(F.broadcast(v), tok.t == v.token)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(",", F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: s.token_id.cast("string"),
            )).alias("ids"),
            F.count("*").alias("n_tokens"),
        )
    )
    return enc.orderBy("doc_id")


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    offs AS (
      SELECT doc_id, n,
             CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
                  AS BIGINT) AS start_off
      FROM lens
    ),
    spans AS (
      SELECT doc_id, n, start_off, start_off + n AS end_off,
             unnest(range(CAST(start_off // {CONTEXT_LEN} AS BIGINT),
                          CAST((start_off + n - 1) // {CONTEXT_LEN} + 1 AS BIGINT)))
               AS chunk_id
      FROM offs
    )
    SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(SUM(least(end_off, (chunk_id + 1) * {CONTEXT_LEN})
                    - greatest(start_off, chunk_id * {CONTEXT_LEN})) AS BIGINT)
             AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM spans GROUP BY chunk_id ORDER BY chunk_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: concatenate all docs (in doc_id order)
    into one token stream and cut fixed CONTEXT_LEN-token training
    windows. Computed purely from per-doc lengths: global start offsets
    via a TWO-PHASE prefix sum, each doc exploded only to the CHUNKS it
    overlaps, overlap arithmetic per (doc, chunk) — every window is
    full except the last, and no token is ever materialized.

    The prefix sum is the scale-critical step: a bare
    ``Window.orderBy(doc_id)`` (no partitionBy) funnels every per-doc
    row through ONE task — the global-ORDER-BY anti-pattern
    curation.py's depth-binning deliberately avoids. Instead doc_ids
    are range-bucketed with a DETERMINISTIC width (so no sampling
    nondeterminism between the totals job and the window job), phase 1
    aggregates one subtotal per bucket (a bucket-count-sized collect),
    and phase 2 runs the running sum as a PER-BUCKET window plus the
    broadcast cumulative offset of all earlier buckets — the window
    never sees more than one bucket's rows in a task."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))

    # bucket count = max(core count, data-scaled): a pure core-count
    # bucket grid leaves each per-bucket window task with corpus/cores
    # rows at 100 TB — the data-scaled term bounds rows/bucket while
    # the core floor keeps the local spread (VERDICT r14 item 9).
    # Results are bucket-count-independent: buckets only split the
    # prefix-sum work, the (doc_id) total order is global.
    from ..sources.tables import scaled_partitions
    par = max(spark.sparkContext.defaultParallelism,
              scaled_partitions(spark, sf_dir, "documents",
                                rows_per_partition=100_000))
    bounds = lens.agg(F.min("doc_id").alias("lo"),
                      F.max("doc_id").alias("hi")).collect()[0]
    if bounds.lo is None:
        return lens.select(
            F.col("doc_id").alias("chunk_id"), F.col("n").alias("n_tokens"),
            F.col("n").alias("n_docs"), F.col("doc_id").alias("first_doc"),
            F.col("doc_id").alias("last_doc")).limit(0)
    width = max(1, (int(bounds.hi) - int(bounds.lo)) // par + 1)
    # integer DIV on longs (ADVICE r9): a double-division quotient stops
    # being exact past 2^53 doc_id spans and an int cast caps bucket
    # headroom at 2^31 — DIV keeps the deterministic width-based ranges
    # exact over the full long domain (doc_id - lo >= 0, so truncation
    # and floor agree)
    bucket = F.expr(
        f"(doc_id - {int(bounds.lo)}L) DIV {width}L").alias("_b")
    lens = lens.withColumn("_b", bucket)
    subtotals = {int(r._b): int(r.t) for r in
                 lens.groupBy("_b").agg(F.sum("n").alias("t")).collect()}
    running, offsets = 0, {}
    for b in range(par + 1):
        offsets[b] = running
        running += subtotals.get(b, 0)
    off_map = F.create_map(
        *[F.lit(x).cast("long") for kv in offsets.items() for x in kv])
    w = (Window.partitionBy("_b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offs = lens.withColumn(
        "start_off",
        F.sum("n").over(w) - F.col("n")
        + F.element_at(off_map, F.col("_b")))
    spans = offs.select(
        "doc_id", "n", "start_off",
        (F.col("start_off") + F.col("n")).alias("end_off"),
        F.explode(F.sequence(
            F.floor(F.col("start_off") / CONTEXT_LEN),
            F.floor((F.col("start_off") + F.col("n") - 1) / CONTEXT_LEN),
        )).alias("chunk_id"),
    )
    overlap = (
        F.least(F.col("end_off"), (F.col("chunk_id") + 1) * CONTEXT_LEN)
        - F.greatest(F.col("start_off"), F.col("chunk_id") * CONTEXT_LEN)
    )
    return (
        spans.groupBy("chunk_id")
        .agg(F.sum(overlap).cast("long").alias("n_tokens"),
             F.count("*").alias("n_docs"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"))
        .orderBy("chunk_id")
    )
