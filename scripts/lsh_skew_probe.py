#!/usr/bin/env python
"""LSH band-bucket skew probe (VERDICT r13 item 6).

The dedup family's scale story assumes band buckets stay bounded; on a
DUPLICATE-HEAVY corpus they don't — one template crawled m times puts
all m copies in the same bucket of every band, and the bucket
self-join emits m(m-1)/2 candidate rows. This probe:

1. builds a skewed corpus: ~10x the sf0.1 documents (50k docs), where
   20% are light perturbations of ONE hot template (the crawl-dup
   shape) and the rest are the real corpus tiled with per-copy edits;
2. measures the band-bucket size distribution and the hottest bucket's
   implied candidate-pair count vs corpus size;
3. A/Bs candidate volume and wall with the hot-bucket star cap
   (operators.dedup.LSH_BUCKET_CAP) against the uncapped all-pairs
   join, and checks the verified-pair CLUSTERING is preserved (the hot
   template's copies still resolve into one component through the
   hub).

Usage: python scripts/lsh_skew_probe.py [--mult 10] [--hot-frac 0.2]
Prints a JSON blob for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.operators import dedup as dd
    from house_price_etl_pipeline_spark.session import get_spark
    from house_price_etl_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="lsh_skew_probe")
    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text")
    n_base = docs.count()
    n_total = n_base * args.mult
    n_hot = int(n_total * args.hot_frac)

    # hot template: the longest doc, perturbed per copy by appending
    # one unique token (Jaccard stays ~1; every copy lands in the same
    # band buckets). The cold tile perturbs harder (three swapped-in
    # unique tokens) so tiles don't all collapse into one bucket.
    hot_text = (docs.orderBy(F.length("text").desc(), "doc_id")
                .limit(1).collect()[0]["text"])
    hot = spark.range(n_hot).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit(hot_text), F.lit(" zz"),
                 F.col("id").cast("string")).alias("text"))
    tiles = []
    for rep in range(args.mult - 1):
        tiles.append(docs.select(
            (F.col("doc_id") + (rep + 1) * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" q{rep}a q{rep}b q{rep}c "),
                     F.col("doc_id").cast("string")).alias("text")))
    corpus = docs
    for t in tiles:
        corpus = corpus.unionByName(t)
    corpus = corpus.unionByName(hot).localCheckpoint(eager=True)
    out: dict = {"n_docs": corpus.count(), "n_hot_copies": n_hot,
                 "bucket_cap": dd.LSH_BUCKET_CAP}

    tok = corpus.select(
        "doc_id", F.split("text", " ").alias("ws")).select(
        "doc_id", F.explode(dd.shingle_expr(F.col("ws"), 3)).alias("t"))
    sig = dd.minhash_signatures(tok).localCheckpoint(eager=True)

    # bucket-size distribution (the skew measurement itself)
    rows_per = dd.LSH_ROWS
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band_id"),
                 F.xxhash64(*[F.col(f"h{b * rows_per + r}")
                              for r in range(rows_per)]).alias("band_hash"))
        for b in range(dd.LSH_BANDS)])
    banded = (sig.select("doc_id", F.explode(band_structs).alias("band"))
              .select("doc_id", "band.band_id", "band.band_hash"))
    dist = (banded.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("m"))
            .agg(F.max("m").alias("max_bucket"),
                 F.sum(F.col("m") * (F.col("m") - 1) / 2)
                 .alias("uncapped_pairs"),
                 F.sum(F.when(F.col("m") > dd.LSH_BUCKET_CAP,
                              F.col("m") - 1).otherwise(
                     F.col("m") * (F.col("m") - 1) / 2))
                 .alias("capped_pairs"),
                 F.count("*").alias("n_buckets")).collect()[0])
    out["max_bucket"] = int(dist["max_bucket"])
    out["n_buckets"] = int(dist["n_buckets"])
    out["uncapped_candidate_pairs"] = int(dist["uncapped_pairs"])
    out["capped_candidate_pairs"] = int(dist["capped_pairs"])

    def run(cap: int, label: str) -> None:
        t0 = time.perf_counter()
        cand = dd.lsh_candidate_pairs(sig, bucket_cap=cap)
        n_cand = cand.count()
        t1 = time.perf_counter()
        ver = dd.verify_candidate_pairs(cand, tok).localCheckpoint(
            eager=True)
        n_ver = ver.count()
        t2 = time.perf_counter()
        # does the hot cluster stay ONE component? (hub star + CC)
        cc = dd.connected_components(ver)
        hot_labels = (cc.filter(F.col("node") >= 10_000_000)
                      .select("label").distinct().count())
        out[label] = {
            "candidates": n_cand, "verified": n_ver,
            "candidate_wall_s": round(t1 - t0, 2),
            "verify_wall_s": round(t2 - t1, 2),
            "hot_components": int(hot_labels),
        }

    run(dd.LSH_BUCKET_CAP, "with_cap")
    run(1 << 31, "uncapped")
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
