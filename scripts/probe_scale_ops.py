"""100×-bench-scale probes for the round-5 curation/selection operators
(SemDeDup, DSIR, line filter, paragraph dedup, packed token sequences).

Replication protocol (BASELINE.md convention): the sf0.1 documents /
embeddings tables replicated N× with DISTINCT ids; text ops get
per-copy-identical text (so invariants — per-copy score equality,
footer-dedup counts — are predictable), embeddings get tiny
deterministic per-copy perturbations (so copies land in the same
KMeans cluster and form semantic-dup groups on purpose).

Usage: python scripts/probe_scale_ops.py [--copies 100] [--which all]
Prints one JSON line per probe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def docs_frame(spark, sf_dir, copies):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.selectExpr("max(doc_id)").collect()[0][0] + 1
    c = spark.range(copies).withColumnRenamed("id", "copy")
    return (
        docs.crossJoin(c)
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * F.lit(int(n)))
        .drop("copy")
    ), n


def emb_frame(spark, sf_dir, copies):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.selectExpr("max(vec_id)").collect()[0][0] + 1
    c = spark.range(copies).withColumnRenamed("id", "copy")
    # per-copy deterministic wobble in ONE coordinate: copies of the
    # same base vector stay ~parallel (cos ~1) -> planted dup groups
    wob = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == 0, x + F.col("copy").cast("float") * F.lit(1e-4)).otherwise(x),
    )
    return (
        emb.crossJoin(c)
        .withColumn("vec_id", F.col("vec_id") + F.col("copy") * F.lit(int(n)))
        .withColumn("embedding", wob)
        .drop("copy")
    ), n


def probe_text(spark, sf_dir, copies):
    from sherlog_parser_spark.functions.linefilter import line_filter
    from sherlog_parser_spark.operators.dedup import paragraph_dedup

    docs, base_n = docs_frame(spark, sf_dir, copies)
    # multi-line rebuild: every 6th space becomes a newline (narrow map)
    ml = docs.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), r"((\S+ ){6})", "$1\n"),
            F.lit("\nvisit our homepage today."),
        ).alias("text"),
    )
    t0 = time.time()
    lf = line_filter(ml, require_terminal=False, min_words=3)
    lf_stats = lf.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    t_lf = time.time() - t0
    t0 = time.time()
    pd_ = paragraph_dedup(ml)
    pd_stats = pd_.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_paragraphs").alias("paras"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    t_pd = time.time() - t0
    print(json.dumps({
        "probe": "line_filter",
        "docs": lf_stats["docs"], "lines": lf_stats["lines"],
        "kept_lines": lf_stats["kept"], "wall_sec": round(t_lf, 1),
        "docs_per_sec": round(lf_stats["docs"] / t_lf, 1),
    }))
    print(json.dumps({
        "probe": "paragraph_dedup",
        "docs": pd_stats["docs"], "paragraphs": pd_stats["paras"],
        "kept_paragraphs": pd_stats["kept"], "wall_sec": round(t_pd, 1),
        "docs_per_sec": round(pd_stats["docs"] / t_pd, 1),
    }))


def probe_dsir(spark, sf_dir, copies):
    from sherlog_parser_spark.operators.dsir import dsir_scores, train_dsir

    docs, base_n = docs_frame(spark, sf_dir, copies)
    t0 = time.time()
    model = train_dsir(docs, docs.filter(F.col("lang") == "en"))
    t_train = time.time() - t0
    t0 = time.time()
    scored = dsir_scores(docs, model)
    # invariant: copies share text -> per-copy score sets identical
    per_copy = (
        scored.withColumn("base", F.col("doc_id") % F.lit(int(base_n)))
        .groupBy("base")
        .agg(F.countDistinct("dsir_score_q").alias("k"))
        .agg(F.max("k").alias("max_distinct"), F.count(F.lit(1)).alias("bases"))
        .collect()[0]
    )
    t_score = time.time() - t0
    n = base_n * copies
    print(json.dumps({
        "probe": "dsir", "docs": n,
        "train_sec": round(t_train, 1), "score_sec": round(t_score, 1),
        "docs_per_sec_score": round(n / t_score, 1),
        "per_base_distinct_scores_max": per_copy["max_distinct"],
    }))


def probe_semdedup(spark, sf_dir, copies, n_lists=64):
    from sherlog_parser_spark.operators.semdedup import semdedup
    from sherlog_parser_spark.operators.similarity import ivf_index

    emb, base_n = emb_frame(spark, sf_dir, copies)
    emb = emb.persist()
    n = emb.count()
    t0 = time.time()
    assigned, centroids = ivf_index(emb, n_lists=n_lists, id_col="vec_id")
    t_km = time.time() - t0
    t0 = time.time()
    out = semdedup(
        emb,
        centroids,
        threshold=0.999,
        assigned=assigned,
        pair_impl="numpy",
        max_cluster_rows=max(50_000, 4 * n // n_lists),
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).collect()[0]
    t_dd = time.time() - t0
    out.release()
    emb.unpersist()
    print(json.dumps({
        "probe": "semdedup", "vectors": n, "n_lists": n_lists,
        "kmeans_sec": round(t_km, 1), "dedup_sec": round(t_dd, 1),
        "kept": stats["kept"],
        "vectors_per_sec": round(n / t_dd, 1),
    }))


def probe_packed(spark, sf_dir, copies):
    from sherlog_parser_spark.operators.bpe import bpe_encode, train_bpe
    from sherlog_parser_spark.operators.sharding import pack_array_sequences

    docs, _ = docs_frame(spark, sf_dir, copies)
    # train on the base table only (merges are scale-invariant anyway)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    model = train_bpe(base, n_merges=30)
    t0 = time.time()
    enc = bpe_encode(docs, model.merges)
    packed = pack_array_sequences(enc, "bpe_tokens", "doc_id", seq_len=2048)
    stats = packed.agg(
        F.count(F.lit(1)).alias("seqs"),
        F.sum("n_tokens").alias("toks"),
        F.sum((F.col("n_tokens") == 2048).cast("long")).alias("full"),
    ).collect()[0]
    wall = time.time() - t0
    packed.release()
    print(json.dumps({
        "probe": "packed_token_sequences",
        "sequences": stats["seqs"], "tokens": stats["toks"],
        "full_sequences": stats["full"], "wall_sec": round(wall, 1),
        "tokens_per_sec": round(stats["toks"] / wall, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--which", default="all",
                    choices=["all", "text", "dsir", "semdedup", "packed"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from sherlog_parser_spark.session import get_spark

    spark = get_spark("probe-scale-ops", master=args.master)
    try:
        if args.which in ("all", "text"):
            probe_text(spark, args.sf_dir, args.copies)
        if args.which in ("all", "dsir"):
            probe_dsir(spark, args.sf_dir, args.copies)
        if args.which in ("all", "semdedup"):
            probe_semdedup(spark, args.sf_dir, args.copies)
        if args.which in ("all", "packed"):
            probe_packed(spark, args.sf_dir, args.copies)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
