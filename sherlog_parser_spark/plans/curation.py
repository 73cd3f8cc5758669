"""Training-data curation pipeline — the document-side sibling of the
parse pipeline (plans/pipeline.py), composing the curation operators
into ONE DAG with the same checkpointed-commit-group write discipline:

    scan documents
      → unicode NFC normalize      (Arrow-batched pandas UDF, optional)
      → line-level boilerplate cut (optional C4 rules, functions/
                                    linefilter.py — narrow map, no shuffle)
      → paragraph dedup            (optional CCNet corpus-global
                                    first-occurrence paragraph dedup,
                                    operators/dedup.paragraph_dedup)
      → exact dedup                (one shuffle on md5(text), min-id wins)
      → MinHash near-dedup         (banded LSH candidates → connected
                                    components → min-id representative)
      → SemDeDup semantic dedup    (optional, operators/semdedup.py —
                                    embedding-cluster-bucketed cosine
                                    groups, keep the centroid-farthest)
      → substring cuts             (cross-doc repeated n-gram spans
                                    merged + removed, Lee et al. 2022)
      → quality filter             (Gopher-style first-failing-rule)
      → LM filter                  (optional CCNet-style bigram-LM
                                    score threshold, operators/lm.py)
      → classifier filter          (optional distilled quality model,
                                    operators/classifier.py — hashed-
                                    gram counts + broadcast weight join)
      → DSIR filter                (optional importance selection vs a
                                    target-domain subset, operators/
                                    dsir.py — quantized integer scores)
      → PII redaction              (ordered regexp_replace chain)
      → decontamination            (broadcast benchmark shingle set)
      → bucketed, checkpointed parquet sink + per-doc fate ledger

Every stage is an existing tested operator (operators/dedup.py,
operators/components.py, functions/textstats.py, functions/pii.py);
this module contributes the composition, the drop-ledger, and the
resume machinery.  Reference lifecycle analog: the data-prep half of
LogProcessingPipeline.process_dataset (src/core/pipeline.py:52-130) —
its clean → dedup → filter loop over batches becomes a declarative DAG
over partitions.

Scale shape: the only data-sized shuffles are the dedup groupBys / the
shingle explodes inside the span detection — each individually
100-TB-shaped (see the operator docstrings).  The benchmark shingle set
is the one genuinely small side and is broadcast.  The ledger is one
row per input document with its fate; fate counts come from one
aggregation of the ledger, not per-stage count() jobs.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sherlog_parser_spark.checkpoint import CheckpointManifest
from sherlog_parser_spark.functions import pii as PII
from sherlog_parser_spark.functions import textstats as TS
from sherlog_parser_spark.operators.components import connected_components
from sherlog_parser_spark.operators.dedup import (
    minhash_dup_candidates,
    substring_dedup_cut,
)

_log = logging.getLogger(__name__)


def with_quality_reason(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "_reason",
    min_tokens: int = 10,
    max_dup_5gram_x1e4: int = 5000,
    max_top_2gram_char_x1e4: int = 1500,
) -> DataFrame:
    """Adds a Gopher-style first-failing-rule reason column:
    'too_short' | 'rep_5gram' | 'top_2gram' | 'keep'.  Thresholds
    compare fixed-point ints (house float rule).  A DataFrame transform
    (not a bare expression) because the shingle arrays MUST be bound as
    attributes before the HOF-heavy stats — an interpreted HOF lambda
    referencing an outer expression tree re-evaluates it per element
    (functions/textstats.py module note)."""
    bound = df.withColumn("_q_sh2", TS.word_shingles_expr(text_col, 2)).withColumn(
        "_q_sh5", TS.word_shingles_expr(text_col, 5)
    )

    def x1e4(c):
        return F.floor(c * 10000 + F.lit(0.5)).cast("long")

    reason = (
        F.when(TS.ws_token_count_expr(text_col) < min_tokens, "too_short")
        .when(x1e4(TS.dup_frac_expr("_q_sh5")) >= max_dup_5gram_x1e4, "rep_5gram")
        .when(
            x1e4(TS.top_ngram_char_frac_expr("_q_sh2", text_col))
            >= max_top_2gram_char_x1e4,
            "top_2gram",
        )
        .otherwise("keep")
    )
    return bound.withColumn(out_col, reason).drop("_q_sh2", "_q_sh5")


def curation_dag(
    docs: DataFrame,
    bench_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    nfc: bool = False,
    ngram: int = 4,
    span_min_docs: int = 2,
    minhash_k: int = 8,
    minhash_bands: int = 4,
    min_tokens: int = 10,
    quality_kwargs: dict | None = None,
    lm_filter: dict | None = None,
    line_filter_opts: dict | None = None,
    paragraph_dedup_opts: dict | None = None,
    semdedup_opts: dict | None = None,
    classifier_filter: dict | None = None,
    dsir_filter: dict | None = None,
    persist_intermediates: bool = True,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the curation DAG.  Returns ``(cleaned, ledger)``:

    * ``cleaned`` — (doc_id, text) survivors, substring-cut and
      PII-redacted;
    * ``ledger`` — one row per INPUT doc: (doc_id, fate) where fate is
      'kept' | 'line_filtered' | 'paragraph_filtered' | 'exact_dup' |
      'near_dup' | 'semantic_dup' | 'quality:<reason>' | 'lm_filtered' |
      'classifier_filtered' | 'dsir_filtered' | 'contaminated'.

    ``classifier_filter`` (optional): ``{"clf": QualityClassifier,
    "min_prob": p}`` — scores the quality survivors with the distilled
    model (operators/classifier.py, one narrow map) and drops docs
    whose quality probability is below ``p`` (fate
    'classifier_filtered').  Resume note: the model is plain floats,
    so its full content enters the run fingerprint — same weights
    resume cleanly, different weights wipe the prior sink.

    ``dsir_filter`` (optional): DSIR importance selection (Xie et al.
    2023) — ``{"target_predicate": Column-or-SQL-string,
    "min_avg_score_q": N[, "n_buckets": B]}``.  Trains the target
    hashed-ngram model on the quality survivors matching the
    predicate, the raw model on ALL quality survivors, and drops docs
    whose per-gram quantized importance ``floor(dsir_score_q /
    n_grams)`` falls below N (fate 'dsir_filtered').  Integer scores
    keep the threshold engine-exact, the lm_filter discipline.

    ``line_filter_opts`` (optional): kwargs for
    :func:`functions.linefilter.line_filter` — when given, the C4
    line-level boilerplate stage runs FIRST (the published order:
    line cleaning before dedup, so boilerplate lines can't glue
    otherwise-distinct documents into dup groups); docs whose
    ``doc_kept`` is false take fate 'line_filtered', survivors carry
    their ``kept_text`` forward.

    ``paragraph_dedup_opts`` (optional): kwargs for
    :func:`operators.dedup.paragraph_dedup` (e.g. ``{"normalize":
    True}``; pass ``{}`` for defaults) — CCNet's corpus-global
    paragraph dedup runs after the line stage and BEFORE document
    dedup (its text rewrites change document identity, so doc-level
    dedup must see the deduped text); docs whose every paragraph was
    a repeat take fate 'paragraph_filtered', survivors carry the
    rewritten text forward.

    ``semdedup_opts`` (optional): the SemDeDup semantic stage (Abbas
    et al. 2023) after lexical near-dedup — ``{"embeddings": frame
    with (id, vector), "centroids": list[list[float]] | int,
    "threshold": float[, "vec_col", "max_cluster_rows"]}``.  An int
    ``centroids`` trains a seeded KMeans quantizer
    (similarity.ivf_index) on the survivors' vectors; a list injects
    deterministic centers.  Docs whose vector loses its duplicate
    group take fate 'semantic_dup'; docs WITHOUT a vector pass
    through untouched (embeddings may cover only part of the corpus).

    ``bench_docs`` (optional): frame with ``text_col`` whose n-gram
    shingles define the decontamination blocklist (broadcast — real
    eval suites are MBs).

    ``lm_filter`` (optional): the CCNet stage (Wenzek et al. 2020 —
    filter web text by LM score).  ``{"min_avg_score_q": N[,
    "vocab_size": V]}`` trains the bigram LM (operators/lm.py) on the
    quality survivors and drops docs whose mean per-token quantized
    score ``floor(lm_score_q / n_tokens)`` falls below N (fate
    'lm_filtered').  The model's bigram/context tables are shared
    intermediates (consumed by the join AND the context derivation) and
    go through the same ``_reuse`` persistence as the fate sets."""
    from pyspark import StorageLevel

    def _reuse(frame: DataFrame) -> DataFrame:
        """Cache frames consumed by BOTH the cleaned branch and the fate
        ledger — without this the ledger's fate counts re-run the whole
        upstream DAG (including the iterative CC job).  MEMORY_AND_DISK,
        same spill discipline as run_pipeline's persist_parsed; the
        persisted frames are id-sets / survivor rows, never wider than
        the input.  Callers that finish all actions pass
        ``persist_registry`` and unpersist afterwards (run_curation_
        pipeline does) — otherwise the cached frames would accumulate
        across runs in one session."""
        if not persist_intermediates:
            return frame
        out = frame.persist(StorageLevel.MEMORY_AND_DISK)
        if persist_registry is not None:
            persist_registry.append(out)
        return out

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if nfc:
        nfc_udf = TS.make_nfc_normalize_udf()
        base = base.select("doc_id", nfc_udf("text").alias("text"))

    # optional C4 line-level boilerplate removal (narrow map)
    if line_filter_opts is not None:
        from sherlog_parser_spark.functions.linefilter import line_filter

        lf = _reuse(line_filter(base, "text", "doc_id", **line_filter_opts))
        line_losers = lf.filter(~F.col("doc_kept")).select("doc_id")
        base = lf.filter(F.col("doc_kept")).select(
            "doc_id", F.col("kept_text").alias("text")
        )
    else:
        line_losers = None

    # optional CCNet corpus-global paragraph dedup (first occurrence
    # by (doc_id, pos) wins; the rewrite happens before doc dedup)
    if paragraph_dedup_opts is not None:
        from sherlog_parser_spark.operators.dedup import paragraph_dedup

        pdres = _reuse(paragraph_dedup(base, "text", "doc_id", **paragraph_dedup_opts))
        para_losers = pdres.filter(~F.col("doc_kept")).select("doc_id")
        base = pdres.filter(F.col("doc_kept")).select(
            "doc_id", F.col("kept_text").alias("text")
        )
    else:
        para_losers = None

    # exact dedup: min-id winner per md5(text)
    winners = _reuse(
        base.select(F.md5("text").alias("_h"), "doc_id")
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = base.join(winners, "doc_id", "left_semi")

    # MinHash near-dedup: banded candidates → components → min-id rep
    pairs = minhash_dup_candidates(s1, "text", "doc_id", n=3, k=minhash_k, bands=minhash_bands)
    comps = connected_components(pairs)
    near_losers = _reuse(
        comps.filter(F.col("id") != F.col("component")).select(F.col("id").alias("doc_id"))
    )
    # s2 is consumed by both the span-detection and the cut pass;
    # an A/B in r6 measured persisting it slightly SLOWER (10.5 vs
    # 10.1s warm) than recomputing the cheap semi/anti joins from the
    # already-persisted winners/near_losers — left unpersisted on
    # purpose
    s2 = s1.join(near_losers, "doc_id", "left_anti")

    # optional SemDeDup semantic near-dedup over the lexical survivors
    if semdedup_opts is not None:
        from sherlog_parser_spark.operators.semdedup import semdedup

        vec_col = semdedup_opts.get("vec_col", "embedding")
        emb = semdedup_opts["embeddings"].join(
            s2.select("doc_id"), "doc_id", "left_semi"
        )
        cents = semdedup_opts["centroids"]
        if isinstance(cents, int):
            from sherlog_parser_spark.operators.similarity import ivf_index

            _, cents = ivf_index(emb, n_lists=cents, id_col="doc_id", vec_col=vec_col)
        sem = semdedup(
            emb,
            cents,
            threshold=float(semdedup_opts.get("threshold", 0.95)),
            id_col="doc_id",
            vec_col=vec_col,
            max_cluster_rows=int(semdedup_opts.get("max_cluster_rows", 100_000)),
            persist=False,
        )
        sem_losers = _reuse(sem.filter(~F.col("kept")).select("doc_id"))
        s2 = s2.join(sem_losers, "doc_id", "left_anti")
    else:
        sem_losers = None

    # substring cuts (cross-doc repeated n-grams among survivors)
    cut = substring_dedup_cut(s2, n=ngram, min_docs=span_min_docs)
    s3 = cut.select("doc_id", F.col("cleaned_text").alias("text"))

    # quality filter on the CUT text (a fully-cut doc fails too_short)
    s3q = _reuse(
        with_quality_reason(s3, "text", min_tokens=min_tokens, **(quality_kwargs or {}))
    )
    quality_losers = s3q.filter(F.col("_reason") != "keep").select("doc_id", "_reason")
    s4 = s3q.filter(F.col("_reason") == "keep").drop("_reason")

    # optional CCNet-style LM filter (train on the quality survivors,
    # drop low-mean-score docs); quantized-integer scores keep the
    # threshold comparison engine-exact
    if lm_filter is not None:
        from sherlog_parser_spark.operators.lm import lm_likelihood, train_bigram_lm

        min_avg = int(lm_filter["min_avg_score_q"])
        lm = train_bigram_lm(s4, "text", "doc_id", int(lm_filter.get("vocab_size", 256)))
        lm = lm._replace(bigrams=_reuse(lm.bigrams), contexts=_reuse(lm.contexts))
        avg_q = F.floor(
            F.col("lm_score_q").cast("double")
            / F.greatest(TS.ws_token_count_expr("text"), F.lit(1))
        ).cast("long")
        lm_losers = _reuse(
            lm_likelihood(s4, lm, "text", "doc_id")
            .join(s4, "doc_id")
            .filter(avg_q < min_avg)
            .select("doc_id")
        )
        s4 = s4.join(lm_losers, "doc_id", "left_anti")
    else:
        lm_losers = None

    # optional distilled-classifier filter (FineWeb-Edu pattern): the
    # model was trained OFFLINE on an expensively-labeled sample; here
    # it is one bucket-count shuffle + a broadcast weight join + a
    # threshold (plain-float model — closure-safe by construction)
    if classifier_filter is not None:
        from sherlog_parser_spark.operators.classifier import classifier_scores

        min_prob = float(classifier_filter["min_prob"])
        clf_losers = _reuse(
            classifier_scores(s4, classifier_filter["clf"], "text", "doc_id")
            .filter(F.col("quality_prob") < min_prob)
            .select("doc_id")
        )
        s4 = s4.join(clf_losers, "doc_id", "left_anti")
    else:
        clf_losers = None

    # optional DSIR importance selection vs a target-domain subset
    if dsir_filter is not None:
        from sherlog_parser_spark.operators.dsir import dsir_scores, train_dsir

        pred = dsir_filter["target_predicate"]
        if isinstance(pred, str):
            pred = F.expr(pred)
        min_avg = int(dsir_filter["min_avg_score_q"])
        model = train_dsir(
            s4,
            s4.filter(pred),
            "text",
            n_buckets=int(dsir_filter.get("n_buckets", 4096)),
        )
        model = model._replace(target_q=_reuse(model.target_q), raw_q=_reuse(model.raw_q))
        avg_q = F.floor(
            F.col("dsir_score_q").cast("double")
            / F.greatest(F.col("n_grams"), F.lit(1))
        ).cast("long")
        dsir_losers = _reuse(
            dsir_scores(s4, model, "text", "doc_id")
            .filter(avg_q < min_avg)
            .select("doc_id")
        )
        s4 = s4.join(dsir_losers, "doc_id", "left_anti")
    else:
        dsir_losers = None

    # PII redaction (pure JVM regexp chain)
    s5 = s4.select("doc_id", PII.redact_pii_expr("text").alias("text"))

    # decontamination vs the benchmark shingle blocklist
    if bench_docs is not None:
        bench_sh = (
            bench_docs.select(
                F.explode(TS.word_shingles_expr(text_col, ngram)).alias("_s")
            )
            .select(F.md5("_s").alias("_h"))
            .distinct()
        )
        doc_sh = s5.select(
            "doc_id", F.explode(TS.word_shingles_expr("text", ngram)).alias("_s")
        ).select("doc_id", F.md5("_s").alias("_h"))
        contaminated = _reuse(
            doc_sh.join(F.broadcast(bench_sh), "_h").select("doc_id").distinct()
        )
        s6 = s5.join(contaminated, "doc_id", "left_anti")
    else:
        contaminated = None
        s6 = s5

    # fate ledger: one row per input doc, first-applicable fate
    # (exact losers are counted among the LINE-FILTER SURVIVORS — a doc
    # dropped by the line stage is 'line_filtered', never 'exact_dup')
    exact_losers = base.select("doc_id").join(winners, "doc_id", "left_anti").select(
        "doc_id", F.lit("exact_dup").alias("fate")
    )
    if line_losers is not None:
        exact_losers = exact_losers.unionByName(
            line_losers.select("doc_id", F.lit("line_filtered").alias("fate"))
        )
    if para_losers is not None:
        exact_losers = exact_losers.unionByName(
            para_losers.select("doc_id", F.lit("paragraph_filtered").alias("fate"))
        )
    ledger = exact_losers.unionByName(
        near_losers.select("doc_id", F.lit("near_dup").alias("fate"))
    )
    if sem_losers is not None:
        ledger = ledger.unionByName(
            sem_losers.select("doc_id", F.lit("semantic_dup").alias("fate"))
        )
    ledger = ledger.unionByName(
        quality_losers.select(
            "doc_id", F.concat(F.lit("quality:"), F.col("_reason")).alias("fate")
        )
    )
    if lm_losers is not None:
        ledger = ledger.unionByName(
            lm_losers.select("doc_id", F.lit("lm_filtered").alias("fate"))
        )
    if clf_losers is not None:
        ledger = ledger.unionByName(
            clf_losers.select("doc_id", F.lit("classifier_filtered").alias("fate"))
        )
    if dsir_losers is not None:
        ledger = ledger.unionByName(
            dsir_losers.select("doc_id", F.lit("dsir_filtered").alias("fate"))
        )
    if contaminated is not None:
        ledger = ledger.unionByName(
            contaminated.select("doc_id", F.lit("contaminated").alias("fate"))
        )
    kept = s6.select("doc_id", F.lit("kept").alias("fate"))
    ledger = ledger.unionByName(kept)
    return s6, ledger


@dataclass
class CurationResult:
    cleaned_dir: str
    manifest_path: str
    n_rows: int
    fate_counts: dict
    wall_sec: float


def run_curation_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    bench_docs: DataFrame | None = None,
    n_buckets: int = 8,
    commit_groups: int = 4,
    resume: bool = True,
    persist_cleaned: bool = True,
    **dag_kwargs,
) -> CurationResult:
    """Run the curation DAG with the parse pipeline's commit discipline:
    the cleaned sink is written in ``commit_groups`` disjoint
    doc-bucket groups under dynamic partition overwrite, each group
    idempotent, with (rows, bit_xor fingerprint) observed ON the write
    job (no extra pass); a killed run resumes by skipping committed
    groups (checkpoint.CheckpointManifest, fingerprint-validated like
    plans/pipeline.run_pipeline)."""
    import shutil

    from sherlog_parser_spark.plans.pipeline import _run_fingerprint

    t_start = time.time()
    cleaned_dir = os.path.join(out_dir, "cleaned")
    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    # bench_docs is part of the run identity: resuming with a DIFFERENT
    # decontamination blocklist would silently mix bucket groups curated
    # under different rules (r4 review) — normalize its plan the same
    # way _run_fingerprint normalizes the input's
    import re as _re

    def _norm_plan(frame):
        return _re.sub(r"#\d+", "#", frame._jdf.queryExecution().analyzed().toString())

    bench_plan = _norm_plan(bench_docs) if bench_docs is not None else None

    def _fp_value(v):
        """Auxiliary DataFrames inside option dicts (e.g. semdedup's
        embeddings) must contribute their normalized PLAN to the run
        identity — str(DataFrame) is schema-only and would let two
        different embedding tables resume into each other (the r4
        bench_docs lesson)."""
        if isinstance(v, DataFrame):
            return _norm_plan(v)
        if isinstance(v, dict):
            return {k: _fp_value(x) for k, x in sorted(v.items())}
        return str(v)

    run_fp = _run_fingerprint(
        docs,
        {"kind": "curation", "n_buckets": n_buckets, "commit_groups": commit_groups,
         "bench_plan": bench_plan,
         **{k: str(_fp_value(v)) for k, v in dag_kwargs.items()}},
    )
    if resume:
        manifest = CheckpointManifest.load(manifest_path)
        stored_fp = manifest.run_fingerprint()
        if (manifest.entries or stored_fp is not None) and stored_fp != run_fp:
            _log.warning(
                "curation manifest at %s from a different input/config "
                "(%s != %s); discarding sink and manifest",
                manifest_path, stored_fp, run_fp,
            )
            shutil.rmtree(cleaned_dir, ignore_errors=True)
            if os.path.exists(manifest_path):
                os.remove(manifest_path)
            manifest = CheckpointManifest(manifest_path)
    else:
        shutil.rmtree(cleaned_dir, ignore_errors=True)
        if os.path.exists(manifest_path):
            os.remove(manifest_path)
        manifest = CheckpointManifest(manifest_path)
    if manifest.run_fingerprint() is None:
        manifest.commit_run(run_fp)

    # Scale-adaptive scan fan-out (guide §2.2, r6): a small local input
    # arrives as ONE parquet split, so every narrow stage of the DAG
    # (line rules, shingle explodes, quality exprs) would run on a
    # single core.  Round-robin to defaultParallelism, a no-op branch
    # whenever the scan already has that many splits (any real-scale
    # input).  The DAG is partition-invariant by construction — pinned
    # by the multi-executor parity check (local-cluster[4,4] ==
    # local[16] fates + cleaned-sink fingerprint).  Applied AFTER the
    # run fingerprint so resume identity is unchanged.
    n_par = spark.sparkContext.defaultParallelism
    fan_docs = docs
    if fan_docs.rdd.getNumPartitions() < n_par:
        fan_docs = fan_docs.repartition(n_par)

    dag_persists: list = []
    cleaned, ledger = curation_dag(
        fan_docs, bench_docs=bench_docs, persist_registry=dag_persists, **dag_kwargs
    )
    bucketed = cleaned.withColumn(
        "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    )
    if persist_cleaned:
        # the DAG above this point includes the iterative CC job and two
        # shingle explodes; persisting the survivors turns per-group
        # recomputation of the whole chain into one pass
        from pyspark import StorageLevel

        bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)

    total_rows = 0
    for g in range(commit_groups):
        unit = f"bucket_group={g}"
        if manifest.is_committed(unit):
            total_rows += manifest.entries[unit]["rows"]
            continue
        t0 = time.time()
        obs = Observation(f"curate_g{g}")
        sub = bucketed.filter(
            F.pmod(F.col("doc_bucket"), F.lit(commit_groups)) == g
        ).observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.xxhash64("doc_id", "text")).alias("fp"),
        )
        (
            sub.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("parquet.enable.dictionary", "false")
            .partitionBy("doc_bucket")
            .parquet(cleaned_dir)
        )
        rows = int(obs.get["rows"])
        total_rows += rows
        manifest.commit(unit, rows, str(obs.get["fp"]), cleaned_dir, time.time() - t0)

    fate_counts = {
        r["fate"]: r["n"]
        for r in ledger.groupBy("fate").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if persist_cleaned:
        bucketed.unpersist()
    for frame in dag_persists:
        frame.unpersist()
    wall = time.time() - t_start
    with open(os.path.join(out_dir, "curation_metrics.json"), "w") as f:
        json.dump(
            {
                "rows_kept": total_rows,
                "fates": fate_counts,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(sum(fate_counts.values()) / wall, 1)
                if wall > 0
                else None,
                "manifest": manifest.metrics(),
            },
            f,
            indent=2,
        )
    return CurationResult(
        cleaned_dir=cleaned_dir,
        manifest_path=manifest_path,
        n_rows=total_rows,
        fate_counts=fate_counts,
        wall_sec=wall,
    )
