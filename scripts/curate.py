"""Curation entry point — the third spark-submit surface (alongside
run.py and detect_anomalies.py, deliberately separate jobs on their own
cadence): run the plans/curation.py DAG over a parquet documents table
and write the cleaned sink + fate ledger + metrics JSON.

Usage:
    zip -qr /tmp/sherlog_spark.zip sherlog_parser_spark -x '*__pycache__*'
    spark-submit --master 'local[8]' --py-files /tmp/sherlog_spark.zip \
        scripts/curate.py --input docs.parquet --out /tmp/curated \
        [--bench bench_docs.parquet] [--id-col doc_id] [--text-col text]
        [--nfc] [--ngram 4] [--min-tokens 10] [--commit-groups 4]
        [--no-resume]

Prints one JSON line: {"rows_kept": ..., "fates": {...}, "wall_sec": ...,
"docs_per_sec": ...}.  Resumable: a killed run re-invoked with the same
input/config skips committed bucket groups (fingerprint-validated
manifest, exactly like run.py).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--bench", default=None, help="benchmark docs parquet for decontamination")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--nfc", action="store_true", help="NFC-normalize text first")
    ap.add_argument("--ngram", type=int, default=4)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--commit-groups", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from sherlog_parser_spark.plans.curation import run_curation_pipeline
    from sherlog_parser_spark.session import get_spark

    spark = get_spark("sherlog-curate", master=args.master)
    try:
        docs = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.bench) if args.bench else None
        res = run_curation_pipeline(
            spark,
            docs,
            args.out,
            bench_docs=bench,
            n_buckets=args.n_buckets,
            commit_groups=args.commit_groups,
            resume=not args.no_resume,
            id_col=args.id_col,
            text_col=args.text_col,
            nfc=args.nfc,
            ngram=args.ngram,
            min_tokens=args.min_tokens,
        )
        print(
            json.dumps(
                {
                    "rows_kept": res.n_rows,
                    "fates": res.fate_counts,
                    "wall_sec": round(res.wall_sec, 3),
                    "docs_per_sec": round(sum(res.fate_counts.values()) / res.wall_sec, 1)
                    if res.wall_sec > 0
                    else None,
                    "cleaned_dir": res.cleaned_dir,
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
