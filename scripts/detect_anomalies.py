"""Incident-detection entry point — the reference's
``AnomalyIncidentDetector.detect_anomalies`` CLI analog
(/root/reference/src/core/anomaly_incidents.py:61-206): load a parquet
table with an embedding column, run prefilter-fallback → DBSCAN →
small-cluster ∨ per-cluster numeric z-score → OR-combine → ts-desc sort,
write/print the anomalous rows.

Usage:
    python scripts/detect_anomalies.py --input <parquet> [--out <parquet>]
        [--id-col vec_id] [--vec-col embedding] [--ts-col ts]
        [--numeric-cols value,latency] [--eps 0.3] [--min-samples 5]
        [--std-threshold 2.5] [--hours 4] [--limit 100000] [--master local[8]]

``--hours`` reproduces the reference's bounded lookback: only rows with
ts within the trailing N hours of the table's max ts are scanned (filter
pushed to the parquet scan); ``--limit`` is the reference's 100k cap.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--numeric-cols", default="")
    ap.add_argument("--eps", type=float, default=0.3)
    ap.add_argument("--min-samples", type=int, default=5)
    ap.add_argument("--std-threshold", type=float, default=2.5)
    ap.add_argument("--hours", type=float, default=None)
    ap.add_argument(
        "--window",
        default=None,
        help="time-bucket width (e.g. '1 hour'): cluster each bucket "
        "independently in parallel instead of one bounded lookback group",
    )
    ap.add_argument("--limit", type=int, default=100_000)
    ap.add_argument("--show", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sherlog_parser_spark.operators.anomaly import detect_anomaly_incidents
    from sherlog_parser_spark.session import get_spark

    spark = get_spark("sherlog-detect-anomalies", master=args.master)
    try:
        df = spark.read.parquet(args.input)
        if args.hours is not None:
            end = df.agg(F.max(args.ts_col)).collect()[0][0]
            df = df.filter(
                F.col(args.ts_col)
                >= F.lit(end) - F.expr(f"INTERVAL {int(args.hours * 3600)} SECONDS")
            )
        # most-recent rows first, matching the reference's time-ordered
        # 100k lookback cap (src/core/anomaly_incidents.py): a bare
        # limit() takes an ARBITRARY subset, so reruns could scan
        # different rows and flag different incidents
        df = df.orderBy(F.desc(args.ts_col)).limit(args.limit)
        window_col = None
        if args.window:
            window_col = "_win"
            df = df.withColumn(window_col, F.window(args.ts_col, args.window).start)
        numeric_cols = tuple(c for c in args.numeric_cols.split(",") if c)
        out = detect_anomaly_incidents(
            df,
            id_cols=(args.id_col,),
            vec_col=args.vec_col,
            numeric_cols=numeric_cols,
            ts_col=args.ts_col,
            eps=args.eps,
            min_samples=args.min_samples,
            numeric_std_threshold=args.std_threshold,
            window_col=window_col,
        )
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            rows = out.limit(args.show).collect()
            n = out.count()
            for r in rows:
                print(dict(r.asDict(), **{args.vec_col: "..."}))
        print(json.dumps({"anomalies": n, "scanned": df.count()}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
