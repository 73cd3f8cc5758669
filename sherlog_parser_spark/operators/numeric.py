"""Numeric analysis operators (SURVEY §2.4 A5-A7, A11; §2.5 J3, J5).

Semantics anchored to the reference's NumericAnomalyDetector
(cpp/src/numeric_analysis.cpp:35-67 linear-interpolated quantiles,
:333-423 grouped stats; src/core/numeric_analysis.py:94-125) and the
incident detector's z-score rule (src/core/anomaly_incidents.py:208-248,
|v-mean|/std > sigma) and small-cluster rule (:132-136).

Exact quantile parity requires Spark's exact ``percentile`` (linear
interpolation), NOT percentile_approx — pinned by the Catch2 values
(1..10 -> Q1 3.25, Q3 7.75; cpp/tests/test_main.cpp:89-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_numeric_stats(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """mean/std/median/Q1/Q3/IQR per group — linear-interpolated exact
    quantiles."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.percentile(v, 0.5).alias("median"),
        F.percentile(v, 0.25).alias("q1"),
        F.percentile(v, 0.75).alias("q3"),
        (F.percentile(v, 0.75) - F.percentile(v, 0.25)).alias("iqr"),
    )


def iqr_anomalies(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.5,
    fence_scale: int | None = None,
) -> DataFrame:
    """Robust IQR outliers per group: v < Q1 - k*IQR or v > Q3 + k*IQR
    (cpp/src/numeric_analysis.cpp robust path).

    ``fence_scale``: when set (e.g. 10**6), both the value and the fences
    are quantized to ``floor(x*scale + 0.5)`` integers before comparing.
    Cross-engine quantile implementations (Spark exact ``percentile`` vs
    DuckDB ``quantile_cont``) drift by ulps; a raw double landing exactly
    on a fence flips classification on 1-ulp drift (round-1 CORRECTNESS
    red row).  The house fixed-point rule makes the comparison stable.
    """
    stats = group_numeric_stats(df, group_cols, value_col)
    joined = df.join(F.broadcast(stats), group_cols)
    lo = F.col("q1") - k * F.col("iqr")
    hi = F.col("q3") + k * F.col("iqr")
    v = F.col(value_col)
    if fence_scale is not None:
        s = float(fence_scale)
        q = lambda c: F.floor(c * s + F.lit(0.5))  # noqa: E731
        v, lo, hi = q(v), q(lo), q(hi)
    return joined.withColumn("is_anomaly", (v < lo) | (v > hi))


def zscore_anomalies(df: DataFrame, group_cols: list[str], value_col: str, sigma: float = 2.5) -> DataFrame:
    """Per-group z-score anomalies: |v - mean| > sigma * std
    (src/core/anomaly_incidents.py:208-248).  groupBy-agg then broadcast
    join back (J3) — two jobs, no window shuffle."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("_mean"), F.stddev_samp(value_col).alias("_std")
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn(
            "is_anomaly",
            (F.col("_std") > 0)
            & (F.abs(F.col(value_col) - F.col("_mean")) > sigma * F.col("_std")),
        )
        .drop("_mean", "_std")
    )


def small_cluster_flags(df: DataFrame, cluster_col: str, min_samples: int) -> DataFrame:
    """A5/J5: flag rows in clusters smaller than min_samples via
    count + semi-join back."""
    small = (
        df.groupBy(cluster_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") < min_samples)
        .select(cluster_col)
    )
    return df.join(
        F.broadcast(small.withColumn("_small", F.lit(True))), cluster_col, "left"
    ).withColumn("is_small_cluster", F.coalesce(F.col("_small"), F.lit(False))).drop("_small")


def numeric_field_discovery(df: DataFrame, map_col: str, sample_n: int = 100, frac: float = 0.8) -> DataFrame:
    """A11: a map key is 'numeric' iff >= frac of a sample_n-row sample
    parses as float (src/core/anomaly_incidents.py:250-285)."""
    exploded = df.limit(sample_n).select(F.explode(F.col(map_col)).alias("k", "v"))
    return (
        exploded.groupBy("k")
        .agg(F.avg(F.col("v").try_cast("double").isNotNull().cast("int")).alias("numeric_frac"))
        .withColumn("is_numeric", F.col("numeric_frac") >= frac)
    )


def windowed_count_stats(df: DataFrame, ts_col: str = "ts", window: str = "1 hour") -> DataFrame:
    """A7: mean/std/p95 of per-window counts (src/analyze_anomalies.py:53-111)."""
    per_window = df.groupBy(F.window(ts_col, window).alias("w")).agg(F.count("*").alias("n"))
    return per_window.agg(
        F.avg("n").alias("mean_n"),
        F.stddev_samp("n").alias("std_n"),
        F.percentile("n", 0.95).alias("p95_n"),
    )
