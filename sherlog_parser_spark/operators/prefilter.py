"""Volume prefilter operators (SURVEY §2.11 X1/X2).

X1 stratified level sampling (src/core/log_prefilter.py:13-88):
keep ALL priority levels (ERROR/CRITICAL), sample the rest per level at
fixed ratios with a per-level floor of ``min_per_level`` rows.  Exact-n
parity with pandas' seeded ``sample`` is impossible across RNGs
(SURVEY §7.3.3); we define membership deterministically by hash order —
counts are exact, membership is stable across runs/cluster sizes.

X2 duplicate capping (src/core/log_prefilter.py:90-142): for each
over-duplicated message keep first + last + a deterministic sample of
the middle, cap = max_duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RATIOS = {"INFO": 0.1, "DEBUG": 0.05, "WARNING": 0.5}
DEFAULT_RATIO = 0.1
PRIORITY_LEVELS = ("ERROR", "CRITICAL")


def stratified_level_sample(
    df: DataFrame,
    level_col: str = "level",
    ratios: dict[str, float] | None = None,
    min_per_level: int = 10,
    seed: int = 42,
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """X1: per-level target = max(min_per_level, ceil(n_level * ratio));
    priority levels are kept in full.  Selection = first target rows in
    seeded-hash order (deterministic, partition-count independent)."""
    ratios = {**DEFAULT_RATIOS, **(ratios or {})}
    ratio_expr = F.lit(DEFAULT_RATIO)
    for lvl, r in ratios.items():
        ratio_expr = F.when(F.col(level_col) == lvl, F.lit(r)).otherwise(ratio_expr)

    counts = df.groupBy(level_col).agg(F.count("*").alias("_n_level"))
    w = Window.partitionBy(level_col).orderBy(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in order_cols]), *order_cols
    )
    ranked = (
        df.join(F.broadcast(counts), level_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "_target",
            F.greatest(F.lit(min_per_level), F.ceil(F.col("_n_level") * ratio_expr)),
        )
    )
    kept = ranked.filter(
        F.col(level_col).isin(*PRIORITY_LEVELS) | (F.col("_rk") <= F.col("_target"))
    )
    return kept.drop("_rk", "_target", "_n_level")


def cap_duplicates(
    df: DataFrame,
    text_col: str = "text",
    max_duplicates: int = 5,
    seed: int = 42,
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """X2: per duplicated message keep the first, the last, and a
    deterministic hash-sample of (max_duplicates - 2) middle rows."""
    w = Window.partitionBy(text_col).orderBy(*order_cols)
    marked = df.withColumn("_cnt", F.count("*").over(Window.partitionBy(text_col))).withColumn(
        "_rn", F.row_number().over(w)
    )
    is_middle = (F.col("_rn") != 1) & (F.col("_rn") != F.col("_cnt"))
    # rank middles first (deterministic hash order), so ranks 1..cnt-2 are
    # exactly the middle rows — keep max_duplicates-2 of them
    marked = marked.withColumn(
        "_mrk",
        F.row_number().over(
            Window.partitionBy(text_col).orderBy(
                is_middle.cast("int").desc(), F.xxhash64(F.lit(seed), F.col("_rn")), F.col("_rn")
            )
        ),
    )
    keep = (
        (F.col("_cnt") <= max_duplicates)
        | (F.col("_rn") == 1)
        | (F.col("_rn") == F.col("_cnt"))
        | (is_middle & (F.col("_mrk") <= max_duplicates - 2))
    )
    return marked.filter(keep).drop("_cnt", "_rn", "_mrk")
