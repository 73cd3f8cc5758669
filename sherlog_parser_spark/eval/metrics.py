"""Evaluation metrics (SURVEY §5, reference src/eval/metrics.py).

All metrics take one DataFrame of per-line results:

    (log_id, truth_template, pred_template)

and are computed distributed, shuffle-light:

* GA — the reference's O(n^2) pair loop (metrics.py:32-75) re-expressed
  through the contingency table: with n_ij = |truth group i ∩ pred
  group j|, agreeing pairs = C(n,2) - Σ_i C(n_i.,2) - Σ_j C(n_.j,2)
  + 2·Σ_ij C(n_ij,2).  Three groupBy aggregations instead of n^2 row
  pairs; validated against the naive loop in tests.
* PA — per-line structural equality after splitting on ``<*>`` and
  stripping constant parts (metrics.py:77-122).
* FGA/FTA — micro/macro F1 over the SHARED truth∪pred template label
  space (metrics.py:158-211).  Micro-F1 over a multiclass shared label
  space equals plain accuracy; macro averages per-label F1 over every
  label present in either side (sklearn semantics, no sklearn needed).
* GGD/PGD — |mean_t - mean_p| / max(...) and same for POPULATION std of
  group sizes (metrics.py:213-242, np.std ddof=0).
* template similarity — 1 - levenshtein/max_len (metrics.py:244-257),
  Spark's built-in levenshtein.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    """C(n, 2) as a Column expression."""
    return (col * (col - F.lit(1))) / F.lit(2)


def grouping_accuracy(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> float:
    n = df.count()
    total = n * (n - 1) / 2
    if total == 0:
        return 0.0
    s11 = (
        df.groupBy(truth, pred).agg(F.count("*").alias("n"))
        .agg(F.sum(_c2(F.col("n")))).collect()[0][0] or 0.0
    )
    st = (
        df.groupBy(truth).agg(F.count("*").alias("n"))
        .agg(F.sum(_c2(F.col("n")))).collect()[0][0] or 0.0
    )
    sp = (
        df.groupBy(pred).agg(F.count("*").alias("n"))
        .agg(F.sum(_c2(F.col("n")))).collect()[0][0] or 0.0
    )
    agree = total - st - sp + 2 * s11
    return float(agree / total)


def grouping_accuracy_naive(rows: list[tuple[str, str]]) -> float:
    """Reference O(n^2) loop for validation (metrics.py:63-75)."""
    total = correct = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            total += 1
            if (rows[i][0] == rows[j][0]) == (rows[i][1] == rows[j][1]):
                correct += 1
    return correct / total if total else 0.0


def _structural_eq(t1, t2):
    """metrics.py:77-100: same <*> arity, stripped constant parts equal."""
    a1 = F.transform(F.split(t1, r"<\*>", -1), lambda p: F.trim(p))
    a2 = F.transform(F.split(t2, r"<\*>", -1), lambda p: F.trim(p))
    return a1 == a2


def parsing_accuracy(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> float:
    row = df.agg(
        F.avg(_structural_eq(F.col(truth), F.col(pred)).cast("int")).alias("pa")
    ).collect()[0]
    return float(row["pa"] or 0.0)


def fga_fta(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> tuple[float, float]:
    n = df.count()
    if n == 0:
        return 0.0, 0.0
    # per-label tp / truth-count / pred-count over the shared label space
    tp = df.filter(F.col(truth) == F.col(pred)).groupBy(F.col(truth).alias("label")).agg(
        F.count("*").alias("tp")
    )
    tc = df.groupBy(F.col(truth).alias("label")).agg(F.count("*").alias("tc"))
    pc = df.groupBy(F.col(pred).alias("label")).agg(F.count("*").alias("pc"))
    per = (
        tc.join(pc, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("pc", F.lit(0)).alias("pc"),
        )
        .withColumn(
            "f1",
            F.when(
                F.col("tc") + F.col("pc") > 0,
                2.0 * F.col("tp") / (F.col("tc") + F.col("pc")),
            ).otherwise(F.lit(0.0)),
        )
    )
    agg = per.agg(F.sum("tp").alias("tp_total"), F.avg("f1").alias("macro")).collect()[0]
    fga = float(agg["tp_total"]) / n  # micro-F1 == accuracy on shared labels
    fta = float(agg["macro"])
    return fga, fta


def ggd_pgd(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> tuple[float, float]:
    def stats(col):
        sizes = df.groupBy(col).agg(F.count("*").alias("n"))
        row = sizes.agg(F.avg("n").alias("m"), F.stddev_pop("n").alias("s")).collect()[0]
        return float(row["m"]), float(row["s"] or 0.0)

    gm, gs = stats(truth)
    pm, ps = stats(pred)
    ggd = abs(gm - pm) / max(gm, pm) if max(gm, pm) > 0 else 0.0
    pgd = abs(gs - ps) / max(gs, ps) if max(gs, ps) > 0 else 0.0
    return ggd, pgd


def template_similarity_expr(t1, t2):
    """1 - levenshtein/max_len (metrics.py:244-257)."""
    ml = F.greatest(F.length(t1), F.length(t2))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(t1, t2) / ml
    )


def avg_template_similarity(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> float:
    row = df.agg(
        F.avg(template_similarity_expr(F.col(truth), F.col(pred))).alias("s")
    ).collect()[0]
    return float(row["s"] or 0.0)


def evaluate(df: DataFrame, truth: str = "truth_template", pred: str = "pred_template") -> dict:
    """Full metric suite, one dict (reference EvaluationMetrics analog)."""
    fga, fta = fga_fta(df, truth, pred)
    ggd, pgd = ggd_pgd(df, truth, pred)
    return {
        "grouping_accuracy": grouping_accuracy(df, truth, pred),
        "parsing_accuracy": parsing_accuracy(df, truth, pred),
        "fga": fga,
        "fta": fta,
        "ggd": ggd,
        "pgd": pgd,
        "avg_template_similarity": avg_template_similarity(df, truth, pred),
    }
