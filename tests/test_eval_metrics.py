"""Eval metrics (SURVEY §5 / reference src/eval/metrics.py semantics):
distributed GA vs the naive O(n^2) loop, PA structural compare, FGA/FTA
manual pins, GGD/PGD, Levenshtein similarity — plus the full parser
evaluated against the synthetic loghub-style golden dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.data.structured_logs import generate_structured_logs
from sherlog_parser_spark.eval import metrics as M
from sherlog_parser_spark.functions.masking import normalize_template_expr


@pytest.fixture(scope="module")
def small_eval_df(spark):
    rows = [
        (1, "A", "A"), (2, "A", "A"), (3, "A", "B"),
        (4, "B", "B"), (5, "B", "B"), (6, "C", "B"),
        (7, "C", "C"), (8, "D", "C"),
    ]
    return spark.createDataFrame(rows, "log_id int, truth_template string, pred_template string")


def test_ga_matches_naive_loop(small_eval_df):
    rows = [(r["truth_template"], r["pred_template"]) for r in small_eval_df.collect()]
    assert abs(M.grouping_accuracy(small_eval_df) - M.grouping_accuracy_naive(rows)) < 1e-12


def test_ga_perfect_and_worst(spark):
    perfect = spark.createDataFrame(
        [(i, f"T{i % 3}", f"T{i % 3}") for i in range(30)],
        "log_id int, truth_template string, pred_template string",
    )
    assert M.grouping_accuracy(perfect) == 1.0
    # prediction groups everything together while truth is all distinct
    allone = spark.createDataFrame(
        [(i, f"T{i}", "X") for i in range(10)],
        "log_id int, truth_template string, pred_template string",
    )
    assert M.grouping_accuracy(allone) == 0.0


def test_parsing_accuracy_structural(spark):
    rows = [
        (1, "User <*> logged in", "User <*> logged in"),       # exact
        (2, "User <*> logged in", "User  <*>  logged in"),     # FAILS: 'User  ' vs 'User' differ after split? no — strip fixes
        (3, "User <*> logged in", "User <*> logged out"),      # differing constant
        (4, "A <*> B <*>", "A <*> B"),                          # arity mismatch
    ]
    df = spark.createDataFrame(rows, "log_id int, truth_template string, pred_template string")
    # row2: parts ['User  ','  logged in'] -> stripped equal -> True
    assert abs(M.parsing_accuracy(df) - 2 / 4) < 1e-12


def test_fga_fta_manual(small_eval_df):
    fga, fta = M.fga_fta(small_eval_df)
    # micro == accuracy: rows 1,2,4,5,7 correct -> 5/8
    assert abs(fga - 5 / 8) < 1e-12
    # per-label f1 = 2tp/(tc+pc): A: 2*2/(3+2)=0.8, B: 2*2/(2+4)=2/3,
    # C: 2*1/(2+2)=0.5, D: 0 -> macro = (0.8+0.6667+0.5+0)/4
    assert abs(fta - (0.8 + 2 / 3 + 0.5 + 0.0) / 4) < 1e-12


def test_ggd_pgd_manual(spark):
    # truth groups sizes [2,2], pred sizes [3,1]
    rows = [(1, "A", "X"), (2, "A", "X"), (3, "B", "X"), (4, "B", "Y")]
    df = spark.createDataFrame(rows, "log_id int, truth_template string, pred_template string")
    ggd, pgd = M.ggd_pgd(df)
    assert abs(ggd - 0.0) < 1e-12  # means 2 vs 2
    assert abs(pgd - 1.0) < 1e-12  # stds 0 vs 1 -> |0-1|/1


def test_levenshtein_similarity(spark):
    df = spark.createDataFrame([(1, "kitten", "sitting")], "i int, truth_template string, pred_template string")
    # lev(kitten,sitting)=3, max_len 7
    assert abs(M.avg_template_similarity(df) - (1 - 3 / 7)) < 1e-12


def test_parser_on_golden_dataset(spark):
    """End-to-end: run the masking parser over the golden dataset and
    evaluate.  The heuristic extractor masks ips/ints/hex/trailing-digit
    ids, which matches the generator's variable slots except 'user<n>'
    and 'node-<n>' style names — those DO end in digits so they mask too;
    perfect normalization => high PA/GA."""
    golden = generate_structured_logs(spark, n_rows=1500).cache()
    from sherlog_parser_spark.functions.masking import mask_template_expr

    results = golden.select(
        F.col("LineId").alias("log_id"),
        F.col("EventTemplate").alias("truth_template"),
        normalize_template_expr(mask_template_expr("Content")).alias("pred_template"),
    )
    m = M.evaluate(results)
    assert m["grouping_accuracy"] >= 0.99, m
    assert m["parsing_accuracy"] >= 0.99, m
    assert m["fga"] >= 0.99 and m["fta"] >= 0.9, m
    assert m["avg_template_similarity"] >= 0.95, m
    golden.unpersist()


def test_loghub_shaped_golden_eval_gate(spark):
    """Real-shape golden eval (r2): GA must clear the reference's own
    --min-accuracy 0.95 gate (docs/evaluation-framework.md:207) while the
    template-level metrics stay honestly below 1.0 — proving the fixture
    measures parsing quality, not construction."""
    from pyspark.sql import functions as F

    from sherlog_parser_spark.data.loghub_shaped import generate_loghub_shaped
    from sherlog_parser_spark.eval import metrics as M
    from sherlog_parser_spark.functions.masking import (
        mask_template_expr,
        normalize_template_expr,
    )

    golden = generate_loghub_shaped(spark, 2000)
    results = golden.select(
        F.col("LineId").alias("log_id"),
        F.col("EventTemplate").alias("truth_template"),
        normalize_template_expr(mask_template_expr("Content")).alias("pred_template"),
    ).cache()
    scores = M.evaluate(results)
    assert scores["grouping_accuracy"] >= 0.95          # the reference gate
    assert scores["parsing_accuracy"] < 1.0              # not 1.0-by-construction
    assert 0.0 < scores["fga"] < 1.0
    assert 0.0 < scores["fta"] < 1.0
    # pin the fixture's scores loosely so silent regressions surface
    assert 0.60 <= scores["parsing_accuracy"] <= 0.80
