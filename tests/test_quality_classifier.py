"""Distilled quality classifier — held-out quality on separable data,
score-pass plumbing, artifact round-trip, Observation-coexistence
regression.  Iterative ML training is a documented non-oracle case
(SURVEY §2.11), same class as BPE/KMeans."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sherlog_parser_spark.operators.classifier import (
    classifier_scores,
    load_classifier,
    save_classifier,
    train_quality_classifier,
)

PROSE_WORDS = "the quick brown fox jumps over a lazy dog near the quiet river".split()
SPAM_WORDS = "buy cheap click here free pills winner prize now urgent offer".split()


def _corpus(n, seed):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        words = PROSE_WORDS if good else SPAM_WORDS
        text = " ".join(rnd.choice(words) for _ in range(12))
        rows.append((i, text, 1 if good else 0))
    return rows


def test_classifier_learns_separable_quality(spark):
    train = spark.createDataFrame(_corpus(400, 1), "doc_id long, text string, label int")
    test = spark.createDataFrame(_corpus(200, 2), "doc_id long, text string, label int")
    clf = train_quality_classifier(train)
    scored = classifier_scores(test, clf).join(test.select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    acc = sum(1 for r in rows if r["quality_pred"] == r["label"]) / len(rows)
    assert acc >= 0.95, acc
    # probabilities separate in direction: prose > spam on average
    good = [r["quality_prob"] for r in rows if r["label"] == 1]
    bad = [r["quality_prob"] for r in rows if r["label"] == 0]
    assert sum(good) / len(good) > sum(bad) / len(bad)


def test_classifier_score_plan_shape(spark):
    """Scoring is the dsir_scores shape: the coefficient table rides a
    broadcast join; no sort-merge join, no cartesian, no Python UDF."""
    train = spark.createDataFrame(_corpus(100, 3), "doc_id long, text string, label int")
    clf = train_quality_classifier(train, max_iter=5)
    plan = (
        classifier_scores(train, clf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classifier_scores_coexist_with_observations(spark):
    """Regression for the Spark 4 footgun that motivated the plain-float
    model: once any Observation is registered on the session, an ML
    ``model.transform`` closure fails with NotSerializableException
    (ObservationManager).  The relational scorer must be immune."""
    from pyspark.sql import Observation

    train = spark.createDataFrame(_corpus(80, 5), "doc_id long, text string, label int")
    obs = Observation("clf_obs_regression")
    observed = train.observe(obs, F.count(F.lit(1)).alias("n"))
    assert observed.count() == 80
    clf = train_quality_classifier(train, max_iter=5)
    rows = classifier_scores(train, clf).collect()
    assert len(rows) == 80


def test_classifier_roundtrip(spark, tmp_path):
    train = spark.createDataFrame(_corpus(100, 4), "doc_id long, text string, label int")
    clf = train_quality_classifier(train, max_iter=10)
    path = str(tmp_path / "clf")
    save_classifier(clf, path)
    clf2 = load_classifier(spark, path)
    assert clf2.n_features == clf.n_features
    assert clf2.coefficients == clf.coefficients  # plain floats round-trip exactly
    a = {r["doc_id"]: r["quality_prob"] for r in classifier_scores(train, clf).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in classifier_scores(train, clf2).collect()}
    assert a == b
