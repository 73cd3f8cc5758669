"""Distilled quality classifier — held-out quality on separable data,
score-pass plumbing, artifact round-trip.  Iterative ML training is a
documented non-oracle case (SURVEY §2.11), same class as BPE/KMeans."""

from __future__ import annotations

import random

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
    # probabilities are calibrated in direction: prose > spam on average
    good = [r["quality_prob"] for r in rows if r["label"] == 1]
    bad = [r["quality_prob"] for r in rows if r["label"] == 0]
    assert min(good) > max(bad) or (sum(good) / len(good) > sum(bad) / len(bad))


def test_classifier_score_plan_is_narrow(spark):
    train = spark.createDataFrame(_corpus(100, 3), "doc_id long, text string, label int")
    clf = train_quality_classifier(train, max_iter=5)
    plan = (
        classifier_scores(train, clf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one narrow map: no shuffle in the scoring pass
    assert "Exchange" not in plan, plan


def test_classifier_roundtrip(spark, tmp_path):
    train = spark.createDataFrame(_corpus(100, 4), "doc_id long, text string, label int")
    clf = train_quality_classifier(train, max_iter=10)
    path = str(tmp_path / "clf")
    save_classifier(clf, path)
    clf2 = load_classifier(spark, path)
    assert clf2.n_features == clf.n_features
    a = {r["doc_id"]: r["quality_prob"] for r in classifier_scores(train, clf).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in classifier_scores(train, clf2).collect()}
    assert a == b  # identical coefficients -> identical probabilities
