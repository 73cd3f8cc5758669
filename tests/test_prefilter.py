"""Prefilter operators X1/X2 (FIXTURES.md §7, src/core/log_prefilter.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.prefilter import cap_duplicates, stratified_level_sample


@pytest.fixture(scope="module")
def log_frame(spark):
    base = datetime.datetime(2026, 1, 1)
    rows = []
    i = 0
    for level, n in [("ERROR", 7), ("CRITICAL", 3), ("WARNING", 40), ("INFO", 200), ("DEBUG", 400)]:
        for k in range(n):
            rows.append((i, level, f"msg {level} {k}", base + datetime.timedelta(seconds=i)))
            i += 1
    # one message duplicated 50x
    for k in range(50):
        rows.append((i, "INFO", "dup message", base + datetime.timedelta(seconds=i)))
        i += 1
    return spark.createDataFrame(rows, "id long, level string, text string, ts timestamp").cache()


def test_stratified_sample_counts(log_frame):
    out = stratified_level_sample(log_frame, order_cols=("ts",))
    counts = {r["level"]: r["n"] for r in out.groupBy("level").agg(F.count("*").alias("n")).collect()}
    # all priority rows kept (log_prefilter.py:156-157)
    assert counts["ERROR"] == 7
    assert counts["CRITICAL"] == 3
    # per-level target = max(10, ceil(n*ratio)): WARNING 40*0.5=20,
    # INFO 250*0.1=25, DEBUG 400*0.05=20
    assert counts["WARNING"] == 20
    assert counts["INFO"] == 25
    assert counts["DEBUG"] == 20


def test_stratified_sample_deterministic(log_frame):
    a = sorted(r["id"] for r in stratified_level_sample(log_frame).select("id").collect())
    b = sorted(r["id"] for r in stratified_level_sample(log_frame).select("id").collect())
    assert a == b


def test_cap_duplicates(log_frame):
    out = cap_duplicates(log_frame, text_col="text", max_duplicates=5, order_cols=("ts",))
    dup = out.filter(F.col("text") == "dup message").orderBy("ts").collect()
    # first + last + 3 middle (log_prefilter.py:112-134)
    assert len(dup) == 5
    all_dup = log_frame.filter(F.col("text") == "dup message").orderBy("ts").collect()
    assert dup[0]["id"] == all_dup[0]["id"]
    assert dup[-1]["id"] == all_dup[-1]["id"]
    # non-duplicated rows untouched
    assert out.filter(F.col("text") != "dup message").count() == log_frame.filter(
        F.col("text") != "dup message"
    ).count()
