"""r5 mixture sampling: exact counts, partition-invariant membership,
both target modes, and the shared exact_hash_sample kernel contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.mixture import mixture_sample, temperature_targets


def _skewed(spark, nparts):
    rows = [(i, f"dom{min(3, i % 97 % 4)}", f"text {i}") for i in range(2000)]
    # dom sizes: dom0/1/2 ~ uniform-ish, dom3 the rest — plus one tiny domain
    rows += [(2000 + j, "tiny", f"tiny {j}") for j in range(5)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).repartition(nparts)


def test_temperature_targets_math():
    counts = {"a": 100, "b": 400, "c": 4}
    t = temperature_targets(counts, total_target=100, alpha=0.5)
    s = math.sqrt(100.0) + math.sqrt(400.0) + math.sqrt(4.0)
    assert t == {
        "a": int(math.floor(100 * 10.0 / s + 0.5)),
        "b": int(math.floor(100 * 20.0 / s + 0.5)),
        "c": 4,  # capped at n_c
    }
    # alpha=1 reproduces proportions, alpha=0 is uniform
    t1 = temperature_targets({"a": 100, "b": 300}, 40, alpha=1.0)
    assert t1 == {"a": 10, "b": 30}
    t0 = temperature_targets({"a": 100, "b": 300}, 40, alpha=0.0)
    assert t0 == {"a": 20, "b": 20}


def test_mixture_membership_partition_invariant(spark):
    kept = {}
    for nparts in (2, 13):
        df = _skewed(spark, nparts)
        out = mixture_sample(df, "source", total_target=500, alpha=0.5)
        kept[nparts] = {r["doc_id"] for r in out.collect()}
    assert kept[2] == kept[13]
    # exact per-domain counts == targets
    df = _skewed(spark, 4)
    counts = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    targets = temperature_targets(counts, 500, alpha=0.5)
    out = mixture_sample(df, "source", total_target=500, alpha=0.5)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {d: t for d, t in targets.items() if t > 0}
    # the tiny domain was up-weighted into full retention
    assert got["tiny"] == counts["tiny"]


def test_mixture_fractions_mode_drops_absent_domains(spark):
    df = _skewed(spark, 3)
    out = mixture_sample(df, "source", fractions={"dom0": 0.5, "tiny": 1.0})
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    counts = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == {"dom0", "tiny"}  # absent domains dropped, loudly
    assert got["dom0"] == int(math.floor(counts["dom0"] * 0.5 + 0.5))
    assert got["tiny"] == counts["tiny"]


def test_mixture_mode_exclusivity(spark):
    df = _skewed(spark, 2)
    with pytest.raises(ValueError):
        mixture_sample(df, "source")
    with pytest.raises(ValueError):
        mixture_sample(df, "source", total_target=10, fractions={"dom0": 0.1})
