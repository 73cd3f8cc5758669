"""r5 deterministic mixture interleaving: grouped ranks without a
per-domain window funnel, stride-scheduling differential vs a
sequential mirror, and the bounded-prefix-discrepancy property the
operator exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.interleave import (
    grouped_ranks,
    interleave_by_mixture,
)


def _corpus(spark, nparts):
    rows = []
    sizes = {"web": 900, "code": 300, "wiki": 60}
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    # shuffle ids across domains deterministically so domain != id-range
    rows = [((r[0] * striding) % 1260, r[1]) for r, striding in zip(rows, [901] * len(rows))]
    assert len({r[0] for r in rows}) == len(rows)  # 901 coprime to 1260
    return (
        spark.createDataFrame(rows, "doc_id long, source string").repartition(nparts),
        sizes,
    )


def test_grouped_ranks_match_sequential(spark):
    df, sizes = _corpus(spark, 5)
    ranked, release, totals = grouped_ranks(df, "source", "doc_id")
    rows = ranked.collect()
    release()
    assert totals == sizes
    # mirror: rank within domain in ascending doc_id order
    by_dom: dict = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_dom.setdefault(r["source"], []).append(r["doc_id"])
    expected = {
        (dom, did): k for dom, ids in by_dom.items() for k, did in enumerate(ids)
    }
    got = {(r["source"], r["doc_id"]): r["_grank"] for r in rows}
    assert got == expected


def test_interleave_differential_and_prefix_discrepancy(spark):
    df, sizes = _corpus(spark, 4)
    weights = {"web": 3.0, "code": 1.0, "wiki": 0.2}
    out = interleave_by_mixture(df, "source", weights=weights, order_col="doc_id")
    rows = out.collect()
    out.release()
    # sequential mirror of the stride schedule
    by_dom: dict = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_dom.setdefault(r["source"], []).append(r["doc_id"])
    mirror = {}
    for dom, ids in by_dom.items():
        for k, did in enumerate(ids):
            mirror[(dom, did)] = (k + 0.5) / weights[dom]
    got = {(r["source"], r["doc_id"]): r["vtime"] for r in rows}
    assert got == mirror  # bit-identical IEEE arithmetic

    # prefix discrepancy: in every prefix of the schedule, each domain's
    # count stays within 1 of its weight share (capped by exhaustion)
    order = sorted(rows, key=lambda r: (r["vtime"], r["source"], r["doc_id"]))
    wsum = sum(weights.values())
    seen = {d: 0 for d in weights}
    exhausted_at = {d: sizes[d] for d in weights}
    for i, r in enumerate(order, start=1):
        seen[r["source"]] += 1
        for d in weights:
            if seen[d] < exhausted_at[d]:  # share only holds pre-exhaustion
                share = weights[d] / wsum * i
                assert abs(seen[d] - share) <= 1.0 + 1e-9, (i, d, seen[d], share)

    # partition invariance
    df2, _ = _corpus(spark, 11)
    out2 = interleave_by_mixture(df2, "source", weights=weights, order_col="doc_id")
    got2 = {(r["source"], r["doc_id"]): r["vtime"] for r in out2.collect()}
    out2.release()
    assert got2 == got


def test_interleave_default_weights_and_validation(spark):
    df, sizes = _corpus(spark, 3)
    out = interleave_by_mixture(df, "source", order_col="doc_id")
    rows = out.collect()
    out.release()
    # proportional default: the full order blends domains at natural
    # share, so the LAST element of every domain lands near vtime
    # (n_d - 0.5)/n_d ~ just under 1.0 — all domains finish together
    last = {}
    for r in rows:
        last[r["source"]] = max(last.get(r["source"], 0.0), r["vtime"])
    assert all(0.9 < v < 1.0 for v in last.values()), last
    with pytest.raises(ValueError, match="non-positive"):
        interleave_by_mixture(df, "source", weights={"web": 0.0, "code": 1.0})
    # explicit weights drop absent domains
    out3 = interleave_by_mixture(df, "source", weights={"web": 1.0})
    doms = {r["source"] for r in out3.collect()}
    out3.release()
    assert doms == {"web"}


def test_write_training_order_is_globally_sorted(spark, tmp_path):
    """Reading the materialized order file-by-file (filename order),
    rows in file order, must reproduce the exact global schedule."""
    import glob
    import os

    from sherlog_parser_spark.operators.interleave import write_training_order

    from sherlog_parser_spark.operators.interleave import interleave_by_mixture

    df, _ = _corpus(spark, 6)
    path = str(tmp_path / "order")
    # plan shape: a range exchange + within-partition sort, never a
    # global single-partition sort (AQE may still coalesce the tiny
    # test output into one FILE — that's a size decision, not a funnel)
    out = interleave_by_mixture(df, "source", order_col="doc_id")
    shaped = out.repartitionByRange("vtime", "source", "doc_id").sortWithinPartitions(
        "vtime", "source", "doc_id"
    )
    plan = shaped._sc._jvm.PythonSQLUtils.explainString(
        shaped._jdf.queryExecution(), "simple"
    )
    out.release()
    assert "rangepartitioning" in plan and "SinglePartition" not in plan, plan
    write_training_order(df, path, "source", "doc_id")
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    assert files
    seq = []
    for f in files:
        seq.extend(
            (r["vtime"], r["source"], r["doc_id"])
            for r in spark.read.parquet(f).collect()
        )
    assert seq == sorted(seq)
    assert len(seq) == df.count()
