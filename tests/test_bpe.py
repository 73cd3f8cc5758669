"""r5 distributed BPE training/encoding: differential vs the sequential
mirror, partition invariance, early stop, shared-encode exactness,
round-trip reconstruction, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    python_mirror_bpe,
    train_bpe,
)

# the classic Sennrich-style corpus plus casing/whitespace noise and a
# non-ASCII word (Spark splits by codepoint; the mirror uses list())
CORPUS = [
    "low low low low low lower lower newest newest",
    "newest newest newest widest widest  WIDEST",
    "Low lowest newest café café née",
]


def _docs(spark, nparts=4):
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(nparts)


def test_train_matches_mirror(spark):
    model = train_bpe(_docs(spark), n_merges=12, min_pair_count=2)
    merges, counts = python_mirror_bpe(CORPUS, n_merges=12, min_pair_count=2)
    assert model.merges == merges
    assert model.pair_counts == counts
    assert len(model.merges) > 4  # the corpus genuinely supports merges
    # the final symbol table fuses the hot word completely
    syms = {r["word"]: r["syms"] for r in model.symbols.collect()}
    assert "low" in syms and len(syms["low"]) < 4


def test_train_partition_invariant(spark):
    got = [
        train_bpe(_docs(spark, nparts), n_merges=8).merges for nparts in (1, 7)
    ]
    assert got[0] == got[1]


def test_train_early_stop_on_min_pair_count(spark):
    # every word unique, every pair count 1 -> zero merges at threshold 2
    docs = spark.createDataFrame(
        [(0, "abc defg hij"), (1, "klmn opq rst")], "doc_id long, text string"
    )
    model = train_bpe(docs, n_merges=10, min_pair_count=2)
    assert model.merges == []
    # threshold 1 merges deterministically (ties by (a ASC, b ASC))
    m1 = train_bpe(docs, n_merges=3, min_pair_count=1)
    mm, _ = python_mirror_bpe(["abc defg hij", "klmn opq rst"], 3, 1)
    assert m1.merges == mm


def test_encode_shares_semantics_with_training(spark):
    docs = _docs(spark)
    model = train_bpe(docs, n_merges=12)
    enc = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, model.merges).collect()
    }
    ranks = {tuple(p): i for i, p in enumerate(model.merges)}
    for i, text in enumerate(CORPUS):
        expect = [t for w in text.strip().lower().split() for t in encode_word(w, ranks)]
        assert enc[i][0] == expect
        assert enc[i][1] == len(expect)
    # encoding a TRAINING word reproduces its final symbol table entry
    syms = {r["word"]: r["syms"] for r in model.symbols.collect()}
    for w in ("low", "newest", "café"):
        assert encode_word(w, ranks) == syms[w]


def test_encode_round_trip_reconstruction():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "s"): 2, ("es", "t"): 3}
    for w in ("low", "lowest", "wow", "née", "x", "😀low"):
        toks = encode_word(w, ranks)
        assert toks[-1] == EOW or toks == [EOW]
        assert "".join(toks).replace(EOW, "") == w


def test_empty_and_null_docs_encode_empty(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "  ")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(docs, [("a", "b")]).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_train_plan_shape(spark):
    """The per-round pair count runs on the distinct-word table — a
    hash aggregate over an exploded zip, no cartesian, no data-sized
    broadcast, and the round's winner is a driver-scalar top-1."""
    docs = _docs(spark)
    words = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .count()
    )
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    model = train_bpe(docs, n_merges=2)
    sym_plan = model.symbols._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in sym_plan
    # localCheckpoint per round: the final table's plan must NOT nest the
    # full per-round HOF chain (lineage truncated -> a scan, not n_merges
    # nested projections)
    assert "aggregate(" not in sym_plan.lower() or "Scan ExistingRDD" in sym_plan
