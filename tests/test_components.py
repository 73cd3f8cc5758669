"""Connected-components dedup decisions vs a Python union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sherlog_parser_spark.operators.components import (
    connected_components,
    dedup_keep_representatives,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [(min(a, b), max(a, b)) for a, b in (sorted(rng.sample(nodes, 2)) for _ in range(150))]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    expected = _union_find(pairs)
    # canonicalize oracle to min-id representative
    assert got == expected


def test_components_chain(spark):
    pairs = [(i, i + 1) for i in range(30)]  # one long chain, diameter 30
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df, max_iterations=50).collect()}
    assert set(got.values()) == {0}


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(10)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup_keep_representatives(docs, pairs).collect())
    # components {1,2,3} -> keep 1; {7,8} -> keep 7; others untouched
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_connected_components_nonconvergence_raises(spark):
    """A chain graph needs O(length) rounds; an insufficient iteration cap
    must raise, never return silently-wrong labels (r1 ADVICE)."""
    import pytest as _pytest
    from sherlog_parser_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a INT, id_b INT"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=2)
    # and with enough rounds (30-hop propagation + confirming pass) the
    # same graph resolves to one component
    ok = connected_components(chain, max_iterations=35)
    assert {r["component"] for r in ok.collect()} == {0}


def test_star_components_match_union_find(spark):
    """Large-star/small-star vs the union-find oracle on a random graph,
    a long chain (the case hash-to-min needs O(n) rounds for), cliques,
    and isolated self-pairs."""
    from sherlog_parser_spark.operators.components import connected_components_star

    rng = random.Random(7)
    nodes = list(range(300))
    pairs = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(200)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
    assert got == _union_find(pairs)


def test_star_components_long_chain_few_rounds(spark):
    """A 120-node chain must converge well within 25 star rounds
    (hash-to-min would need ~120)."""
    from sherlog_parser_spark.operators.components import connected_components_star

    chain = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df, max_iterations=25).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 121


def test_star_components_two_cliques_and_bridge(spark):
    from sherlog_parser_spark.operators.components import connected_components_star

    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs += [(20, 20)]  # degenerate self-pair -> isolated node
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 15)} == {10}
    assert got[20] == 20
