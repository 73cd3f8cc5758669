"""Replicates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row counts + column names + order-insensitive values.

Default scale: sf0.001 (fast); set SHERLOG_TEST_SF=sf0.01 to mirror the
driver's exact scale.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = f"/root/testdata/{os.environ.get('SHERLOG_TEST_SF', 'sf0.001')}"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(set(entrymod.queries()) - entrymod.ROWS_ONLY)


def test_every_query_has_oracle():
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql()) - entrymod.ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(entrymod.ROWS_ONLY))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible queries still must run and return a stable
    schema + >=0 rows (the driver's weaker check)."""
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
