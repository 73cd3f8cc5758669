"""Numeric analysis pins ported from cpp/tests/test_main.cpp:86-116 —
linear-interpolated quantiles and IQR anomaly detection — plus z-score
and small-cluster semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sherlog_parser_spark.operators.numeric import (
    group_numeric_stats,
    iqr_anomalies,
    numeric_field_discovery,
    small_cluster_flags,
    zscore_anomalies,
)


def test_statistics_catch2_pin(spark):
    """values 1..10 -> mean 5.5, median 5.5, Q1 3.25, Q3 7.75, IQR 4.5
    (cpp/tests/test_main.cpp:89-99; pins exact lerp quantiles)."""
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double").withColumn(
        "g", F.lit("a")
    )
    s = group_numeric_stats(df, ["g"], "v").collect()[0]
    assert s["mean"] == 5.5
    assert s["median"] == 5.5
    assert s["q1"] == 3.25
    assert s["q3"] == 7.75
    assert s["iqr"] == 4.5


def test_iqr_anomaly_catch2_pin(spark):
    """20 values of 10 + i%5 with 100.0 planted at index 10 -> exactly
    that one anomaly (cpp/tests/test_main.cpp:101-116)."""
    vals = [10.0 + i % 5 for i in range(20)]
    vals[10] = 100.0
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double").withColumn(
        "g", F.lit("a")
    )
    out = iqr_anomalies(df, ["g"], "v", k=1.5).filter(F.col("is_anomaly")).collect()
    assert len(out) == 1
    assert out[0]["i"] == 10
    assert out[0]["v"] == 100.0


def test_zscore_anomalies(spark):
    vals = [(i, 10.0) for i in range(30)] + [(30, 500.0)]
    df = spark.createDataFrame(vals, "i int, v double").withColumn("g", F.lit("a"))
    out = zscore_anomalies(df, ["g"], "v", sigma=2.5).filter(F.col("is_anomaly")).collect()
    assert [r["i"] for r in out] == [30]


def test_small_cluster_flags(spark):
    rows = [(i, "big") for i in range(20)] + [(100, "tiny"), (101, "tiny")]
    df = spark.createDataFrame(rows, "i int, cluster string")
    out = small_cluster_flags(df, "cluster", min_samples=5)
    flagged = {r["i"] for r in out.filter(F.col("is_small_cluster")).collect()}
    assert flagged == {100, 101}


def test_numeric_field_discovery(spark):
    rows = [(i, {"lat": str(i * 1.5), "name": f"n{i}" if i % 10 else "123"}) for i in range(100)]
    df = spark.createDataFrame(rows, "i int, m map<string,string>")
    out = {r["k"]: r["is_numeric"] for r in numeric_field_discovery(df, "m").collect()}
    assert out == {"lat": True, "name": False}


def test_sessionize_gap_splits_and_ties(spark):
    """r4 batch sessionization: gaps > threshold split sessions; tied
    timestamps stay in one session and order deterministically by the
    tiebreak column; duration uses floor-seconds."""
    import datetime as dt

    from sherlog_parser_spark.operators.sessions import session_stats, sessionize

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 3 events close, 31-min gap, 2 events close (tied ts)
        (1, 10, t0),
        (1, 11, t0 + dt.timedelta(minutes=5)),
        (1, 12, t0 + dt.timedelta(minutes=10)),
        (1, 13, t0 + dt.timedelta(minutes=41, seconds=1)),
        (1, 14, t0 + dt.timedelta(minutes=41, seconds=1)),
        # user 2: single event
        (2, 20, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    s = sessionize(df, ("user_id",), "ts", gap_seconds=1800, tiebreak_cols=("event_id",))
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"] for r in s.collect()
    }
    assert got == {(1, 10): 0, (1, 11): 0, (1, 12): 0, (1, 13): 1, (1, 14): 1, (2, 20): 0}

    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
        for r in session_stats(
            df, ("user_id",), "ts", 1800, tiebreak_cols=("event_id",)
        ).collect()
    }
    assert stats == {(1, 0): (3, 600), (1, 1): (2, 0), (2, 0): (1, 0)}


def test_sessionize_subsecond_boundary_matches_duckdb(spark, tmp_path):
    """r4 review: Spark unix_timestamp FLOORS sub-second timestamps while
    DuckDB's bare double->bigint cast ROUNDS — the oracle uses
    floor(epoch()).  Pin the agreement exactly at the boundary: gaps of
    1800.x seconds between events with sub-second fractions, where a
    round-vs-floor mismatch flips the session split."""
    import datetime as dt

    import duckdb

    from sherlog_parser_spark.operators.sessions import session_stats

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0, 600000)  # .6s fraction
    rows = []
    eid = 0
    # chain of gaps straddling the 1800s threshold with fractions that
    # make floor and round disagree: 1800.7, 1799.6, 1800.2, 1801.1
    offsets = [0.0, 1800.7, 1799.6, 1800.2, 1801.1]
    acc = 0.0
    for off in offsets:
        acc += off
        rows.append((1, eid, t0 + dt.timedelta(seconds=acc)))
        eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    p = str(tmp_path / "sess_events")
    df.write.mode("overwrite").parquet(p)

    got = sorted(
        (r["user_id"], r["session_idx"], r["n_events"], r["duration_sec"])
        for r in session_stats(
            df, ("user_id",), "ts", 1800, tiebreak_cols=("event_id",)
        ).collect()
    )

    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["session_stats"].replace(
        "ORDER BY user_id, session_idx", "ORDER BY user_id, session_idx"
    )
    want = sorted(
        (r[0], r[1], r[2], r[5])
        for r in duck.execute(sql).fetchall()
    )
    assert got == want, (got, want)
    # sanity: the fixture actually splits (floor semantics: gaps whose
    # floored-second diff > 1800 start new sessions)
    assert len({g[1] for g in got}) >= 2
