"""Gap-based sessionization — the batch sibling of the stateful
streaming sessionizer (streaming/stateful.py; reference analog: the
conversation grouping ParserService applies per conv_id,
src/core/parser_service.py:66-120, generalized to telemetry keys).

A session = a maximal run of a key's events where consecutive gaps are
<= ``gap_seconds``.  Classic lag + running-sum construction:

    new_session = (ts - lag(ts)) > gap          (first event -> 0)
    session_idx = sum(new_session) over (key order ts)

Scale shape: ONE window partitioned by the session key — high
cardinality by contract (users/conversations), so no hot funnel; the
per-key partition is exactly the data a sequential sessionizer needs,
which is why this is the canonical formulation rather than an
applyInPandas loop.  Ordering ties broken by ``tiebreak_cols`` so the
construction is deterministic under any partitioning (house rule after
the r3/r4 tied-timestamp lessons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Adds ``session_idx`` (0-based per key, chronological)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    prev = F.lag(F.col(ts_col)).over(w)
    # unix_timestamp, not cast("long"): the driver tables carry
    # TIMESTAMP_NTZ, which Spark 4 refuses to cast to BIGINT directly
    new_sess = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) <= gap_seconds),
        F.lit(0),
    ).otherwise(F.lit(1))
    return df.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration seconds."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, tiebreak_cols)
    return (
        s.groupBy(*key_cols, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                F.max(F.unix_timestamp(F.col(ts_col)))
                - F.min(F.unix_timestamp(F.col(ts_col)))
            ).alias("duration_sec"),
        )
    )
