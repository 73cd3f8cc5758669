"""Bucketed-table sink: shuffle-free conv-level joins and aggregations.

The north_rule pipeline is keyed on ``conv_id`` end-to-end (routing
buckets, sessionization, per-conversation stats).  At 10^12 turns every
``groupBy("conv_id")`` / self-join on conv_id is a full shuffle of the
fact table UNLESS the table is stored bucketed on that key.  This module
is the Spark-native analog of the reference's hypertable partitioning
(src/core/timeseries.py:266-287 creates time/space-partitioned storage)
for the JOIN dimension: ``bucketBy(N, conv_id)`` + ``sortBy`` at write
time means

* a join between two tables bucketed the same way runs with NO Exchange
  on either side (bucket pruning feeds SortMergeJoin directly), and
* ``groupBy(conv_id, ...)`` aggregations read pre-clustered data with no
  hash repartition.

Bucketed writes require the table-catalog API (``saveAsTable``) rather
than path-based ``parquet(path)`` — Spark records the bucket spec in the
catalog and refuses bucket-aware reads without it.  We register EXTERNAL
tables (``option("path", ...)``) so the data lives where the caller
says, like every other sink in plans/route.py.

Scale note: choose ``n_buckets`` so one bucket of the biggest table fits
an executor's shuffle-free sort budget (at 10^12 turns / 4096 buckets a
bucket is ~250M turns — split further or combine with the existing
days(ts) directory partitioning for time pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 8,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sortBy`` inside each bucket file lets downstream SortMergeJoins
    skip their sort as well (plan shows neither Exchange nor Sort on the
    bucketed side when join keys == bucket+sort prefix).
    """
    (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .option("parquet.enable.dictionary", "false")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
