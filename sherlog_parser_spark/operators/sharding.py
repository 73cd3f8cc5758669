"""Token-budget shard assignment — packing curated documents into
training shards of ~``shard_tokens`` tokens each, in a deterministic
global order (the write-side stage after curation: real pipelines emit
fixed-budget shards so data loaders stream uniform files).

shard_id = cum_tokens_before_this_doc DIV shard_tokens over the global
``order_col`` order.  The scalable rendering of a global cumulative
sum (the naive ``ORDER BY`` window with no partition key funnels the
corpus through ONE task):

1. ``repartitionByRange(order_col)`` — partition i holds an ordered
   slice; ascending partition ids follow ascending ranges;
2. per-partition window cumsum — each partition sorts only its own
   slice (no global funnel);
3. per-partition token totals collect to the driver (#partitions rows,
   bounded by cluster config, never data size), prefix-summed, and the
   offsets broadcast back — the classic two-phase scan.

The result does NOT depend on where the range boundaries fall (the
global cumsum is boundary-invariant given a total order), so range-
sampling wobble cannot change assignments; ``order_col`` must be
row-unique.  Integer arithmetic throughout (``div``), matching the
DuckDB oracle's ``//``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_tokens: int = 100_000,
    n_range_partitions: int | None = None,
) -> DataFrame:
    """Adds ``shard_id`` (0-based, non-decreasing in ``order_col``)."""
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    from pyspark.storagelevel import StorageLevel

    nparts = n_range_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    part = df.repartitionByRange(int(nparts), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persist between the totals job and the assignment job: range
    # partition boundaries come from SAMPLING and can differ between
    # recomputations — offsets computed against one partitioning must
    # not be applied to another (the same discipline as
    # operators/split._ranked_with_total; verified live: unpersisted,
    # repartition(2) vs repartition(17) inputs drifted by one shard)
    part.persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("_pid").orderBy(order_col)
    local = part.withColumn(
        "_cum_in_part", F.sum(F.col(token_col).cast("long")).over(w)
    )
    totals = {
        r["_pid"]: r["_t"]
        for r in part.groupBy("_pid")
        .agg(F.sum(F.col(token_col).cast("long")).alias("_t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "_pid int, _offset long",
    )
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "_cum_before",
            F.col("_offset") + F.col("_cum_in_part") - F.col(token_col).cast("long"),
        )
        .withColumn("shard_id", F.expr(f"_cum_before div {int(shard_tokens)}"))
        .drop("_pid", "_cum_in_part", "_offset", "_cum_before")
    )
    out = out.localCheckpoint(eager=True)
    part.unpersist()
    return out
