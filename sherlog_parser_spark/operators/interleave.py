"""Deterministic mixture interleaving — the training-order stage after
mixture sampling and packing: schedule documents (or shards) so that
every prefix of the training stream contains each domain in proportion
to its weight, with no long single-domain runs (the property dataloader
mixing exists for).

Stride scheduling: domain d's k-th element (k = 0-based rank of the
element within its domain, in global ``order_col`` order) is placed at
virtual time ``(k + 0.5) / w_d``; sorting by that time is the classic
deterministic weighted round-robin — for exact weights every prefix of
length L holds ``floor/ceil(w_d * L)`` elements of each domain (±1
discrepancy), reproducible across runs and cluster sizes because both
the per-domain ranks and the tie-breaks are derived from data, never
from partitioning.

Scale shape: the per-domain rank does NOT use a ``PARTITION BY domain``
window (the Zipf-hot domain would funnel through one task).  It reuses
the two-phase machinery of ``operators/sharding._global_cumsum``,
generalized to grouped ranks: range-partition on ``order_col``,
per-(partition, domain) window inside each slice, and a driver prefix
over the (n_partitions × n_domains) count matrix — bounded by
configuration and domain cardinality, never by data size.  The same
persisted-intermediate discipline, loud drift guard, and caller-owned
``.release()`` apply (see sharding.py's module docstring for the
no-localCheckpoint fault-tolerance rationale).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DRIFT_MSG = (
    "interleave: range partitioning drifted between the counts job and the "
    "rank job (persisted partitions recomputed with different sampled "
    "boundaries) — rerun the operator"
)


def grouped_ranks(
    df: DataFrame,
    group_col: str,
    order_col: str,
    rank_col: str = "_grank",
    n_range_partitions: int | None = None,
) -> tuple[DataFrame, Callable[[], None], dict]:
    """Adds ``rank_col``: the row's 0-based rank WITHIN its group, taken
    in global ``order_col`` order (``order_col`` must be row-unique) —
    without a per-group window funnel.

    Returns ``(frame, release, group_counts)``; ``release()`` drops the
    persisted range-partitioned intermediate once the result is
    consumed."""
    nparts = n_range_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    from pyspark.storagelevel import StorageLevel

    part = df.repartitionByRange(int(nparts), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    part.persist(StorageLevel.MEMORY_AND_DISK)
    rows = (
        part.groupBy("_pid", F.col(group_col).alias("_g"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    # prefix per group across ascending partition ids (= ascending
    # order_col ranges) -> the group's rank offset inside each partition
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["_g"], {})[r["_pid"]] = int(r["_n"])
    offsets, totals = [], {}
    for g, pids in by_group.items():
        acc = 0
        for pid in sorted(pids):
            offsets.append((int(pid), g, acc, pids[pid]))
            acc += pids[pid]
        totals[g] = acc
    g_type = df.schema[group_col].dataType
    from pyspark.sql import types as T

    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, None, 0, 0)],
        T.StructType(
            [
                T.StructField("_opid", T.IntegerType()),
                T.StructField("_g", g_type),
                T.StructField("_off", T.LongType()),
                T.StructField("_ptotal", T.LongType()),
            ]
        ),
    )
    w = Window.partitionBy("_pid", group_col).orderBy(order_col)
    out = (
        part.withColumn("_rk_in_part", F.row_number().over(w).cast("long"))
        .join(
            F.broadcast(off_df),
            (F.col("_pid") == F.col("_opid")) & (F.col(group_col) == F.col("_g")),
        )
        .withColumn(
            rank_col,
            F.when(
                F.col("_rk_in_part") > F.col("_ptotal"),
                F.raise_error(F.lit(_DRIFT_MSG)).cast("long"),
            ).otherwise(F.col("_off") + F.col("_rk_in_part") - 1),
        )
        .drop("_pid", "_opid", "_g", "_off", "_ptotal", "_rk_in_part")
    )
    return out, part.unpersist, totals


def interleave_by_mixture(
    df: DataFrame,
    domain_col: str = "source",
    weights: dict[str, float] | None = None,
    order_col: str = "doc_id",
    vtime_col: str = "vtime",
    n_range_partitions: int | None = None,
) -> DataFrame:
    """Adds ``vtime_col``: the element's virtual schedule time under
    weighted stride scheduling.  The training order is ascending
    (``vtime_col``, ``domain_col``, ``order_col``) — write it with
    ``repartitionByRange(vtime_col).sortWithinPartitions(...)`` so the
    stream is globally ordered without a one-task sort.

    ``weights``: relative domain weights (need not sum to 1; domains
    absent from an explicit dict are DROPPED).  Default: proportional
    to domain sizes — every domain advances at its natural share, the
    order is a smooth shuffle-free blend.  The returned frame carries
    the ``.release()`` hook of the underlying grouped-rank pass."""
    ranked, release, totals = grouped_ranks(
        df, domain_col, order_col, "_grank", n_range_partitions
    )
    if weights is None:
        weights = {g: float(n) for g, n in totals.items()}
    missing = [g for g in totals if g not in weights]
    if missing:
        ranked = ranked.filter(F.col(domain_col).isin(*list(weights)))
    bad = [g for g, w in weights.items() if w <= 0]
    if bad:
        raise ValueError(f"non-positive interleave weights: {bad}")
    wmap = F.create_map(
        *[x for g, w in sorted(weights.items()) for x in (F.lit(g), F.lit(float(w)))]
    )
    out = ranked.withColumn(
        vtime_col,
        (F.col("_grank").cast("double") + F.lit(0.5))
        / wmap[F.col(domain_col)],
    ).drop("_grank")
    out.release = release
    return out


def write_training_order(
    df: DataFrame,
    path: str,
    domain_col: str = "source",
    order_col: str = "doc_id",
    vtime_col: str = "vtime",
    n_range_partitions: int | None = None,
) -> None:
    """Materialize the interleaved training order: files are
    range-partitioned on ``vtime_col`` and sorted within each file, so
    reading part-00000, part-00001, ... in filename order and rows in
    file order IS the global schedule — no one-task global sort, the
    range exchange + per-partition sort is the whole plan.  Releases
    the interleave pass's persisted intermediate after the write (the
    sink is the durability point)."""
    out = df
    if vtime_col not in df.columns:
        out = interleave_by_mixture(
            df, domain_col, order_col=order_col, vtime_col=vtime_col,
            n_range_partitions=n_range_partitions,
        )
    sort_keys = [F.col(vtime_col), F.col(domain_col), F.col(order_col)]
    (
        out.repartitionByRange(*sort_keys)
        .sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .parquet(path)
    )
    release = getattr(out, "release", None)
    if release is not None:
        release()
