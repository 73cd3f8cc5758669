"""Connected components over near-duplicate candidate pairs — the
"dedup decision" layer that turns pairwise similarity hits (n-gram
Jaccard / MinHash-LSH / embedding cosine) into keep/drop sets.

Algorithm: iterated min-label propagation ("hash-to-min" style): every
node starts labeled with itself; each round every node takes the min
label in its closed neighborhood; converges in O(diameter) rounds —
near-dup graphs are unions of small cliques-ish clusters, so diameter
is tiny.  Each round is one shuffle (groupBy node).  For adversarial
long-chain graphs swap in the large-star/small-star variant; the API is
the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component =
    min node id in the connected component.

    Convergence is CONFIRMED (a final round must observe zero label
    changes) and non-convergence raises rather than returning partial
    labels — the default cap is sized so the confirming round fits
    (a 200-node random test graph needed 21 rounds; near-dup cliques
    need ~3)."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("s").alias("id")).distinct().withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.d == labels.id)
            .groupBy(F.col("s").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        # localCheckpoint truncates lineage each round — without it the
        # plan nests every prior iteration and analysis time explodes
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least(F.col("component"), F.coalesce("nmin", F.col("component"))).alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # returning partial labels would silently drop the WRONG documents
        # downstream (dedup_keep_representatives) — fail loudly instead
        # (possible on chain-shaped candidate graphs; r1 ADVICE)
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations; the candidate graph has a longer diameter than "
            "expected — raise max_iterations or switch to large-star/small-star"
        )
    return labels


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop every row whose id belongs to a near-dup component but is not
    its min-id representative; rows not in any pair survive untouched."""
    comps = connected_components(pairs, src, dst)
    losers = comps.filter(F.col("id") != F.col("component")).select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")
