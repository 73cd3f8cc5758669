"""X3 — embedding-based anomaly detection (SURVEY §2.11, §3.3).

The reference runs DBSCAN over embeddings of a bounded lookback window
(src/core/anomaly_incidents.py:117-136; its own C++ DBSCAN at
cpp/src/anomaly_detector.cpp:14-100), flags noise points and
small-cluster members, then OR-combines with per-cluster numeric
z-scores.

Spark shape: groups are time windows (bounded, like the reference's
4-hour lookback), each window's DBSCAN runs inside ``applyInPandas`` —
pure numpy (no sklearn in this environment), O(n^2) distances per
window with a hard guard, which matches the reference's own
``limit=100000`` lookback guard.  Cross-window parallelism is free;
within-window semantics are exactly sequential DBSCAN.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_WINDOW_ROWS = 20_000


def dbscan_numpy(vecs: np.ndarray, eps: float = 0.3, min_samples: int = 5, metric: str = "cosine") -> np.ndarray:
    """Classic DBSCAN; returns labels (-1 = noise).  Deterministic:
    points are visited in index order."""
    n = len(vecs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n > MAX_WINDOW_ROWS:
        raise ValueError(f"window of {n} rows exceeds guard {MAX_WINDOW_ROWS}; tighten the window")
    v = vecs.astype(np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = v / norms
        dist = 1.0 - vn @ vn.T
    else:
        d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        dist = np.sqrt(np.maximum(d2, 0))
    neighbors = [np.flatnonzero(dist[i] <= eps) for i in range(n)]
    labels = np.full(n, -2, dtype=np.int64)  # -2 = unvisited
    cluster = 0
    for i in range(n):
        if labels[i] != -2:
            continue
        if len(neighbors[i]) < min_samples:
            labels[i] = -1
            continue
        labels[i] = cluster
        seeds = list(neighbors[i])
        k = 0
        while k < len(seeds):
            j = seeds[k]
            k += 1
            if labels[j] == -1:
                labels[j] = cluster
            if labels[j] != -2:
                continue
            labels[j] = cluster
            if len(neighbors[j]) >= min_samples:
                seeds.extend(neighbors[j])
        cluster += 1
    return labels


def windowed_embedding_anomalies(
    df: DataFrame,
    vec_col: str = "embedding",
    id_cols: tuple[str, ...] = ("vec_id",),
    window_col: str | None = None,
    eps: float = 0.3,
    min_samples: int = 5,
    small_cluster_min: int = 3,
) -> DataFrame:
    """Per-window DBSCAN: rows get (cluster, is_embedding_anomaly) where
    anomaly = noise or member of a cluster smaller than small_cluster_min
    (anomaly_incidents.py:128-136)."""
    group_cols = [window_col] if window_col else []
    schema_id = ", ".join(f"{c} long" for c in id_cols)
    schema = (f"{window_col} timestamp, " if window_col else "") + (
        f"{schema_id}, cluster long, is_embedding_anomaly boolean"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.array(pdf[vec_col].tolist())
        labels = dbscan_numpy(vecs, eps=eps, min_samples=min_samples)
        sizes = pd.Series(labels).value_counts().to_dict()
        small = {lbl for lbl, n in sizes.items() if lbl != -1 and n < small_cluster_min}
        out = {c: pdf[c] for c in ((window_col,) if window_col else ()) + tuple(id_cols)}
        out["cluster"] = labels
        out["is_embedding_anomaly"] = [(l == -1) or (l in small) for l in labels]
        return pd.DataFrame(out)

    if group_cols:
        return df.groupBy(*group_cols).applyInPandas(run, schema)
    return df.groupBy(F.lit(1).alias("_g")).applyInPandas(run, schema)
