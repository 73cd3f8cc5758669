"""Deterministic domain-mixture sampling — the training-data stage that
re-weights a curated corpus across domains/sources before packing
(temperature-scaled sampling in the mBERT/XLM tradition: small domains
up-weighted, giant domains down-weighted, p_d ∝ n_d^alpha).

Selection is EXACT-COUNT and hash-deterministic via the shared
:func:`~sherlog_parser_spark.operators.prefilter.exact_hash_sample`
kernel (one histogram aggregation + narrow filter + boundary-bucket
window — no full shuffle, no per-group funnel; see its docstring for
the 100-TB shape).  Membership is stable across runs, partition counts
and cluster sizes.

Cross-engine determinism of the TARGETS (oracle-compared): with the
default ``alpha=0.5`` the weight is ``sqrt(n_d)`` — IEEE-754 sqrt is
correctly rounded, so Python (driver) and any SQL engine produce
bit-identical weights; the weight sum is accumulated left-associatively
in sorted-domain order (house float rule), and the final target is
``floor(x + 0.5)``, never ``round``.  For other alpha the driver uses
``pow``, which is NOT guaranteed correctly rounded across libms —
documented caveat, the oracle pins alpha=0.5.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.prefilter import exact_hash_sample


def temperature_targets(
    counts: dict[str, int], total_target: int, alpha: float = 0.5
) -> dict[str, int]:
    """Per-domain kept-row targets: ``min(n_d, floor(total_target *
    n_d^alpha / sum_e n_e^alpha + 0.5))``.  alpha=1 reproduces the
    input distribution, alpha=0 is uniform across domains; the sum is
    left-associative in sorted-domain order."""
    doms = sorted(counts)

    def w(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha

    s = 0.0
    for d in doms:
        s += w(counts[d])
    if s <= 0.0:
        return {d: 0 for d in doms}
    return {
        d: min(counts[d], int(math.floor(total_target * w(counts[d]) / s + 0.5)))
        for d in doms
    }


def mixture_sample(
    df: DataFrame,
    domain_col: str = "source",
    total_target: int | None = None,
    alpha: float = 0.5,
    fractions: dict[str, float] | None = None,
    seed: int = 42,
    order_cols: tuple[str, ...] | None = None,
    n_bucket_bits: int = 12,
) -> DataFrame:
    """Keep a deterministic, exact-count sample of each domain.

    Two target modes (exactly one must be chosen):

    * ``fractions`` — explicit per-domain keep fractions; target_d =
      min(n_d, floor(n_d * fractions[d] + 0.5)); domains absent from
      the dict are DROPPED (a curation decision, loud in the ledger,
      not a silent default);
    * ``total_target`` + ``alpha`` — temperature-scaled targets via
      :func:`temperature_targets`.

    Null domains are dropped.  Returns the kept rows with the input
    schema."""
    if (fractions is None) == (total_target is None):
        raise ValueError("pass exactly one of fractions / total_target")
    nn = df.filter(F.col(domain_col).isNotNull())

    if fractions is not None:

        def targets_fn(counts: dict) -> dict:
            return {
                d: min(n, int(math.floor(n * fractions[d] + 0.5)))
                for d, n in counts.items()
                if d in fractions
            }

    else:

        def targets_fn(counts: dict) -> dict:
            return temperature_targets(counts, int(total_target), alpha)

    return exact_hash_sample(nn, domain_col, targets_fn, seed, order_cols, n_bucket_bits)
