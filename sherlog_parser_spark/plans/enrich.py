"""Enrich stage: broadcast hash joins + derived columns.

Two broadcast joins (J1 template dictionary, J4 role/tool dimension),
then parameter extraction (P11) and event-type inference (P15) as pure
JVM expressions.  No shuffle: both build sides are tiny and explicitly
``F.broadcast``-hinted, so the fact table streams through map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sherlog_parser_spark.functions.masking import (
    event_type_expr,
    extract_params_expr,
    normalize_template_expr,
)


def enrich_stage(
    parsed: DataFrame,
    template_dict: DataFrame,
    dim: DataFrame | None = None,
    with_params: bool = True,
) -> DataFrame:
    out = parsed.join(F.broadcast(template_dict), "sig", "left")
    if dim is not None:
        out = out.join(F.broadcast(dim), ["role", "tool"], "left")
    out = out.withColumn("event_type", event_type_expr("template")).withColumn(
        "normalized_template", normalize_template_expr("template")
    )
    if with_params:
        out = out.withColumn("parameters", extract_params_expr("text", "template"))
    return out
