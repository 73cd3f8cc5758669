"""Small enrichment dimensions (FIXTURES.md §4) — always broadcastable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TOOL_CATEGORIES = {
    "search": "retrieval",
    "browser": "retrieval",
    "sql": "retrieval",
    "python": "execution",
    "shell": "execution",
    "calculator": "execution",
    "editor": "io",
    "none": "na",
}

ROLE_RANKS = {"system": 0, "user": 1, "assistant": 2, "tool": 3}


def role_tool_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (tool, cat, role, rank)
        for tool, cat in sorted(TOOL_CATEGORIES.items())
        for role, rank in sorted(ROLE_RANKS.items())
    ]
    return spark.createDataFrame(rows, "tool string, tool_category string, role string, role_rank int")
