"""Derive a log-line view from the driver's ``events`` table.

The driver's oracle tables have no raw log text, so the parse-family
oracle queries construct one deterministically from ``events`` — with
byte-identical renderings in Spark and DuckDB:

    evt <event_type> user <user_id> from 10.<uid%256>.0.<eid%256>
        req 0x<hex(eid%2^20)> k <props.k> took <floor(value*100)> ms

This exercises every masking rule: plain ints -> <OBA>, the dotted quad
-> <LOI>, 0x hex -> <OID>.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def log_line_expr() -> Column:
    # F.concat (NULL-propagating), NOT concat_ws (NULL-skipping): the DuckDB
    # rendering below uses '||' which propagates NULL, so a null event_type
    # or props.k must yield NULL text in BOTH engines (ADVICE r1).
    return F.concat(
        F.lit("evt "),
        F.col("event_type"),
        F.lit(" user "),
        F.col("user_id").cast("string"),
        F.lit(" from 10."),
        F.pmod(F.col("user_id"), F.lit(256)).cast("string"),
        F.lit(".0."),
        F.pmod(F.col("event_id"), F.lit(256)).cast("string"),
        F.lit(" req 0x"),
        F.lower(F.hex(F.pmod(F.col("event_id"), F.lit(1 << 20)))),
        F.lit(" k "),
        F.get_json_object("props", "$.k"),
        F.lit(" took "),
        F.floor(F.col("value") * 100).cast("long").cast("string"),
        F.lit(" ms"),
    )


def logs_view(events: DataFrame) -> DataFrame:
    return events.select("event_id", "ts", "event_type", log_line_expr().alias("text"))


DUCK_LOG_LINE = (
    "'evt ' || event_type || ' user ' || CAST(user_id AS VARCHAR) || "
    "' from 10.' || CAST(user_id % 256 AS VARCHAR) || '.0.' || CAST(event_id % 256 AS VARCHAR) || "
    "' req 0x' || lower(to_hex(event_id % 1048576)) || "
    "' k ' || json_extract_string(props, '$.k') || "
    "' took ' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) || ' ms'"
)

DUCK_LOGS_VIEW = f"(SELECT event_id, ts, event_type, {DUCK_LOG_LINE} AS text FROM events)"
