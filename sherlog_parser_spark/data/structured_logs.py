"""Synthetic loghub-style golden dataset (FIXTURES.md §2) —
(LineId, Content, EventId, EventTemplate), deterministic, ~15 templates.

Mirrors the reference's eval input shape (src/eval/datasets.py:226-230)
without downloading anything.  EventTemplate uses ``<*>`` placeholders
exactly where the generator injects variables, so a perfect parser (after
P14 normalization) scores PA == GA == 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (template with {} slots, <*>-form ground truth)
_BANK = [
    ("User {name} logged in from {ip}", "User <*> logged in from <*>"),
    ("Connection to {ip} port {num} failed", "Connection to <*> port <*> failed"),
    ("Request {hex} completed in {num} ms", "Request <*> completed in <*> ms"),
    ("Worker {wid} heartbeat seq {num}", "Worker <*> heartbeat seq <*>"),
    ("Cache miss for key {hex}", "Cache miss for key <*>"),
    ("Disk usage at {num} percent", "Disk usage at <*> percent"),
    ("Task {hex} exited with code {num}", "Task <*> exited with code <*>"),
    ("Scheduler queue depth {num}", "Scheduler queue depth <*>"),
    ("Session {wid} opened", "Session <*> opened"),
    ("Session {wid} closed", "Session <*> closed"),
    ("Replica sync lag {num} ms on {wid}", "Replica sync lag <*> ms on <*>"),
    ("Checkpoint flushed to disk successfully", "Checkpoint flushed to disk successfully"),
    ("Leader election started", "Leader election started"),
    ("Configuration reloaded from disk", "Configuration reloaded from disk"),
    ("GC pause of {num} ms detected", "GC pause of <*> ms detected"),
]


def generate_structured_logs(spark: SparkSession, n_rows: int = 2000, seed: int = 42) -> DataFrame:
    df = spark.range(1, n_rows + 1).select(F.col("id").cast("int").alias("LineId"))
    h = lambda salt: F.xxhash64(F.lit(seed), F.lit(salt), F.col("LineId"))  # noqa: E731
    # Zipf-ish template pick
    u = F.pmod(h(0), F.lit(1000)) / 1000.0
    tid = F.least(F.floor(F.lit(len(_BANK)) * u * u).cast("int"), F.lit(len(_BANK) - 1))

    name = F.concat(F.lit("user"), F.pmod(h(1), F.lit(40)).cast("string"))
    ip = F.concat_ws(
        ".",
        F.lit("192"),
        F.pmod(h(2), F.lit(256)).cast("string"),
        F.pmod(h(3), F.lit(256)).cast("string"),
        F.pmod(h(4), F.lit(256)).cast("string"),
    )
    num = F.pmod(h(5), F.lit(9000)).cast("string")
    hexv = F.concat(F.lit("0x"), F.lower(F.hex(F.pmod(h(6), F.lit(1 << 16)))))
    wid = F.concat(F.lit("node-"), F.pmod(h(7), F.lit(30)).cast("string"))

    def render(tpl: str):
        parts = []
        buf = ""
        i = 0
        while i < len(tpl):
            if tpl[i] == "{":
                j = tpl.index("}", i)
                if buf:
                    parts.append(F.lit(buf))
                    buf = ""
                parts.append({"name": name, "ip": ip, "num": num, "hex": hexv, "wid": wid}[tpl[i + 1:j]])
                i = j + 1
            else:
                buf += tpl[i]
                i += 1
        if buf:
            parts.append(F.lit(buf))
        return F.concat(*parts)

    content = None
    truth = None
    for k, (tpl, gt) in enumerate(_BANK):
        cond = tid == k
        content = F.when(cond, render(tpl)) if content is None else content.when(cond, render(tpl))
        truth = F.when(cond, F.lit(gt)) if truth is None else truth.when(cond, F.lit(gt))

    return df.select(
        "LineId",
        content.alias("Content"),
        F.concat(F.lit("E"), (tid + 1).cast("string")).alias("EventId"),
        truth.alias("EventTemplate"),
    )
