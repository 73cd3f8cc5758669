"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything is generated JVM-side from ``spark.range`` + hash mixing —
no Python RNG, no UDFs — so the same (n_convs, seed) always yields the
same table at any parallelism, and bench-scale data (10^7+ turns) costs
no driver memory.  Text is rendered from a fixed bank of ~40 message
templates with injected variables covering every heuristic class of the
reference extractor (cpp/src/log_parser.cpp:205-229): IPv4 (<LOI>),
integers (<OBA>), 0x-hex and trailing-digit ids (<OID>), plus
pure-static sentences; template choice is Zipf-skewed (top template
≈30% of rows) to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1767225600  # 2026-01-01 00:00:00 UTC

ROLES = ["user", "assistant", "tool", "system"]
ROLE_CDF = [0.35, 0.70, 0.90, 1.0]
TOOLS = ["search", "python", "browser", "shell", "sql", "editor", "calculator", "none"]

_NAMES = ["admin", "root", "alice", "bob", "carol", "svc_agent", "batch_user", "guest"]
_COMPONENTS = ["scheduler", "executor", "broker", "gateway", "planner", "retriever"]


def _h(seed: int, salt: int, *cols: Column) -> Column:
    """Stable 64-bit mix of columns with a per-use salt."""
    return F.xxhash64(F.lit(seed), F.lit(salt), *cols)


def _u(seed: int, salt: int, *cols: Column) -> Column:
    """Uniform double in [0,1) derived from the hash."""
    return (F.pmod(_h(seed, salt, *cols), F.lit(1_000_000)).cast("double")) / 1e6


def _pick(arr: list[str], h: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def _template_bank(seed: int, key: Column) -> list[Column]:
    """~40 message template expressions; each renders deterministic
    variable values from ``key``."""
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        F.pmod(_h(seed, 101, key), F.lit(256)).cast("string"),
        F.pmod(_h(seed, 102, key), F.lit(256)).cast("string"),
        F.pmod(_h(seed, 103, key), F.lit(256)).cast("string"),
    )
    num = F.pmod(_h(seed, 104, key), F.lit(100000)).cast("string")
    num2 = F.pmod(_h(seed, 105, key), F.lit(4096)).cast("string")
    hexid = F.concat(F.lit("0x"), F.lower(F.hex(F.pmod(_h(seed, 106, key), F.lit(1 << 20)))))
    worker = F.concat(F.lit("worker-"), F.pmod(_h(seed, 107, key), F.lit(50)).cast("string"))
    sess = F.concat(F.lit("sess_"), F.pmod(_h(seed, 108, key), F.lit(9000)).cast("string"))
    name = _pick(_NAMES, _h(seed, 109, key))
    comp = _pick(_COMPONENTS, _h(seed, 110, key))

    j = lambda *parts: F.concat_ws(" ", *parts)  # noqa: E731
    L = F.lit
    return [
        # high-frequency head of the Zipf distribution
        j(L("User"), name, L("logged in from"), ip),
        j(L("Request"), hexid, L("completed in"), num, L("ms")),
        j(L("tool call finished with status"), num2),
        j(L("Connection established to"), ip, L("port"), num2),
        j(L("INFO heartbeat from"), worker, L("seq"), num),
        j(L("assistant reply streamed"), num, L("tokens")),
        j(L("cache hit for key"), hexid),
        j(L("cache miss for key"), hexid),
        j(L("ERROR failed to reach"), ip, L("after"), num2, L("retries")),
        j(L("WARN retry budget low for"), worker),
        # near-duplicate pair: one static-token substitution among many
        # statics -> difflib ratio 0.9 >= 0.8 -> dictionary MERGE path
        j(L("Connection pool exhausted retrying operation now please stand by")),
        j(L("Connection pool exhausted retrying operation later please stand by")),
        j(L("session"), sess, L("opened by"), name),
        j(L("session"), sess, L("closed by"), name),
        j(L("DEBUG planner chose branch"), num2),
        j(L("scheduling task"), hexid, L("on"), worker),
        j(L("task"), hexid, L("finished with exit code"), num2),
        j(L("task"), hexid, L("failed with exit code"), num2),
        j(L("uploading artifact"), sess, L("bytes"), num),
        j(L("downloading artifact"), sess, L("bytes"), num),
        j(L("model context window at"), num2, L("percent")),
        j(L("tool output truncated to"), num, L("chars")),
        j(L("rate limit sleeping"), num2, L("seconds")),
        j(L("browser navigated to page id"), hexid),
        j(L("search returned"), num2, L("results for query id"), hexid),
        j(L("python cell executed in"), num, L("ms by"), worker),
        j(L("sql query scanned"), num, L("rows from shard"), num2),
        j(L("editor applied patch"), hexid, L("lines"), num2),
        j(L("memory usage of"), comp, L("at"), num, L("kb")),
        j(L("gc pause"), num2, L("ms in"), comp),
        j(L("checkpoint written by"), comp, L("at offset"), num),
        j(L("replaying journal segment"), num2, L("for"), comp),
        j(L("auth token refreshed for"), name),
        j(L("permission denied for"), name, L("on resource"), hexid),
        j(L("handshake with"), ip, L("took"), num, L("us")),
        # all-variable message -> exercises position-Jaccard match path
        j(hexid, num, ip),
        j(num, hexid),
        # static-only sentences (no variables at all)
        j(L("agent loop idle waiting for next event")),
        j(L("transcript compaction pass completed successfully")),
        j(L("user requested conversation summary export")),
        j(L("system prompt reloaded after configuration change")),
    ]


def _zipf_cdf(k: int, s: float = 1.15) -> list[float]:
    w = [1.0 / (r ** s) for r in range(1, k + 1)]
    tot = sum(w)
    cdf, acc = [], 0.0
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    max_turns: int = 64,
    span_hours: int = 72,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame.  ~``n_convs * ~13`` turn rows."""
    convs = spark.range(n_convs)
    if partitions:
        convs = convs.repartition(partitions)
    conv_id = F.format_string("conv-%08d", F.col("id"))
    # Zipf-ish conversation lengths in [1, max_turns]: cube of a uniform
    # skews short, a few long conversations exercise per-conv ordering.
    lu = _u(seed, 1, F.col("id"))
    n_turns = (F.lit(1) + F.floor(F.lit(max_turns - 1) * lu * lu * lu)).cast("int")
    df = (
        convs.select(
            conv_id.alias("conv_id"),
            F.col("id").alias("_conv_no"),
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )

    key = _h(seed, 2, F.col("conv_id"), F.col("turn_idx"))

    # Zipf template choice over the bank
    bank = _template_bank(seed, key)
    cdf = _zipf_cdf(len(bank))
    tu = _u(seed, 3, F.col("conv_id"), F.col("turn_idx"))
    tid_expr = None
    for i, edge in enumerate(cdf):
        cond = tu < F.lit(edge)
        tid_expr = F.when(cond, i) if tid_expr is None else tid_expr.when(cond, i)
    tid_expr = tid_expr.otherwise(len(bank) - 1)

    # role with fixed weights; tool correlated with role == 'tool'
    ru = _u(seed, 4, F.col("conv_id"), F.col("turn_idx"))
    role = (
        F.when(ru < ROLE_CDF[0], ROLES[0])
        .when(ru < ROLE_CDF[1], ROLES[1])
        .when(ru < ROLE_CDF[2], ROLES[2])
        .otherwise(ROLES[3])
    )
    tool = F.when(
        role == F.lit("tool"), _pick(TOOLS[:-1], _h(seed, 5, F.col("conv_id"), F.col("turn_idx")))
    ).otherwise(F.lit("none"))

    # timestamps: conversation start anywhere in the span, ~5-125 s per turn
    conv_start = F.pmod(_h(seed, 6, F.col("conv_id")), F.lit(span_hours * 3600))
    step = F.lit(5) + F.pmod(_h(seed, 7, F.col("conv_id")), F.lit(120))
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + conv_start + F.col("turn_idx") * step)

    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        F.element_at(F.array(*bank), tid_expr.cast("int") + 1).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
