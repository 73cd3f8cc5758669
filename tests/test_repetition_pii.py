"""Pinned-value tests for the Gopher-style repetition signals and the
PII redaction rules (crafted inputs cover the branches the synthetic
corpus never hits: duplicate lines, repeated 5-grams, every PII family,
empty/degenerate docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sherlog_parser_spark.functions import pii as PII
from sherlog_parser_spark.functions import textstats as TS


def _stats(spark, text):
    df = spark.createDataFrame([(text,)], "text string").select(
        F.col("text"),
        TS.lines_expr("text").alias("lines"),
        TS.word_shingles_expr("text", 2).alias("sh2"),
        TS.word_shingles_expr("text", 5).alias("sh5"),
    )
    row = df.select(
        TS.dup_frac_expr("lines").alias("dlf"),
        TS.dup_char_frac_expr("lines").alias("dlcf"),
        TS.top_ngram_char_frac_expr("sh2", "text").alias("t2"),
        TS.dup_frac_expr("sh5").alias("d5"),
    ).collect()[0]
    return row


def test_duplicate_line_fractions(spark):
    # lines after trim/drop-empty: [a, b, a, a, c] -> 2 of 5 are repeats
    row = _stats(spark, "a\nb\na\n a \n\nc")
    assert row.dlf == pytest.approx(2 / 5)
    # repeat occurrences carry 2 of the 5 total line-chars
    assert row.dlcf == pytest.approx(2 / 5)


def test_top_2gram_char_frac(spark):
    # 2-grams of "x y x y x": [x y, y x, x y, y x]; best mass = 2*3 chars
    row = _stats(spark, "x y x y x")
    assert row.t2 == pytest.approx(6 / 9)


def test_dup_5gram_frac(spark):
    row = _stats(spark, "a b c d e a b c d e a")
    # 7 shingles, 5 distinct -> 2/7
    assert row.d5 == pytest.approx(2 / 7)


def test_degenerate_docs_are_zero(spark):
    for text in ["", "   "]:
        row = _stats(spark, text)
        assert (row.dlf, row.dlcf, row.t2, row.d5) == (0.0, 0.0, 0.0, 0.0)
    # a doc that IS exactly one 2-gram legitimately has top-2gram frac 1.0
    row = _stats(spark, "one two")
    assert (row.dlf, row.dlcf, row.t2, row.d5) == (0.0, 0.0, 1.0, 0.0)


PII_CASES = [
    "mail a.b%x@c-d.io here",
    "ips 10.0.3.7 and 999.999.999.999 end",
    "ssn 123-45-6789 phone 650-555-1234 dots 650.555.1234",
    "mixed u42@ex.com at 10.0.42.7 call 415-555-0042",
    "clean text with numbers 12345 and 1.5 ratio",
    "",
    "edge a@b.co 1.2.3.4x not-an-ip 1.2.3 short",
]


def test_redaction_matches_python_mirror(spark):
    df = spark.createDataFrame([(t,) for t in PII_CASES], "text string")
    got = [
        r.red
        for r in df.select(PII.redact_pii_expr("text").alias("red"))
        .collect()
    ]
    assert got == [PII.redact_pii_py(t) for t in PII_CASES]


def test_redaction_values(spark):
    df = spark.createDataFrame([(PII_CASES[3],)], "text string")
    red = df.select(PII.redact_pii_expr("text").alias("r")).collect()[0].r
    assert red == "mixed <EMAIL> at <IP> call <PHONE>"


def test_pii_counts(spark):
    df = spark.createDataFrame([(PII_CASES[2],)], "text string")
    row = df.select(
        PII.pii_count_expr("text", "ssn").alias("ssn"),
        PII.pii_count_expr("text", "phone").alias("ph"),
        PII.pii_count_expr("text", "email").alias("em"),
    ).collect()[0]
    assert (row.ssn, row.ph, row.em) == (1, 2, 0)


def test_trailing_ip_boundary(spark):
    # '1.2.3.4x' must NOT match (\b fails before a word char)
    df = spark.createDataFrame([(PII_CASES[6],)], "text string")
    n = df.select(PII.pii_count_expr("text", "ipv4").alias("n")).collect()[0].n
    assert n == 0


def _rep_py(text):
    """Pure-Python recomputation of the repetition fractions."""
    lines = [s.strip() for s in text.split("\n") if s.strip()]
    toks = text.split()
    sh2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)] if len(toks) >= 2 else []
    sh5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)] if len(toks) >= 5 else []
    dlf = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
    tot = sum(map(len, lines))
    seen: set[str] = set()
    dup_chars = 0
    for ln in lines:
        if ln in seen:
            dup_chars += len(ln)
        seen.add(ln)
    dlcf = dup_chars / tot if tot else 0.0
    # Spark trim / DuckDB trim strip SPACES only (not \n) — match that
    denom = len(text.strip(" "))
    t2 = (
        max(sh2.count(g) * len(g) for g in set(sh2)) / denom
        if sh2 and denom
        else (0.0 if not sh2 else 0.0)
    )
    d5 = (len(sh5) - len(set(sh5))) / len(sh5) if sh5 else 0.0
    return dlf, dlcf, t2, d5


def test_repetition_fuzz_matches_python(spark):
    """Batched fuzz: random multi-line word-soup through the JVM
    expressions vs the pure-Python recomputation."""
    import random

    rng = random.Random(7)
    words = ["a", "bb", "ccc", "dd", "e", "line", "log", "x1"]
    rows = []
    for _ in range(300):
        n_lines = rng.randint(0, 5)
        text = "\n".join(
            " ".join(rng.choice(words) for _ in range(rng.randint(0, 9)))
            for _ in range(n_lines)
        )
        rows.append((text,))
    df = spark.createDataFrame(rows, "text string").select(
        "text",
        TS.lines_expr("text").alias("lines"),
        TS.word_shingles_expr("text", 2).alias("sh2"),
        TS.word_shingles_expr("text", 5).alias("sh5"),
    )
    got = df.select(
        "text",
        TS.dup_frac_expr("lines").alias("dlf"),
        TS.dup_char_frac_expr("lines").alias("dlcf"),
        TS.top_ngram_char_frac_expr("sh2", "text").alias("t2"),
        TS.dup_frac_expr("sh5").alias("d5"),
    ).collect()
    for r in got:
        exp = _rep_py(r["text"])
        assert (r.dlf, r.dlcf, r.t2, r.d5) == pytest.approx(exp), repr(r["text"])


def test_pii_fuzz_matches_python(spark):
    """Batched fuzz: random interleavings of PII-ish and non-PII tokens
    through the JVM redaction chain vs the Python mirror."""
    import random

    rng = random.Random(11)
    frags = [
        "a.b@c.io", "u%x@ex-1.org", "10.0.0.1", "1.2.3", "999.999.999.999",
        "123-45-6789", "650-555-1234", "650.555.1234", "12-34-5678",
        "plain", "x9", "0x1f", "a@b", "@", ".", "-", "1.2.3.4x", "v1.2.3.4",
    ]
    rows = [
        (" ".join(rng.choice(frags) for _ in range(rng.randint(0, 10))),)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "text string")
    for r in df.select("text", PII.redact_pii_expr("text").alias("red")).collect():
        assert r["red"] == PII.redact_pii_py(r["text"]), repr(r["text"])
