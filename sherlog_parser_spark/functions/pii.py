"""PII detection and redaction for training-data curation.

Rule-based redaction of the classic PII families (emails, IPv4
addresses, SSN-shaped ids, phone-shaped numbers) with:

- a pure-JVM Spark expression path (chained ``regexp_replace`` /
  ``regexp_extract_all`` — whole-stage codegen, no Python on the hot
  path), and
- DuckDB SQL renderings with identical semantics so the correctness
  driver can oracle-check redaction output value-for-value.

The patterns deliberately stay inside the Java-regex ∩ RE2 dialect
(no lookaround, ASCII ``\\b`` / ``\\d``) so one pattern string drives
both engines.  Rules are applied IN ORDER on the running redacted
string; per-family counts are measured independently on the original
text.  This mirrors the curation role of the reference's masking rules
(cpp/src/log_parser.cpp:209-228 applies the same ordered-replace
discipline to log parameters); counts-then-redact matches how published
pipelines (e.g. BigScience ROOTS / Dolma PII taggers) report PII
incidence alongside the scrubbed text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — ordered; patterns are valid and
# equivalent in Java regex, RE2 (DuckDB), and Python re.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii_expr(text: Column | str) -> Column:
    """Ordered-replace PII redaction (pure JVM expression)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count_expr(text: Column | str, kind: str) -> Column:
    """Count of matches of one PII family on the original text."""
    c = F.col(text) if isinstance(text, str) else text
    pat = next(p for n, p, _ in PII_RULES if n == kind)
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def redact_pii_py(text: str) -> str:
    """Python mirror used by tests to pin the expression semantics."""
    for _, pat, repl in PII_RULES:
        text = re.sub(pat, repl, text)
    return text


# ---------------------------------------------------------------------------
# DuckDB renderings (identical semantics, used by oracle_sql)
# ---------------------------------------------------------------------------

def _dd_quote(pat: str) -> str:
    # DuckDB standard string literals do not process backslash escapes, so
    # the regex reaches RE2 verbatim — only quotes need doubling
    return pat.replace("'", "''")


def dd_redact_pii(text_col: str) -> str:
    expr = text_col
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, '{_dd_quote(pat)}', '{repl}', 'g')"
    return expr


def dd_pii_count(text_col: str, kind: str) -> str:
    pat = next(p for n, p, _ in PII_RULES if n == kind)
    return f"len(regexp_extract_all({text_col}, '{_dd_quote(pat)}'))"
