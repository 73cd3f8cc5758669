"""Differential fuzz for the r5 text-cleaning operators: a seeded
adversarial multi-line corpus (empty lines, whitespace-only lines,
unicode, case-varied blocklist phrases, braces, shared paragraphs) is
pushed through the Spark operators AND independent pure-Python mirrors
— full row-by-row equality, not spot checks."""

from __future__ import annotations

import random

from sherlog_parser_spark.functions.linefilter import (
    C4_BLOCKLIST,
    TERMINAL_PUNCT,
    line_filter,
)
from sherlog_parser_spark.operators.dedup import paragraph_dedup


# -- independent Python mirrors (single-space word split, rstrip-free
#    rtrim semantics: Spark rtrim strips SPACES only — mirror that) ----

def _rtrim_spaces(s: str) -> str:
    return s.rstrip(" ")


def _line_keep(line: str, min_words: int, blocklist, require_terminal: bool) -> bool:
    words = [w for w in line.split(" ") if w != ""]
    if len(words) < min_words:
        return False
    if require_terminal:
        t = _rtrim_spaces(line)
        if not any(t.endswith(p) for p in TERMINAL_PUNCT):
            return False
    low = line.lower()
    return not any(p in low for p in blocklist)


def _mirror_line_filter(rows, min_words=3, blocklist=C4_BLOCKLIST,
                        require_terminal=True, min_kept_lines=1,
                        drop_brace_docs=True):
    out = {}
    for doc_id, text in rows:
        text = text or ""
        lines = text.split("\n")
        kept = [l for l in lines if _line_keep(l, min_words, blocklist, require_terminal)]
        ok = len(kept) >= min_kept_lines
        if drop_brace_docs and ("{" in text or "}" in text):
            ok = False
        out[doc_id] = ("\n".join(kept), len(lines), len(kept), ok)
    return out


def _ascii_ws_trim(s: str) -> str:
    """Java \\s trim (ASCII whitespace only — python .strip() also eats
    unicode spaces, which the JVM regexp does not)."""
    import re

    return re.sub(r"^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$", "", s)


def _mirror_paragraph_dedup(rows, normalize=False):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        paras = (text or "").split("\n")
        kept = []
        for p in paras:
            key = _ascii_ws_trim(p).lower() if normalize else p
            if key == "":
                kept.append(p)
                continue
            if key not in seen:
                seen.add(key)
                kept.append(p)
        out[doc_id] = ("\n".join(kept), len(paras), len(kept), len(kept) > 0)
    return out


# -- adversarial corpus ------------------------------------------------

WORDS = [
    "alpha", "beta", "Gamma", "δelta", "naïve", "x", "-", "…", "word.",
    "JavaScript", "COOKIE", "cookies", "lorem", "ipsum", "rights",
]
TAILS = ["", ".", "!", "?", '"', " .", ".  ", " ", "..", "?!"]
SPECIAL_LINES = [
    "", " ", "   ", "{", "}", "if (x) { y }", "\t", "please enable javascript",
    "We use Cookies here today.", "All Rights Reserved.", "shared common footer.",
]


def _make_corpus(n_docs=120, seed=1234):
    rnd = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n_lines = rnd.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            if rnd.random() < 0.25:
                lines.append(rnd.choice(SPECIAL_LINES))
            else:
                k = rnd.randint(0, 6)
                lines.append(
                    " ".join(rnd.choice(WORDS) for _ in range(k)) + rnd.choice(TAILS)
                )
        if rnd.random() < 0.3:
            lines.append("shared common footer.")
        rows.append((i, "\n".join(lines)))
    return rows


def test_line_filter_matches_mirror_on_adversarial_corpus(spark):
    rows = _make_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept_text"], r["n_lines"], r["n_kept"], r["doc_kept"])
        for r in line_filter(df).collect()
    }
    want = _mirror_line_filter(rows)
    assert got == want
    # knobs flip behavior consistently too
    got2 = {
        r["doc_id"]: (r["kept_text"], r["n_lines"], r["n_kept"], r["doc_kept"])
        for r in line_filter(
            df, min_words=1, require_terminal=False, drop_brace_docs=False
        ).collect()
    }
    want2 = _mirror_line_filter(
        rows, min_words=1, require_terminal=False, drop_brace_docs=False
    )
    assert got2 == want2


def test_paragraph_dedup_matches_mirror_on_adversarial_corpus(spark):
    rows = _make_corpus(seed=99)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for normalize in (False, True):
        got = {
            r["doc_id"]: (r["kept_text"], r["n_paragraphs"], r["n_kept"], r["doc_kept"])
            for r in paragraph_dedup(df, normalize=normalize).collect()
        }
        want = _mirror_paragraph_dedup(rows, normalize=normalize)
        assert got == want, f"normalize={normalize}"
