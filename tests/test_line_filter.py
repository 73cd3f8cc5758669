"""C4-style line-level boilerplate removal — rule coverage on realistic
multi-line fixtures plus the narrow-map plan shape.  The value-level
oracle is the ``line_filter`` entry in __spark_entry__.py."""

from __future__ import annotations

from sherlog_parser_spark.functions.linefilter import line_filter


DOCS = [
    # prose doc: every line survives
    (0, "The quick brown fox jumps over the dog.\nIt was a fine day indeed!"),
    # boilerplate: cookie notice + js warning dropped, prose kept
    (
        1,
        "We use cookies to improve your experience.\n"
        "Please enable JavaScript to continue.\n"
        "The actual article text continues here.",
    ),
    # short lines and missing terminal punctuation dropped
    (2, "Home\nAbout us\nContact\nThis sentence is long enough to keep."),
    # legal footer dropped
    (3, "A real paragraph sits on this line.\nAll rights reserved 2024"),
    # code doc: braces kill the whole document even though lines pass
    (4, "function body looks like prose sometimes.\nif (x) { return y; }"),
    # everything dropped -> doc dropped
    (5, "nav\nmenu\nfooter"),
    # empty text
    (6, ""),
]


def _run(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in line_filter(df, **kw).collect()}


def test_rules(spark):
    out = _run(spark)
    assert out[0]["doc_kept"] and out[0]["n_kept"] == 2
    assert out[1]["kept_text"] == "The actual article text continues here."
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[2]["kept_text"] == "This sentence is long enough to keep."
    assert out[3]["kept_text"] == "A real paragraph sits on this line."
    # braces: lines may survive but the document must not
    assert out[4]["n_kept"] >= 1 and not out[4]["doc_kept"]
    assert out[5]["n_kept"] == 0 and not out[5]["doc_kept"]
    assert out[6]["n_kept"] == 0 and not out[6]["doc_kept"]


def test_rule_knobs(spark):
    # relaxing the terminal rule rescues the short-line doc's longer lines
    out = _run(spark, require_terminal=False, min_words=2)
    assert out[2]["n_kept"] == 2  # 'About us' now passes (2 words, no punct needed)
    # brace rule off: the code doc survives
    out2 = _run(spark, drop_brace_docs=False)
    assert out2[4]["doc_kept"]


def test_narrow_plan_no_exchange(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
