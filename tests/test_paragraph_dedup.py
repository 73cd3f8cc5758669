"""CCNet corpus-global paragraph dedup — first-occurrence semantics,
blank-line preservation, normalized matching, partition invariance.
The value oracle is the ``text_cleaning`` entry (method
'paragraph_dedup') in __spark_entry__.py."""

from __future__ import annotations

from sherlog_parser_spark.operators.dedup import paragraph_dedup

DOCS = [
    (0, "unique alpha paragraph\ncommon footer text\n\nsecond unique bit"),
    (1, "another document opens here\ncommon footer text"),
    (2, "common footer text\nfresh closing thought"),
    (3, "Common Footer Text\nunrelated tail"),  # case differs
    (4, ""),
]


def _mirror(rows, normalize=False):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        paras = (text or "").split("\n")
        kept = []
        for p in paras:
            key = p.strip().lower() if normalize else p
            if key == "":
                kept.append(p)
                continue
            if key not in seen:
                seen.add(key)
                kept.append(p)
        out[doc_id] = ("\n".join(kept), len(paras), len(kept))
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["kept_text"], r["n_paragraphs"], r["n_kept"], r["doc_kept"])
        for r in paragraph_dedup(df, **kw).collect()
    }


def test_first_occurrence_wins(spark):
    got = _run(spark, DOCS)
    want = _mirror(DOCS)
    for d in want:
        assert got[d][:3] == want[d], d
    # doc 0 keeps the footer; 1 and 2 lose it; 3's case-variant survives
    assert "common footer text" in got[0][0]
    assert "common footer text" not in got[1][0]
    assert "common footer text" not in got[2][0]
    assert "Common Footer Text" in got[3][0]
    # the blank separator line in doc 0 survives
    assert "\n\n" in got[0][0]
    assert got[4] == ("", 1, 1, True)  # '' paragraph is kept, not deduped


def test_normalized_matching(spark):
    got = _run(spark, DOCS, normalize=True)
    want = _mirror(DOCS, normalize=True)
    for d in want:
        assert got[d][:3] == want[d], d
    # with normalization doc 3's case-variant footer now dedups away
    assert "Common Footer Text" not in got[3][0]
    assert "unrelated tail" in got[3][0]


def test_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, paragraph_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, paragraph_dedup(df.repartition(7)).collect()))
    assert a == b
