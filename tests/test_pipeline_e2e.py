"""End-to-end pipeline + checkpoint/resume semantics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sherlog_parser_spark.checkpoint import CheckpointManifest
from sherlog_parser_spark.plans.pipeline import run_pipeline


def _routed_fingerprint(spark, routed_dir):
    df = spark.read.parquet(routed_dir)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "template_id", "tool", "text")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def test_pipeline_end_to_end(spark, transcripts, tmp_path):
    out = str(tmp_path / "run1")
    res = run_pipeline(spark, transcripts, out, commit_groups=3, resume=False)
    assert res.n_rows == transcripts.count()
    assert res.dictionary.n_sigs > len(res.dictionary.templates) > 10
    # aggregates written and consistent with the sink
    freq = spark.read.parquet(os.path.join(out, "agg_template_freq"))
    assert freq.agg(F.sum("frequency")).collect()[0][0] == res.n_rows
    metrics = json.load(open(os.path.join(out, "run_metrics.json")))
    assert metrics["rows"] == res.n_rows
    assert metrics["manifest"]["units"] == 3


def test_pipeline_resume_skips_committed(spark, transcripts, tmp_path):
    out = str(tmp_path / "run2")
    # full run to get the golden sink fingerprint
    run_pipeline(spark, transcripts, out, commit_groups=3, resume=False, write_aggregates=False)
    golden = _routed_fingerprint(spark, os.path.join(out, "routed"))
    golden_manifest = CheckpointManifest.load(os.path.join(out, "_manifest.jsonl"))

    # simulate a crash after 1 of 3 commits: drop the last two manifest
    # entries, leave the (possibly orphaned) files in place
    mpath = os.path.join(out, "_manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    with open(mpath, "w") as f:
        f.write(lines[0] + "\n")

    res = run_pipeline(
        spark, transcripts, out, commit_groups=3, resume=True, write_aggregates=False
    )
    assert _routed_fingerprint(spark, os.path.join(out, "routed")) == golden
    m2 = CheckpointManifest.load(mpath)
    assert set(m2.entries) == set(golden_manifest.entries)
    # unit 0 must NOT have been recomputed: entry identical incl. timestamp
    assert m2.entries["bucket_group=0"] == golden_manifest.entries["bucket_group=0"]
    assert res.n_rows == transcripts.count()


def test_pipeline_arrow_udf_path_identical(spark, transcripts, tmp_path):
    out_a = str(tmp_path / "expr")
    out_b = str(tmp_path / "udf")
    run_pipeline(spark, transcripts, out_a, commit_groups=1, resume=False, write_aggregates=False)
    run_pipeline(
        spark, transcripts, out_b, commit_groups=1, resume=False,
        write_aggregates=False, use_arrow_udf=True,
    )
    assert _routed_fingerprint(spark, os.path.join(out_a, "routed")) == _routed_fingerprint(
        spark, os.path.join(out_b, "routed")
    )


def test_dictionary_guard_refuses_unbounded_collect(spark, transcripts, monkeypatch):
    """MAX_DICT_ROWS guard: a corpus whose masking does not collapse must
    fail loudly instead of collecting unbounded state to the driver."""
    import pytest

    from sherlog_parser_spark.plans import dictionary as D
    from sherlog_parser_spark.plans.parse import parse_stage

    monkeypatch.setattr(D, "MAX_DICT_ROWS", 10)
    with pytest.raises(RuntimeError, match="distinct signatures"):
        D.build_template_dictionary(parse_stage(transcripts))


def test_params_analytics_over_sink(spark, transcripts, tmp_path):
    """Reference flow §3.3: numeric analysis over PARSED PARAMETERS read
    back from the store — numeric_field_discovery + per-template z-scores
    on a parameter column extracted from the routed sink's map."""
    from pyspark.sql import functions as F

    from sherlog_parser_spark.operators.numeric import numeric_field_discovery, zscore_anomalies
    from sherlog_parser_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "pa")
    run_pipeline(spark, transcripts, out, commit_groups=1, resume=False, write_aggregates=False)
    sink = spark.read.parquet(os.path.join(out, "routed"))
    assert "parameters" in sink.columns
    with_params = sink.filter(F.size("parameters") > 0)
    assert with_params.count() > 0
    # A11 field typing over the map
    disc = {
        r["k"]: r["is_numeric"]
        for r in numeric_field_discovery(with_params, "parameters", sample_n=5000).collect()
    }
    assert any(disc.values()), disc  # OBA params parse as numeric
    # z-score over one numeric param per template
    vals = with_params.select(
        "template_id", F.explode("parameters").alias("k", "v")
    ).filter(F.col("k").endswith("_OBA")).withColumn("num", F.col("v").cast("double"))
    flagged = zscore_anomalies(vals, ["template_id", "k"], "num", sigma=6.0)
    assert flagged.filter(~F.col("is_anomaly")).count() > 0
