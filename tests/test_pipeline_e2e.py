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

    # simulate a crash after 1 of 3 commits: keep the run header + the
    # first group entry, leave the (possibly orphaned) files in place
    mpath = os.path.join(out, "_manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    with open(mpath, "w") as f:
        f.write(lines[0] + "\n" + lines[1] + "\n")

    res = run_pipeline(
        spark, transcripts, out, commit_groups=3, resume=True, write_aggregates=False
    )
    assert _routed_fingerprint(spark, os.path.join(out, "routed")) == golden
    m2 = CheckpointManifest.load(mpath)
    assert set(m2.entries) == set(golden_manifest.entries)
    # unit 0 must NOT have been recomputed: entry identical incl. timestamp
    assert m2.entries["bucket_group=0"] == golden_manifest.entries["bucket_group=0"]
    assert res.n_rows == transcripts.count()


def test_pipeline_resume_refuses_foreign_manifest(spark, transcripts, tmp_path):
    """A manifest written by a DIFFERENT input/config must be discarded,
    not silently mixed (r1 ADVICE; reproduced live against a stale round-1
    output dir before this fix)."""
    out = str(tmp_path / "run_foreign")
    other = transcripts.limit(2000)
    run_pipeline(spark, other, out, commit_groups=3, resume=False, write_aggregates=False)
    stale_rows = CheckpointManifest.load(os.path.join(out, "_manifest.jsonl")).metrics()["rows"]

    res = run_pipeline(
        spark, transcripts, out, commit_groups=3, resume=True, write_aggregates=False
    )
    # full recompute on the real input — no stale rows leak into the total
    assert res.n_rows == transcripts.count() != stale_rows
    m = CheckpointManifest.load(os.path.join(out, "_manifest.jsonl"))
    assert len(m.entries) == 3
    assert _routed_fingerprint(spark, os.path.join(out, "routed")) == _routed_fingerprint(
        spark,
        run_pipeline(
            spark, transcripts, str(tmp_path / "run_clean"), commit_groups=3,
            resume=False, write_aggregates=False,
        ).routed_dir,
    )


def test_pipeline_resume_reuses_persisted_dictionary(spark, transcripts, tmp_path):
    """Resumed runs must share template ids with committed groups via the
    persisted dictionary, not a rebuild."""
    import json as _json

    out = str(tmp_path / "run_dict")
    res1 = run_pipeline(spark, transcripts, out, commit_groups=2, resume=False, write_aggregates=False)
    dict_path = os.path.join(out, "_dictionary.json")
    saved = _json.load(open(dict_path))
    assert saved["templates"] == res1.dictionary.templates

    # drop the second group; poison the in-memory rebuild path by checking
    # the resumed dictionary comes from disk (same object content)
    mpath = os.path.join(out, "_manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    with open(mpath, "w") as f:
        f.write(lines[0] + "\n" + lines[1] + "\n")
    res2 = run_pipeline(spark, transcripts, out, commit_groups=2, resume=True, write_aggregates=False)
    assert res2.dictionary.templates == res1.dictionary.templates
    assert res2.dictionary.pool.mapping() == res1.dictionary.pool.mapping()


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


def test_route_stage_iceberg_fallback(spark, transcripts, tmp_path):
    """K1/K2 Iceberg slot: with no runtime jar in the sandbox (documented
    install attempt in route.py), route_stage_iceberg must take the
    parquet fallback and produce the standard layout; with the jar it
    would run writeTo(...).partitionedBy(bucket, days, template_id)."""
    from sherlog_parser_spark.data.dims import role_tool_dim
    from sherlog_parser_spark.plans.dictionary import build_template_dictionary
    from sherlog_parser_spark.plans.enrich import enrich_stage
    from sherlog_parser_spark.plans.parse import parse_stage
    from sherlog_parser_spark.plans.route import iceberg_available, route_stage_iceberg

    parsed = parse_stage(transcripts.limit(500))
    tdict = build_template_dictionary(parsed)
    enriched = enrich_stage(parsed, tdict.df, role_tool_dim(spark))
    out = str(tmp_path / "ice_fallback")

    assert not iceberg_available(spark)  # sandbox fact, recorded
    path_taken = route_stage_iceberg(enriched, "ice.db.turns", fallback_dir=out)
    assert path_taken == "parquet-fallback"
    got = spark.read.parquet(out)
    assert got.count() == 500
    assert "conv_bucket" in got.columns
    # and with no fallback it must fail loudly, not write anywhere
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        route_stage_iceberg(enriched, "ice.db.turns")
