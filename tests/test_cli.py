"""In-process tests for the job-runner CLI (run.main)."""

from __future__ import annotations

import json

from themis_tritonsort_spark.run import main

from .conftest import SF_SMOKE


def test_cli_runs_catalog_query(spark, capsys, tmp_path):
    out = tmp_path / "q16"
    rc = main(["--query", "q16_top_customers", "--sf-dir", SF_SMOKE,
               "--output", str(out)])
    assert rc == 0
    assert spark.read.parquet(str(out)).count() == 10


def test_cli_rejects_unknown_query(capsys):
    assert main(["--query", "nope", "--sf-dir", SF_SMOKE]) == 2


def test_cli_runs_job_spec_chain(spark, tmp_path):
    spec = [
        {"map_function": "WordCountMapFunction", "params": {"COLUMN": "text"},
         "input_table": "documents", "reduce_function": "WordCountReduceFunction"},
    ]
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    out = tmp_path / "wc"
    rc = main(["--spec", str(p), "--sf-dir", SF_SMOKE, "--output", str(out)])
    assert rc == 0
    assert spark.read.parquet(str(out)).count() > 0
