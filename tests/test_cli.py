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


def test_cli_gensort_valsort_roundtrip(spark, capsys, tmp_path):
    recs = tmp_path / "recs"
    rc = main(["--gensort", "1000", "--output", str(recs)])
    assert rc == 0
    out = capsys.readouterr().out
    # bare hex checksum, identical to the reference binary's stderr line
    assert "1ea6370b955" in out

    # raw (unsorted) input: valsort reports order failure via exit code
    rc = main(["--valsort", str(recs)])
    assert rc == 1
    assert "checksum=1ea6370b955" in capsys.readouterr().out


def test_cli_gensort_checksum_only(capsys):
    rc = main(["--gensort", "2000", "--start", "5000"])
    assert rc == 0
    assert "3f070c88a47" in capsys.readouterr().out


def test_driver_sim_staleness_report():
    """tools/driver_sim.py's freshness audit: windowed entries always
    count as current, never-gated non-window entries warn, and a row
    within the last round stays quiet — the rotation-debt contract."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from driver_sim import WINDOW, staleness_report

    import __spark_entry__ as em

    names = list(em.queries())
    warnings = staleness_report(names)
    flagged = {w.split()[1].rstrip(":") for w in warnings}
    # nothing inside this round's window may be flagged
    assert not (flagged & set(names[:WINDOW]))
    # every flagged entry really is outside the window
    assert flagged <= set(names[WINDOW:])
