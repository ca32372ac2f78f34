"""Tests for the session-conf pinning in data._ensure_session_confs:
the silent-timezone-shift class of bug (ADVICE r2) must stay loud."""

from __future__ import annotations

import warnings

from themis_tritonsort_spark.data import _ensure_session_confs, table

from .conftest import SF_SMOKE


def test_confs_noop_when_already_pinned(spark):
    # Values already correct -> no warning, no change.
    _ensure_session_confs(spark)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _ensure_session_confs(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_override_of_foreign_timezone_warns_and_pins(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            _ensure_session_confs(spark)
        assert any("timeZone" in str(w.message) for w in caught)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # and the read path still produces UTC-correct instants
        assert table(spark, SF_SMOKE, "events").select("ts").first() is not None
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
