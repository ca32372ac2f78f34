"""Catalog-wide oracle output-type lint.

No oracle output column may type as HUGEINT / UHUGEINT / DECIMAL: the
driver's hash path converts the oracle result through pandas
(``fetchdf()``), which renders those as float64 ("1105044.0") against
Spark's int64 ("1105044") — rows and schema match, the value hash
doesn't.  That was the entire q141/q142 r05+r06 driver red (an uncast
``sum()//count()`` output column).  DuckDB type resolution is lazy
(``con.sql(...).types``), so this lint plans every oracle without
executing it.
"""

from __future__ import annotations

import pytest

from themis_tritonsort_spark.queries import ORACLES

from .oracle_harness import duck_connection

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


_KIND_PROBES = [
    # (probe SQL, has_null) — every DuckDB type class an oracle can
    # emit; duck_pandas_kind's derived kind must equal what a real
    # fetchdf() produces, or the harness dtype check drifts from the
    # driver's actual hash path.
    ("SELECT 1::BIGINT AS c", False),
    ("SELECT * FROM (VALUES (1::BIGINT), (NULL)) t(c)", True),
    ("SELECT 1::INTEGER AS c", False),
    ("SELECT 1::UTINYINT AS c", False),
    ("SELECT (1::HUGEINT) AS c", False),
    ("SELECT 1.5::DECIMAL(10,2) AS c", False),
    ("SELECT 1.5::DOUBLE AS c", False),
    ("SELECT 'x' AS c", False),
    ("SELECT '\\x01'::BLOB AS c", False),
    ("SELECT DATE '2020-01-01' AS c", False),
    ("SELECT TIMESTAMP '2020-01-01 00:00:00' AS c", False),
    ("SELECT TRUE AS c", False),
    ("SELECT * FROM (VALUES (TRUE), (NULL)) t(c)", True),
    ("SELECT [1, 2] AS c", False),
]


@pytest.mark.parametrize("probe,has_null", _KIND_PROBES)
def test_duck_pandas_kind_matches_real_fetchdf(duck, probe, has_null):
    from .oracle_harness import duck_pandas_kind

    rel = duck.sql(probe)
    derived = duck_pandas_kind(str(rel.types[0]), has_null)
    actual = duck.execute(probe).fetchdf()["c"].dtype.kind
    assert derived == actual, (probe, str(rel.types[0]))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_survive_pandas(duck, name):
    rel = duck.sql(ORACLES[name])
    bad = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in BANNED)
    }
    assert not bad, (
        f"{name}: these oracle columns render as float64/object in the "
        f"driver's pandas hash path while Spark stays integer — add a "
        f"CAST(... AS BIGINT) in the final SELECT: {bad}"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_every_oracle_type_is_kind_mapped(duck, name):
    """VERDICT r07 #5: duck_pandas_kind now RAISES on DuckDB types it
    has never pinned against a real fetchdf().  Plan every catalog
    oracle (lazy — no execution) and derive a kind for every output
    column, so an oracle that starts emitting an unmapped type class
    (INTERVAL, STRUCT, ...) breaks the suite instead of silently
    drifting from the driver's pandas hash path."""
    from .oracle_harness import duck_pandas_kind

    rel = duck.sql(ORACLES[name])
    for c, t in zip(rel.columns, rel.types):
        for has_null in (False, True):
            duck_pandas_kind(str(t), has_null)  # must not raise


def test_unmapped_duck_type_fails_loudly():
    from .oracle_harness import duck_pandas_kind

    with pytest.raises(ValueError, match="unmapped DuckDB type"):
        duck_pandas_kind("INTERVAL", False)
    with pytest.raises(ValueError, match="unmapped DuckDB type"):
        duck_pandas_kind("STRUCT(a BIGINT)", False)
