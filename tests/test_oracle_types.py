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
