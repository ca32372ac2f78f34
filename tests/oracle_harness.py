"""Local mirror of the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL over the same parquet tables and
compares row count, column names, and the order-insensitive multiset of
values (stringified, column-name-sorted) — the same gate shape as
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

from themis_tritonsort_spark.data import TABLES


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _expected_pandas_kinds(field, has_null: bool) -> set:
    """Pandas dtype *kinds* an oracle column may render as, given the
    Spark column's type and whether the Spark result contains nulls.

    Mirrors the driver's hash path: the driver converts BOTH results
    through pandas before stringifying, so a DuckDB column whose
    fetchdf() dtype kind differs from the Spark side's pandas rendering
    (e.g. HUGEINT -> float64 vs Spark int64 — the q141/q142 r05+r06
    red) hash-mismatches even when every value is equal.  Nullable
    integer columns float on BOTH sides (the benign q36/q45/q57/q89
    class), hence the has_null branch.
    """
    t = field.dataType.simpleString()
    if t in ("tinyint", "smallint", "int", "bigint"):
        return {"f"} if has_null else {"i", "u"}
    if t in ("float", "double"):
        return {"f"}
    if t == "boolean":
        return {"b", "O"}
    if t in ("date", "timestamp", "timestamp_ntz"):
        return {"M", "O"}
    return {"O"}


_DUCK_INT_PREFIXES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")


def duck_pandas_kind(type_name: str, has_null: bool) -> str:
    """Pandas dtype KIND that duckdb's fetchdf() renders this column
    as — the driver's hash path — derived from the lazily-planned
    DuckDB type plus observed nulls, so compare() never has to execute
    the oracle a second time just to read dtypes.  The mapping is
    pinned against real fetchdf() behavior per type in
    tests/test_oracle_types.py."""
    t = type_name.upper()
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "f"
    if t in _DUCK_INT_PREFIXES:
        return "f" if has_null else "i"
    if t.startswith("U") and t[1:] in _DUCK_INT_PREFIXES:
        return "f" if has_null else "u"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "f"
    if t == "BOOLEAN":
        return "O" if has_null else "b"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "M"
    if t in ("VARCHAR", "BLOB") or t.endswith("[]"):
        return "O"
    # Fail LOUDLY on anything unmapped (VERDICT r07 #5): a new DuckDB
    # type class (INTERVAL, STRUCT, MAP, UUID, ...) whose fetchdf()
    # dtype kind we have never pinned must break the suite here, not
    # silently default to "O" and drift from the driver's actual
    # pandas hash path.  To extend: pin the real fetchdf() kind with a
    # _KIND_PROBES row in tests/test_oracle_types.py, then map it.
    raise ValueError(
        f"duck_pandas_kind: unmapped DuckDB type {type_name!r} — pin its "
        "fetchdf() dtype kind in tests/test_oracle_types.py::_KIND_PROBES "
        "and extend the mapping"
    )


def compare(spark, sf_dir: str, spark_fn, oracle: str) -> dict:
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    collected = sdf.collect()
    spark_rows = [tuple(_norm(row[c]) for c in spark_cols) for row in collected]
    nulls = {
        c: any(row[c] is None for row in collected) for c in spark_cols
    }
    fields = {f.name: f for f in sdf.schema.fields}

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    duck_cols_raw = [d[0] for d in res.description]
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    raw_rows = res.fetchall()
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in raw_rows]

    # Driver-hash-path dtype parity: the oracle must survive pandas
    # conversion with the same dtype kind as the Spark result does
    # (DuckDB type resolution is lazy — no second execution).
    dtype_mismatch = {}
    if duck_cols == spark_cols:
        rel = con.sql(oracle)
        duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        for c in spark_cols:
            j = duck_cols_raw.index(c)
            duck_null = any(r[j] is None for r in raw_rows)
            kind = duck_pandas_kind(duck_types[c], duck_null)
            allowed = _expected_pandas_kinds(fields[c], nulls[c])
            if kind not in allowed:
                dtype_mismatch[c] = {
                    "duck_type": duck_types[c],
                    "duck_pandas_kind": kind,
                    "expected_kinds": sorted(allowed),
                    "spark_type": fields[c].dataType.simpleString(),
                    "spark_has_null": nulls[c],
                }
    con.close()

    out = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": spark_cols,
        "cols_duck": duck_cols,
        "cols_match": spark_cols == duck_cols,
        "rows_match": len(spark_rows) == len(duck_rows),
        "values_match": Counter(spark_rows) == Counter(duck_rows),
        "dtypes_match": not dtype_mismatch,
    }
    if dtype_mismatch:
        out["dtype_mismatch"] = dtype_mismatch
    out["ok"] = (
        out["cols_match"]
        and out["rows_match"]
        and out["values_match"]
        and out["dtypes_match"]
    )
    if not out["values_match"]:
        s, d = Counter(spark_rows), Counter(duck_rows)
        only_s = list((s - d).items())[:3]
        only_d = list((d - s).items())[:3]
        out["sample_only_spark"] = only_s
        out["sample_only_duck"] = only_d
    return out
