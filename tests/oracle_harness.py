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
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in res.fetchall()]

    # Driver-hash-path dtype parity: the oracle must survive pandas
    # conversion with the same dtype kind as the Spark result does.
    dtype_mismatch = {}
    if duck_cols == spark_cols:
        duck_pdf = con.execute(oracle).fetchdf()
        for c in spark_cols:
            allowed = _expected_pandas_kinds(fields[c], nulls[c])
            kind = duck_pdf[c].dtype.kind
            if kind not in allowed:
                dtype_mismatch[c] = {
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
