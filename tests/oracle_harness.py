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


def compare(spark, sf_dir: str, spark_fn, oracle: str) -> dict:
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_norm(row[c]) for c in spark_cols) for row in sdf.collect()
    ]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    duck_cols_raw = [d[0] for d in res.description]
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in res.fetchall()]
    con.close()

    out = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": spark_cols,
        "cols_duck": duck_cols,
        "cols_match": spark_cols == duck_cols,
        "rows_match": len(spark_rows) == len(duck_rows),
        "values_match": Counter(spark_rows) == Counter(duck_rows),
    }
    out["ok"] = out["cols_match"] and out["rows_match"] and out["values_match"]
    if not out["values_match"]:
        s, d = Counter(spark_rows), Counter(duck_rows)
        only_s = list((s - d).items())[:3]
        only_d = list((d - s).items())[:3]
        out["sample_only_spark"] = only_s
        out["sample_only_duck"] = only_d
    return out
