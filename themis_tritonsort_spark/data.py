"""Testdata table loading (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table per scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS).  Spark (with
# spark.sql.legacy.parquet.nanosAsLong) reads them as long nanos; we
# convert to TimestampType by integer-dividing to micros — exactly the
# truncation DuckDB applies when it reads the same files as TIMESTAMP.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make an externally-created SparkSession (the driver's) behave like
    ours for the two confs correctness depends on.  Both are runtime-set
    SQL confs; ignore failures so a locked-down session still reads the
    micros-typed testdata (round-1 driver sessions choked on
    TIMESTAMP(NANOS) parquet without nanosAsLong)."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (columnar parquet scan —
    column pruning and predicate pushdown apply downstream)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, ()):
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # Session TZ is pinned to UTC, so NTZ -> LTZ keeps the instant.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() plans can
    reference them by name (mirrors the DuckDB oracle's view setup)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
