"""Bucketed parquet tables — the storage layout that deletes the join
shuffle (beyond-reference scale feature).

Reference parity: TritonSort's whole design is "make the storage layout
BE the partitioning" — phase one writes each logical disk's partition
files so phase two can sort every partition without moving data again
(writer chains in `src/tritonsort/mapreduce/workers/writer/
BaseWriter.cc:349`, partition-count derivation from
`INTERMEDIATE_TO_INPUT_RATIO` in `src/tritonsort/mapreduce/
defaults.yaml:371`).  Spark's equivalent is a bucketed table:
``bucketBy(n, key)`` hash-partitions rows into a fixed set of files
per key and records that fact in the catalog, so every later join or
aggregation on that key reads pre-partitioned data and Catalyst plans
NO Exchange — at 100 TB the dominant cost of a fact-fact join.

Usage shape for the big TPC-H-ish facts::

    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 1024,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "orders_b", ["o_orderkey"], 1024,
                   sort_cols=["o_orderkey"])
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # physical plan: two bucketed scans -> SortMergeJoin, no Exchange

Bucket-count sizing at 100 TB: one bucket should fit an executor's
shuffle-free sort (~256 MB-1 GB of the larger fact), and BOTH sides
must use the same count (Spark joins co-bucketed scans shuffle-free
only on equal bucket counts; with unequal counts it re-shuffles the
smaller side).  ``sort_cols`` pre-sorts each bucket file so the
sort-merge join skips its Sort as well.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table.  The bucketing metadata lives in the catalog, so the
    shuffle elision applies to every subsequent reader of the table.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back; the scan reports the bucket spec as
    its output partitioning, which is what lets EnsureRequirements drop
    the Exchange for joins/aggs on the bucket columns."""
    return spark.table(table_name)


def drop_bucketed(spark: SparkSession, table_name: str) -> None:
    """Drop the catalog entry (and managed files) for a bucketed table."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Hive-style directory partitioning (``partitionBy``) — the layout
    for time-organized event data.  A reader filtering on the partition
    column prunes whole directories before any I/O (``PartitionFilters``
    in the scan), so a one-day query over a year of 100 TB events reads
    1/365th of the files.  Partition columns must be low-cardinality
    (date, type — NOT user_id: millions of tiny directories break the
    file listing); combine with in-file sorting or bucketing for the
    high-cardinality keys.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)
