"""GraySort 100-byte record source/sink + valsort-style validation.

Reference formats:
  - gensort record: 10-byte key + 90-byte payload, no headers
    (``src/gensort/gensort.c:60-80``; reader config
    ``FixedSizeKVPairFormatReader.cc:11-60``,
    ``job_spec_generators/graysort.py:17-27``).
  - sort order: unsigned lexicographic byte comparison
    (``src/tritonsort/core/Comparison.h:15-30``) — exactly Spark's
    BinaryType ordering.
  - validation: valsort checks global order + record checksums
    (``src/gensort/valsort.c``, ``scripts/valsort/validate.py:37-53``).

Spark-first: ``binaryRecords`` gives a fixed-size record scan; the sort
is plain ``df.sort(key)`` (RangePartitioner = phase 0, shuffle =
phase 1, Tungsten external sort = phases 2/3).  The writer concatenates
raw records per partition so output files are byte-identical to what
the reference's headerless writer produces (``main.cc:1313-1326``
WRITE_WITHOUT_HEADERS).
"""

from __future__ import annotations

import glob
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_LEN = 100
KEY_LEN = 10


def read_gensort(spark: SparkSession, path: str) -> DataFrame:
    """Read headerless 100-byte gensort records as (key binary, value
    binary).  Distributed fixed-size record scan via binaryRecords."""
    rdd = spark.sparkContext.binaryRecords(path, RECORD_LEN)
    split = rdd.map(lambda rec: (rec[:KEY_LEN], rec[KEY_LEN:]))
    return spark.createDataFrame(split, schema="key binary, value binary")


def sort_records(df: DataFrame) -> DataFrame:
    """Total order by unsigned-lexicographic key: BinaryType ordering
    matches Comparison.h:15-30 including shorter-key-first on prefix
    ties (verified in tests)."""
    return df.sort("key")


def sort_records_secondary(df: DataFrame, secondary_bytes: int = 8) -> DataFrame:
    """USE_SECONDARY_KEYS sort: order by key, then by the first
    ``secondary_bytes`` of the value (QuickSortStrategy.h:77-91;
    ``mapreduce/defaults.yaml:238``) — the reference uses this to
    time-order click events within a user.  A composite sort key, one
    range shuffle, same as the primary-only path."""
    return df.sort(F.col("key"), F.substring(F.col("value"), 1, secondary_bytes))


def write_gensort(df: DataFrame, path: str) -> None:
    """Write headerless concatenated 100-byte records, one file per
    partition (named part-NNNNN in partition order so the global order
    is file order + offset order, like the reference's partition
    files).

    Files are written FROM THE EXECUTORS (each task streams its own
    partition to storage, like the reference's Writer workers,
    ``workers/writer/Writer.cc``) — only per-file record counts return
    to the driver.  Requires ``path`` to be on storage all executors
    reach (local FS in local mode, shared FS/object store on a
    cluster).
    """
    os.makedirs(path, exist_ok=True)

    def _dump(idx: int, it):
        n = 0
        with open(os.path.join(path, f"part-{idx:05d}"), "wb") as f:
            for row in it:
                f.write(row.key)
                f.write(row.value)
                n += 1
        yield idx, n

    counts = df.rdd.mapPartitionsWithIndex(_dump).collect()
    # Drop empty partition files for cleanliness.
    for idx, n in counts:
        if n == 0:
            os.remove(os.path.join(path, f"part-{idx:05d}"))


def valsort_check(spark: SparkSession, path: str) -> dict:
    """valsort-equivalent validation of a written record directory:
    global unsigned-lex order across files-in-order, plus an
    order-insensitive content checksum (sum of per-record crc32, mod
    2^64 — same *shape* of invariant as valsort's checksum-of-checksums;
    we don't reproduce gensort's exact CRC polynomial seeds).

    Distributed: per-file order/summaries are computed in parallel;
    only (file, first_key, last_key, count, checksum) hits the driver.
    """
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    sc = spark.sparkContext

    def summarize(f: str):
        with open(f, "rb") as fh:
            data = fh.read()
        n = len(data) // RECORD_LEN
        ok = True
        prev = None
        csum = 0
        for i in range(n):
            rec = data[i * RECORD_LEN : (i + 1) * RECORD_LEN]
            k = rec[:KEY_LEN]
            if prev is not None and k < prev:
                ok = False
            prev = k
            csum = (csum + zlib.crc32(rec)) % (1 << 64)
        first = data[:KEY_LEN] if n else b""
        last = data[(n - 1) * RECORD_LEN : (n - 1) * RECORD_LEN + KEY_LEN] if n else b""
        return f, ok, n, first, last, csum

    summaries = sc.parallelize(files, max(1, len(files))).map(summarize).collect()
    summaries.sort()  # file name order == partition order
    sorted_within = all(s[1] for s in summaries)
    boundaries_ok = all(
        summaries[i][4] <= summaries[i + 1][3]
        for i in range(len(summaries) - 1)
        if summaries[i][2] and summaries[i + 1][2]
    )
    return {
        "records": sum(s[2] for s in summaries),
        "sorted": sorted_within and boundaries_ok,
        "checksum": sum(s[5] for s in summaries) % (1 << 64),
    }


def generate_records(
    spark: SparkSession, n: int, seed: int = 42, skewed: bool = False
) -> DataFrame:
    """Deterministic gensort-style fixture: (key binary(10),
    value binary(90)).  Keys uniform random bytes (or skewed: top bits
    zeroed, concentrating the keyspace like gensort -s); value is a
    deterministic function of the row index.  All JVM-side.
    """
    df = spark.range(n)
    # 10 key bytes from two independent xxhash64 draws.
    h1 = F.xxhash64(F.col("id"), F.lit(seed))
    h2 = F.xxhash64(F.col("id"), F.lit(seed + 1))
    key = F.concat(
        F.substring(F.unhex(F.lpad(F.hex(h1), 16, "0")), 1, 8),
        F.substring(F.unhex(F.lpad(F.hex(h2), 16, "0")), 1, 2),
    )
    if skewed:
        key = F.concat(F.lit(b"\x00\x00"), F.substring(key, 1, 8))
    # 90 value bytes: index rendered + xxhash padding, truncated.
    v1 = F.unhex(F.lpad(F.hex(F.xxhash64(F.col("id"), F.lit(seed + 2))), 16, "0"))
    value = F.substring(
        F.concat(F.lpad(F.col("id").cast("string"), 10, "0").cast("binary"), *([v1] * 10)),
        1,
        90,
    )
    return df.select(key.alias("key"), value.alias("value"))
