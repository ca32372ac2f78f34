"""Self-describing KVPair byte format — byte-level parity for the
reference's intermediate/input tuple files (S5).

Layout per tuple (``mapreduce/common/KeyValuePair.h:12-23``; the
header is a packed pair of uint32s, native little-endian on the
reference's x86 targets):

    uint32 keyLength | uint32 valueLength | key bytes | value bytes

A file is a bare concatenation of tuples — no file header, footer, or
alignment.  The reference parses these out of fixed-size
ByteStreamBuffers, carrying partial headers and partial tuples across
buffer boundaries (``workers/bytestreamconverter/
KVPairFormatReader.cc:107-210``: the headerBytesNeeded /
overflowBuffer state machine).  ``read_kvpair`` reproduces that
chunked scan — tuples may straddle any read-chunk boundary — with the
carry expressed as a remainder buffer instead of an explicit overflow
allocation (bounded by one tuple, exactly like the reference's
overflow buffer).

Scale: like ``write_gensort``, files are written from the executors
(one file per partition) and read as one task per file; storage must
be reachable from every executor (local FS in local mode, shared
FS/object store on a cluster).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_HEADER = struct.Struct("<II")
HEADER_SIZE = _HEADER.size  # KeyValuePair::HEADER_SIZE == 8


def write_kvpair(df: DataFrame, path: str) -> None:
    """Write (key binary, value binary) rows as self-describing KVPair
    files, one ``part-NNNNN`` per partition in partition order."""
    os.makedirs(path, exist_ok=True)

    def _dump(idx: int, it) -> Iterator[tuple[int, int]]:
        # struct.pack by name: a module-level struct.Struct does not
        # pickle into the task closure
        pack = struct.pack
        n = 0
        with open(os.path.join(path, f"part-{idx:05d}"), "wb") as f:
            for row in it:
                key = bytes(row.key) if row.key is not None else b""
                value = bytes(row.value) if row.value is not None else b""
                f.write(pack("<II", len(key), len(value)))
                f.write(key)
                f.write(value)
                n += 1
        yield idx, n

    counts = df.rdd.mapPartitionsWithIndex(_dump).collect()
    for idx, n in counts:
        if n == 0:
            os.remove(os.path.join(path, f"part-{idx:05d}"))


def iter_kvpairs(f, chunk_size: int) -> Iterator[tuple[bytes, bytes]]:
    """Parse a KVPair byte stream read in ``chunk_size`` buffers.

    Mirrors KVPairFormatReader.cc's three cases per buffer — complete
    tuples, a partial header at the buffer edge, and a complete header
    whose tuple body continues in the next buffer — via a remainder
    carry that never exceeds header + one tuple."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    buf = b""
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            break
        buf += chunk
        off = 0
        while len(buf) - off >= HEADER_SIZE:
            klen, vlen = _HEADER.unpack_from(buf, off)
            end = off + HEADER_SIZE + klen + vlen
            if len(buf) < end:
                break  # partial tuple: carry and keep reading
            kstart = off + HEADER_SIZE
            yield buf[kstart : kstart + klen], buf[kstart + klen : end]
            off = end
        buf = buf[off:]
    if buf:
        raise ValueError(
            f"truncated KVPair stream: {len(buf)} trailing bytes"
        )


def read_kvpair(
    spark: SparkSession, path: str, chunk_size: int = 4 << 20
) -> DataFrame:
    """Read a KVPair directory (or single file) as (key binary, value
    binary) — one task per file, each streaming its file in
    ``chunk_size`` buffers (never loading whole files)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    else:
        files = [path]

    def _read(file_path: str) -> Iterator[tuple[bytes, bytes]]:
        with open(file_path, "rb") as f:
            yield from iter_kvpairs(f, chunk_size)

    rdd = (
        spark.sparkContext.parallelize(files, max(len(files), 1))
        .flatMap(_read)
    )
    return spark.createDataFrame(rdd, schema="key binary, value binary")
