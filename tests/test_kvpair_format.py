"""Byte-level parity tests for the self-describing KVPair format (S5).

The layout is pinned against the reference's header struct
(KeyValuePair.h:12-23: packed little-endian uint32 keyLength,
uint32 valueLength), and the reader is stressed with read-chunk sizes
smaller than a header so tuples straddle every buffer boundary —
the KVPairFormatReader.cc:107-210 overflow cases.
"""

from __future__ import annotations

import io
import os
import shutil
import struct

import pytest

from themis_tritonsort_spark.sources.kvpair import (
    HEADER_SIZE,
    iter_kvpairs,
    read_kvpair,
    write_kvpair,
)

SCRATCH = os.path.join(os.path.dirname(__file__), "..", "scratch", "kvpair")


@pytest.fixture()
def workdir():
    os.makedirs(SCRATCH, exist_ok=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


PAIRS = [
    (b"alpha", b"first value"),
    (b"", b"empty key"),
    (b"empty value", b""),
    (b"k", b"v" * 1000),  # value far larger than any read chunk
    (b"", b""),
]


def _reference_bytes(pairs) -> bytes:
    # the layout as KeyValuePair.h defines it, built independently of
    # the writer under test
    out = b""
    for k, v in pairs:
        out += struct.pack("<II", len(k), len(v)) + k + v
    return out


def test_header_size_matches_reference():
    assert HEADER_SIZE == 8  # KeyValuePair::HEADER_SIZE


def test_writer_layout_pinned(spark, workdir):
    df = spark.createDataFrame(PAIRS, "key binary, value binary").coalesce(1)
    out = os.path.join(workdir, "pinned")
    write_kvpair(df, out)
    files = sorted(os.listdir(out))
    assert len(files) == 1
    with open(os.path.join(out, files[0]), "rb") as f:
        written = f.read()
    # row order within one partition is the DataFrame order
    assert written == _reference_bytes(PAIRS)


@pytest.mark.parametrize("chunk_size", [1, 3, 7, 8, 13, 4096])
def test_reader_survives_any_buffer_boundary(chunk_size):
    # chunk sizes below HEADER_SIZE force partial headers; odd sizes
    # force tuples split mid-key and mid-value — every overflow case
    # in KVPairFormatReader.cc:107-210
    raw = _reference_bytes(PAIRS)
    got = list(iter_kvpairs(io.BytesIO(raw), chunk_size))
    assert got == PAIRS


def test_reader_rejects_truncated_stream():
    raw = _reference_bytes(PAIRS)[:-1]
    with pytest.raises(ValueError, match="truncated"):
        list(iter_kvpairs(io.BytesIO(raw), 7))


def test_roundtrip_multifile(spark, workdir):
    df = spark.createDataFrame(PAIRS * 10, "key binary, value binary").repartition(4)
    out = os.path.join(workdir, "rt")
    write_kvpair(df, out)
    back = read_kvpair(spark, out, chunk_size=16)
    got = sorted(
        (bytes(r["key"]), bytes(r["value"])) for r in back.collect()
    )
    assert got == sorted(PAIRS * 10)


def test_gensort_records_through_kvpair_format(spark, workdir):
    # the reference uses this format for intermediate tuple files; a
    # sort job must survive the format roundtrip bit-exactly
    from themis_tritonsort_spark.sources.gensort import (
        gensort_checksum,
        gensort_records,
        sort_records,
    )

    recs = gensort_records(spark, 500, num_partitions=3)
    expected = gensort_checksum(recs)
    out = os.path.join(workdir, "gensort_kv")
    write_kvpair(recs, out)
    back = sort_records(read_kvpair(spark, out, chunk_size=256))
    assert gensort_checksum(back) == expected
    keys = [bytes(r["key"]) for r in back.collect()]
    assert keys == sorted(keys)


def test_kvpair_stream_property_random_pairs_and_chunks():
    # property: ANY pair list survives ANY chunking of the byte stream
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(st.binary(max_size=40), st.binary(max_size=120)),
            max_size=12,
        ),
        chunk=st.integers(min_value=1, max_value=64),
    )
    def check(pairs, chunk):
        raw = _reference_bytes(pairs)
        assert list(iter_kvpairs(io.BytesIO(raw), chunk)) == pairs

    check()
