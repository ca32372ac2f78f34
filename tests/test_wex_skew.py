"""WEX parser parity vectors + skew operator equivalence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_tritonsort_spark.functions.wex import (
    adjacency,
    extract_links,
    extract_text,
    parse_wex,
)
from themis_tritonsort_spark.operators.skew import salted_count
from themis_tritonsort_spark.sources.gensort import sort_records_secondary

WEX_ROW = (
    "42\tSpark_(software)\t2011-01-01\t"
    "<page><link><target>Apache Hadoop</target></link>"
    "<text>x</text><link><target>MapReduce</target></link>"
    "<link><target>Apache Hadoop</target></link></page>\t"
    "Apache Spark is a cluster computing framework"
)


def test_parse_and_extract_links(spark):
    df = spark.createDataFrame([(WEX_ROW,)], "value string")
    wex = parse_wex(df)
    row = wex.first()
    assert row["page_id"] == 42
    assert row["page_name"] == "Spark_(software)"
    links = extract_links(wex).collect()
    # per-occurrence emission, duplicates preserved (F3 scanner behavior)
    assert [r["target"] for r in links] == [
        "Apache Hadoop", "MapReduce", "Apache Hadoop",
    ]
    txt = extract_text(wex).first()
    assert txt["plain_text"].startswith("Apache Spark")


def test_adjacency_sorted_distinct(spark):
    df = spark.createDataFrame([(WEX_ROW,)], "value string")
    adj = adjacency(extract_links(parse_wex(df))).first()
    assert adj["neighbors"] == ["Apache Hadoop", "MapReduce"]
    assert adj["rank0"] == 1.0


def test_salted_count_equals_plain_count(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k")  # 3 hot keys
    )
    salted = {
        (r["k"],): r["cnt"] for r in salted_count(df, ["k"], salt_buckets=8).collect()
    }
    plain = {
        (r["k"],): r["cnt"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert salted == plain


def test_secondary_key_sort(spark):
    rows = [
        (b"k1", b"\x00\x00\x00\x00\x00\x00\x00\x02rest"),
        (b"k1", b"\x00\x00\x00\x00\x00\x00\x00\x01rest"),
        (b"k0", b"\x00\x00\x00\x00\x00\x00\x00\x09rest"),
    ]
    df = spark.createDataFrame(rows, "key binary, value binary")
    got = [
        (bytes(r["key"]), bytes(r["value"])[7])
        for r in sort_records_secondary(df).collect()
    ]
    assert got == [(b"k0", 9), (b"k1", 1), (b"k1", 2)]
