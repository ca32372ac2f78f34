"""WEX (Wikipedia Extraction) row parsing — reference F3/F4 parity.

The reference consumes tab-delimited WEX rows
``page_id \\t page_name \\t date \\t xml \\t plain_text`` and extracts:

  - links: scans the xml field for ``<link><target>NAME<`` runs and
    emits (page_name, target) per link
    (``functions/map/WEXLinkExtractorMapFunction.cc:4-89``);
  - text: emits (page_name, plain_text) — the 5th field
    (``functions/map/WEXTextExtractorMapFunction.cc:93-151``).

Both are pure column expressions: split + regexp_extract_all, fully
codegen-friendly.  The reference then murmur-hashes page names to 8-byte
keys (``WEXAdjacencyToPageRankReducer.cc:259``) purely as a key
compression trick; we keep real names (SURVEY §4 item 3) and offer
xxhash64 for the same compression when wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <link><target>CAPTURE< — non-greedy up to the next tag open.
LINK_TARGET_REGEX = "<link><target>([^<]*)<"

WEX_COLS = ("page_id", "page_name", "date", "xml", "plain_text")


def parse_wex(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Split a raw tab-delimited WEX line into typed columns
    (WEXLinkExtractorMapFunction.cc:9-13 field layout)."""
    parts = F.split(F.col(line_col), "\t")
    # F.get (not getItem): null on missing fields instead of an ANSI
    # out-of-bounds error — malformed rows parse as partial, not crash.
    return df.select(
        F.get(parts, 0).cast("long").alias("page_id"),
        F.get(parts, 1).alias("page_name"),
        F.get(parts, 2).alias("date"),
        F.get(parts, 3).alias("xml"),
        F.get(parts, 4).alias("plain_text"),
    )


def extract_links(wex: DataFrame) -> DataFrame:
    """(page_name, target) per link occurrence, in document order —
    matching the reference scanner's per-match emission (F3)."""
    return wex.select(
        "page_name",
        F.explode(
            F.regexp_extract_all("xml", F.lit(LINK_TARGET_REGEX), 1)
        ).alias("target"),
    )


def extract_text(wex: DataFrame) -> DataFrame:
    """(page_name, plain_text) — F4."""
    return wex.select("page_name", "plain_text")


def adjacency(links: DataFrame, hash_names: bool = False) -> DataFrame:
    """Per-page adjacency list (WEXAdjacencyToPageRankReducer.cc:255-294):
    page -> sorted distinct targets + initial rank 1.0, ready for the
    PageRank operator.  ``hash_names`` applies the reference's 8-byte
    key compression (xxhash64 standing in for murmur3-64, same role)."""
    src = F.col("page_name")
    dst = F.col("target")
    if hash_names:
        src = F.xxhash64(src)
        dst = F.xxhash64(dst)
    return (
        links.select(src.alias("src"), dst.alias("dst"))
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("neighbors"))
        .withColumn("rank0", F.lit(1.0))
    )
