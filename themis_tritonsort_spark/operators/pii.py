"""PII detection and redaction — a standard pre-training curation pass
(beyond-reference; the reference engine has no text-scrubbing operator,
so this extends the SURVEY §2 text family the way a training-data
pipeline needs).

All patterns are chosen to mean the same thing under Java regex
(Spark) and RE2 (DuckDB, the oracle): character classes, bounded
repetition, and ``\\b`` only — no lookaround, no backreferences.

Scale: pure map-side string work (regexp_count / regexp_replace are
JVM codegen expressions).  No shuffle, no UDF, no state; at 100 TB
this pipelines with the scan and is bounded by read bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom, so earlier patterns win
# where text overlaps (an email is redacted before its host substring
# could look like anything else).  Counts are per-pattern on the
# ORIGINAL text, independent of redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redacted(col: Column) -> Column:
    """The text with every PII pattern replaced by its tag, applied in
    ``PII_PATTERNS`` order."""
    out = col
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocked: DataFrame,
    pattern: str = r"[a-z]{6,}",
    broadcast_hits: bool = True,
) -> DataFrame:
    """Drop every document that mentions any blocked target: extract
    link-like targets with ``pattern`` (the q08 convention), semi-join
    them against the blocklist, and anti-join the hits back onto the
    corpus.  ``blocked`` has one column ``target``.

    Scale: real blocklists (domains/URLs) are ~100k entries — far
    under the broadcast threshold — so both joins are map-side: the
    semi-join marks hit docs against the broadcast list, and the
    anti-join streams the corpus against the (small) hit-id set.  No
    corpus-sized shuffle.  If the blocklist is expected to hit a large
    FRACTION of the corpus (hit ids no longer broadcastable), pass
    ``broadcast_hits=False`` to fall back to a shuffled anti-join.
    """
    targets = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(text_col, F.lit(pattern), 0)
        ).alias("target"),
    )
    bad_ids = (
        targets.join(F.broadcast(blocked), "target", "left_semi")
        .select(id_col)
        .distinct()
    )
    if broadcast_hits:
        bad_ids = F.broadcast(bad_ids)
    return df.join(bad_ids, id_col, "left_anti")


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Replace ``text_col`` with its redacted form and add one
    ``n_<kind>`` count column per pattern (counted on the original
    text).  Column order and names are stable for the oracle."""
    cols = [c for c in df.columns if c != text_col]
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    return df.select(
        *cols, redacted(F.col(text_col)).alias(text_col), *counts
    )
