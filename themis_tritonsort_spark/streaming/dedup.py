"""Streaming deduplication (beyond-reference: the batch dedup family in
operators/dedup.py, restated for unbounded input).

  dedup_exact_stream — drop records whose content hash was already seen
      within the watermark horizon (``dropDuplicatesWithinWatermark``):
      the state store holds one row per distinct hash and is purged as
      the watermark advances, so state is bounded by the horizon's
      distinct-count, not the stream's.  This is the streaming analog of
      operators.dedup.exact_duplicates — keep-first instead of
      group-and-report.

At 100 TB/day the same shape holds: state is hash-partitioned across
executors by the dedup key, exactly like the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    events: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence of each distinct ``content_col`` value
    seen within the watermark horizon; drop later duplicates.

    Input must be a streaming DataFrame with an event-time column.  The
    dedup key is md5(content) so the state store carries a 32-char hash
    per distinct value instead of the payload.
    """
    hashed = events.withColumn("__h", F.md5(F.col(content_col).cast("string")))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach (slowly-changing) dimension
    columns to a streaming fact.  Spark re-reads the static side per
    micro-batch, so dimension updates are picked up without restarting
    the query.  No broadcast hint: Catalyst broadcasts automatically
    below spark.sql.autoBroadcastJoinThreshold and falls back to a
    shuffle join for dimensions too large to ship — forcing the hint
    would OOM on a multi-GB dimension.
    """
    return events.join(dim, key, how)
