"""Stream-stream joins with bounded state (beyond-reference; completes
the streaming family next to windows/sessions/dedup/enrichment).

The canonical shape is event attribution: join click streams to the
impression that preceded them within an attribution horizon.  Unlike
the stream-static enrichment join (streaming/dedup.py), BOTH sides
arrive continuously, so the join must buffer state — and the ONLY way
that is viable at 100 TB/day is to bound it:

  * watermarks on both event-time columns bound how late each side can
    arrive, and
  * the time-interval join condition bounds how long a buffered row can
    still match.

Together Spark evicts state older than watermark + horizon, so state
size ~ arrival rate x horizon — a constant for a steady stream — while
an unconstrained equi-join would buffer both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + horizon]`` — e.g. clicks attributed to the
    impression they followed.  ``left_ts``/``right_ts`` must be
    event-time timestamp columns and distinct from each other; other
    column names must not collide across the two sides.

    ``how="inner"`` emits as matches arrive; outer variants emit the
    unmatched row only once the watermark passes its horizon (a finite
    availableNow run may therefore hold unmatched rows back — that is
    watermark semantics, not data loss).
    """
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"non-key columns collide across sides: {sorted(overlap)}"
        )
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, "__rk"
    )
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, how).drop("__rk")
