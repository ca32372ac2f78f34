"""Streaming sketch maintenance — windowed distinct-count registers.

The streaming form of operators.sketches' deterministic HLL: maintain
the per-(window, key) REGISTER relation incrementally and leave the
estimate to a batch read of the sink.  That split is the load-bearing
design, not a shortcut: registers are the mergeable aggregation state
(register-max is associative/commutative, so late or replayed
micro-batches fold in exactly), while the estimate is a non-mergeable
finalization — computing it inside the stream would need a second
chained stateful aggregation and would have to be thrown away on every
merge anyway.  A dashboard reads the sink and finalizes with
``operators.sketches.hll_estimate`` — kilobytes per window regardless
of stream cardinality.

State bound: at most 2^p register rows per (window, key), dropped when
the watermark passes the window — O(windows x keys x 2^p) longs total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import hll_bucket_rho


def hll_registers_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 9,
) -> DataFrame:
    """Tumbling-window HLL registers per key: (window_start, window_end,
    key, bucket, reg) — the identical state the batch ``hll_registers``
    builds over the same rows, maintained incrementally under a
    watermark.  The map-side (bucket, rho) derivation is shared code,
    so stream and batch sketches are bit-identical and mergeable with
    each other (union + register-max).
    """
    bucket, rho = hll_bucket_rho(value_col, p)
    return (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.col(key_col),
            bucket.alias("bucket"),
            rho.alias("__rho"),
        )
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col), "bucket")
        .agg(F.max("__rho").alias("reg"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "bucket",
            "reg",
        )
    )


def cms_sketch_stream(
    events: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Tumbling-window count-min sketch: (window_start, window_end,
    row, bucket, total) — the identical counters the batch
    ``cms_sketch`` builds over the same rows (shared map-side bucket
    derivation, ``operators.sketches.cms_row_bucket``), maintained
    incrementally under a watermark.  Counter SUMS are the mergeable
    state, so late micro-batches fold in exactly; heavy-hitter
    estimates finalize batch-side via ``cms_lookup`` on the sink —
    O(depth x width) rows per window regardless of stream volume.
    """
    from ..operators.sketches import cms_row_bucket

    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.col(item_col), rows)
        .select(
            F.col(ts_col),
            "row",
            cms_row_bucket(item_col, width).alias("bucket"),
        )
        .groupBy(F.window(F.col(ts_col), window), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "row",
            "bucket",
            "total",
        )
    )
