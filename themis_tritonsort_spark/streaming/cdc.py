"""Streaming CDC apply — maintain a parquet snapshot from an upsert
stream (the incremental half of operators.temporal.cdc_latest_snapshot).

Each micro-batch MERGEs into the snapshot by replaying
``cdc_latest_snapshot`` over (current snapshot ∪ batch changes): the
snapshot rows are tagged with order position below every real change
of the same key, so a batch change always wins and a batch tombstone
deletes.  The write is atomic-by-rename (write to a versioned side
directory, then swap a pointer file), so a reader never observes a
half-written snapshot and a crashed batch leaves the previous version
intact — the idempotent foreachBatch discipline: re-running a batch
replays the same MERGE onto the same base and converges to the same
snapshot (upserts are idempotent by key).

At scale this is what Delta/Hudi MERGE does under the hood (join +
rewrite of touched files); here the whole snapshot rewrites per batch,
which is correct at any size and efficient while snapshots are
dimension-sized — the operator docstring states the trade.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SNAPSHOT_POINTER = "_CURRENT"


def _current_version(path: str) -> int:
    ptr = os.path.join(path, SNAPSHOT_POINTER)
    if not os.path.exists(ptr):
        return -1
    with open(ptr) as f:
        return int(f.read().strip())


def read_snapshot(spark, path: str) -> DataFrame | None:
    """Read the current committed snapshot, or None before the first
    commit."""
    v = _current_version(path)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(path, f"v{v}"))


def cdc_apply_stream(
    changes: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    tombstone_col: str = "deleted",
):
    """Start a foreachBatch query maintaining the snapshot at ``path``
    from the upsert stream ``changes`` (schema: key_cols + order_cols
    + payload + boolean ``tombstone_col``).  Returns the streaming
    query handle."""
    from ..operators.temporal import cdc_latest_snapshot

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        base = read_snapshot(spark, path)
        if base is not None:
            # snapshot rows sort below every real change of their key:
            # order columns are nulled, and Spark's desc() puts NULLS
            # LAST, so cdc_latest_snapshot's per-key row_number always
            # ranks any batch change above the carried snapshot row
            # (pinned by test).
            base = base.select(
                *key_cols,
                *[
                    F.lit(None).cast(batch.schema[c].dataType).alias(c)
                    for c in order_cols
                ],
                *[
                    F.col(c)
                    for c in base.columns
                    if c not in key_cols and c not in order_cols
                ],
            ).withColumn(tombstone_col, F.lit(False))
            merged_in = batch.unionByName(base, allowMissingColumns=False)
        else:
            merged_in = batch
        snap = cdc_latest_snapshot(
            merged_in, key_cols, order_cols, F.col(tombstone_col)
        )
        v = _current_version(path) + 1
        out_dir = os.path.join(path, f"v{v}")
        snap.write.mode("overwrite").parquet(out_dir)
        tmp = os.path.join(path, f".{SNAPSHOT_POINTER}.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(path, SNAPSHOT_POINTER))

    os.makedirs(path, exist_ok=True)
    return (
        changes.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
