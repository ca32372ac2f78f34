"""Global sort with observable order (reference GraySort, §2.5 O7) and
sorted-stream merge (Q12, Merger O4).

The reference's 4-phase sort (sample boundaries -> range shuffle ->
per-partition sort -> merge oversized) is exactly Spark's
``repartitionByRange + sortWithinPartitions``: RangePartitioner *is*
phase 0, the shuffle *is* phase 1, Tungsten's external sorter *is*
phases 2/3 (``workers/sorter/Sorter.cc:49-144``,
``workers/merger/Merger.cc:47-254``).

Because the correctness gate hash-compares an unordered multiset, a
sort's output must carry its order as data.  ``with_global_rank``
attaches a global 1-based position WITHOUT a single-partition window:
it range-partitions, ranks within partitions, then offsets each
partition by the cumulative count of preceding partitions (the classic
scalable zipWithIndex, all JVM-side).  The per-partition count table is
tiny (numPartitions rows) so the offset join is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__ts_pid"
_RN = "__ts_rn"
_CNT = "__ts_cnt"
_OFF = "__ts_off"


def with_global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "pos",
    num_partitions: int | None = None,
    release: list[DataFrame] | None = None,
) -> DataFrame:
    """Totally order ``df`` by ``order_cols`` (must be a total order —
    include a unique tiebreaker) and attach a global 1-based rank.

    Scale: one range shuffle + one tiny broadcast join.  No global
    window, no driver collect of data rows.

    The plan persists an intermediate (see comment below).  Pass a
    list as ``release`` to receive that intermediate: after running
    your action, call ``.unpersist()`` on each element so chained
    sorts in one long-lived session don't accumulate cached blocks
    while waiting for the GC-driven ContextCleaner.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism

    ranged = df.repartitionByRange(num_partitions, *order_cols)
    ranged = ranged.withColumn(_PID, F.spark_partition_id())
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    # Materialize the ranked relation: the counts branch below otherwise
    # re-executes the scan AND the range shuffle (physical-plan exchange
    # reuse does not fire across the two branches).  The counts job runs
    # first (broadcast subquery), populating the cache the main pass
    # then reads — one scan, one shuffle total.  The cache cannot be
    # unpersisted inside this lazy plan; Spark's ContextCleaner reclaims
    # it when the DataFrame becomes unreachable, so repeated calls don't
    # leak unboundedly, but callers looping over many sorts in one
    # session can spark.catalog.clearCache() between them.
    ranked = ranged.withColumn(_RN, F.row_number().over(w)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if release is not None:
        release.append(ranked)

    counts = ranked.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    # numPartitions rows: a global window here is fine (it is the phase-0
    # boundary metadata, not data).
    offsets = counts.withColumn(
        _OFF,
        F.coalesce(
            F.sum(_CNT).over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PID, _OFF)

    out = (
        ranked.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_RN)).cast("long"))
        .drop(_PID, _RN, _OFF)
    )
    return out


def with_global_prefix_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
    release: list[DataFrame] | None = None,
) -> DataFrame:
    """Attach the INCLUSIVE running sum of ``value_col`` over the total
    order given by ``order_cols`` (include a unique tiebreaker) —
    the distributed prefix sum, same shape as with_global_rank: range
    shuffle + partition-local running sum + broadcast per-partition
    offsets.  No global window, no driver data collect; the offset
    table is numPartitions rows.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism

    ranged = df.repartitionByRange(num_partitions, *order_cols)
    ranged = ranged.withColumn(_PID, F.spark_partition_id())
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    summed = ranged.withColumn(_RN, F.sum(value_col).over(w)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if release is not None:
        release.append(summed)

    totals = summed.groupBy(_PID).agg(F.sum(value_col).alias(_CNT))
    offsets = totals.withColumn(
        _OFF,
        F.coalesce(
            F.sum(_CNT).over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PID, _OFF)

    return (
        summed.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_RN)).cast("long"))
        .drop(_PID, _RN, _OFF)
    )


def merge_sorted(dfs: list[DataFrame], order_cols: list[str], rank_col: str = "pos") -> DataFrame:
    """Merge pre-sorted inputs into one totally ordered stream
    (reference merge job: SinglePartitionMergingPartitionFunction X5 +
    Merger O4, ``job_spec_generators/merge_files.py``).

    Spark-first: a k-way heap merge is how you implement this on one
    node; on a cluster the right plan is union + range-shuffle sort,
    which Tungsten executes as merge-sort over already-sorted runs.
    Columns must align across inputs.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return with_global_rank(out, order_cols, rank_col=rank_col)
