"""Temporal joins (beyond-reference: the reference has no join operator
at all — SURVEY.md §2.7 — so these are pure Spark-first additions that a
training-data / event-analytics pipeline needs).

  asof_join — for every left row, attach the most recent right row with
      right_ts <= left_ts for the same key (inclusive, "backward"
      direction).  Implemented as ONE shuffle: tag + union both inputs,
      hash-partition by key, and fill right-side columns with a running
      ``last(ignorenulls)`` window — no per-key collect, no UDF, no
      range cross-product.  This is the merge-scan formulation: at 100 TB
      each partition streams once in (key, ts) order.

  range_join_bucketed — equi-key + interval containment
      (lo <= ts < hi) join.  The naive plan is a hash join on the key
      with the interval as a post-filter, which explodes when a key has
      many rows on both sides.  The bucketed form quantizes time into
      fixed buckets, explodes each right interval to the buckets it
      covers (bounded by interval/bucket), and equi-joins on
      (key, bucket) — the classic time-bucketed range join, which keeps
      the join an exact hash match and the candidate set proportional to
      true matches.  Each left row belongs to exactly one bucket, so no
      post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: left rows keep all their columns and gain
    ``right_cols`` (+ the matched right timestamp as ``asof_ts``) from
    the latest right row with ``right_ts <= left_ts`` on ``key``; nulls
    when no right row precedes the left row (left-outer semantics).

    The right side should be unique per (key, right_ts) — pre-aggregate
    ties upstream, otherwise which tied row wins is unspecified (the
    reference semantics of every as-of engine, incl. the DuckDB oracle).
    """
    l_payload = [c for c in left.columns if c not in (key, left_ts)]
    # The right row travels as ONE struct so the running last() always
    # takes every right column from the SAME (latest) right row — a
    # per-column last(ignorenulls) would backfill a NULL payload in the
    # newest right row from an older row, mixing rows.  The struct is
    # non-null exactly on right rows, so ignorenulls keys on row
    # presence, not field nullability.
    r_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    null_struct = F.lit(None).cast(
        "struct<__rts:" + right.schema[right_ts].dataType.simpleString()
        + "".join(
            f",{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
        )
        + ">"
    )
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in l_payload],
        null_struct.alias("__r"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        r_struct.alias("__r"),
    )
    # Right rows (tag 0) sort before left rows (tag 1) at equal ts, so a
    # right row AT the left timestamp is visible to it (inclusive <=).
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        "__k",
        "__ts",
        "__tag",
        *l_payload,
        F.last("__r", ignorenulls=True).over(w).alias("__f"),
    )
    return filled.where(F.col("__tag") == 1).select(
        F.col("__k").alias(key),
        F.col("__ts").alias(left_ts),
        *l_payload,
        *[F.col(f"__f.{c}").alias(c) for c in right_cols],
        F.col("__f.__rts").alias("asof_ts"),
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket: int,
) -> DataFrame:
    """Inner join of left rows to right intervals on ``key`` with
    ``right_lo <= left_ts < right_hi``, via time-bucket quantization.
    ``bucket`` is in the units of the timestamp columns and should be on
    the order of the typical interval length (each right row explodes to
    ``ceil(len/bucket)+1`` bucket rows).  Output keeps all columns of
    both inputs (key once).
    """
    # floor division, NOT cast-truncation: for negative timestamps
    # (pre-epoch dates) truncation rounds toward zero and would put
    # ts=-1 and ts=+1 in the same bucket, losing/duplicating matches.
    def _bucket(c: str) -> F.Column:
        return F.floor(F.col(c) / F.lit(bucket)).cast("long")

    lb = left.withColumn("__bucket", _bucket(left_ts))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket(right_lo),
                # hi is exclusive, but a row at floor(hi/bucket) can still
                # have ts < hi, so that bucket is included.
                _bucket(right_hi),
            )
        ),
    )
    return (
        lb.join(rb, ["__bucket", key])
        .where((F.col(left_ts) >= F.col(right_lo)) & (F.col(left_ts) < F.col(right_hi)))
        .drop("__bucket")
    )


def gap_fill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Hypertable-style gap fill with last-observation-carried-forward
    (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` pattern):
    bucket each series to the hour (per-bucket gauge = max value in
    cents), then emit one row per hour from each series' first to last
    observed bucket, carrying the previous reading across empty hours.
    Returns (series, bucket_epoch_us, value_cents, filled) — ``filled``
    is 1 for rows that LOCF synthesized.

    Plan: NO grid join.  Each observed bucket looks at its successor
    (lead over the series) and generator-explodes the gap between them,
    replicating its own value — LOCF falls out of the replication.  Two
    shuffles total: the per-(series, bucket) aggregate and the window
    by series; the explode is map-side.  At 100 TB the alternative
    grid-outer-join shuffles the grid AND the observations — this
    formulation moves each observation once and synthesizes gap rows
    where they are consumed.  Trailing/leading edges emit nothing
    outside the observed span (same as gapfill's finite range).
    """
    observed = df.groupBy(
        F.col(series_col), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
    ).agg(
        F.max(F.round(F.col(value_col) * 100).cast("long")).alias("value_cents")
    )
    w = Window.partitionBy(series_col).orderBy("bucket")
    spanned = observed.withColumn("__next", F.lead("bucket").over(w))
    rows = spanned.select(
        F.col(series_col),
        F.col("value_cents"),
        F.posexplode(
            F.expr(
                "sequence(bucket,"
                " coalesce(__next - interval 1 hour, bucket),"
                " interval 1 hour)"
            )
        ).alias("__i", "__fb"),
    )
    return rows.select(
        F.col(series_col),
        F.unix_micros("__fb").alias("bucket_epoch_us"),
        F.col("value_cents"),
        (F.col("__i") > 0).cast("long").alias("filled"),
    )


def cdc_latest_snapshot(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tombstone: "F.Column",
) -> DataFrame:
    """Materialize the current snapshot of a change stream — the
    Delta/Hudi MERGE semantic as a plain plan: for every key keep only
    the LATEST change by ``order_cols`` (include a unique tiebreaker
    for total order), then drop keys whose latest change is a
    tombstone (``tombstone`` is a boolean Column evaluated on the
    winning row — a deleted entity has no snapshot row).

    Scale: one hash shuffle on the key columns; the per-key winner is
    a row_number window, which AQE executes with partial top-1 per
    map partition, so a hot key never ships its full history.  This is
    the batch replay of an upsert table — the incremental form is
    Structured Streaming dropDuplicates/flatMapGroupsWithState over
    the same key.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.where(~tombstone)


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log:
    collapse each key's ordered changes into runs of identical
    ``attr_cols`` and emit one validity interval per run — key cols +
    attr cols + (valid_from, valid_to, version) where ``valid_from`` is
    the run's first ``order_col`` value, ``valid_to`` the next run's
    start (NULL for the current version), and ``version`` the 1-based
    run index per key.

    Semantics: consecutive changes carrying the SAME attributes extend
    the current interval (idempotent upserts don't open new versions);
    NULL attributes compare as distinct-from-everything-but-NULL (the
    eqNullSafe rule), so a NULL->NULL rerun also stays one version.

    Scale: everything runs in ONE hash shuffle on the key — the change
    flag (lag), the run index (running sum), the per-run collapse
    (groupBy key+run), and the valid_to stitch (lead over runs) all
    share the key partitioning, so Catalyst plans a single Exchange and
    reuses it across the four steps.  Per-key history sorts within a
    partition, never globally.
    """
    key = [F.col(c) for c in key_cols]
    order = [F.col(order_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    flagged = df.withColumn(
        "__new_run", (first | changed).cast("long")
    ).withColumn(
        "__run",
        F.sum("__new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(*key_cols, "__run").agg(
        F.min(F.col(order_col)).alias("valid_from"),
        # attrs are constant within a run by construction; min() is the
        # order-independent way to read the constant back out
        *[F.min(F.col(c)).alias(c) for c in attr_cols],
    )
    w_runs = Window.partitionBy(*key).orderBy("__run")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("version", F.col("__run").cast("long"))
        .drop("__new_run", "__run")
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "version")
    )


def concurrency_sweep(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    out_col: str = "open_sessions",
) -> DataFrame:
    """Sweep-line interval concurrency: each key's activity span
    [min ts, max ts) becomes a +1/-1 boundary pair; boundaries
    collapse per timestamp and the running sum over time is the
    open-span count after each instant.  (ts, net_delta long,
    out_col long.)  The corpus reduces to 2 boundaries per key in ONE
    keyed aggregate; the sweep runs on that boundary set through the
    distributed prefix sum — no global window at any size.
    """
    from .sort import with_global_prefix_sum

    spans = df.groupBy(key_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    # both boundaries EXPLODE from the one spans row — a union of two
    # selects would re-derive the spans aggregate per branch and scan
    # the corpus twice (pinned by the q105 plan test)
    bounds = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("__lo").alias(ts_col), F.lit(1).alias("__d")
                    ),
                    F.struct(
                        F.col("__hi").alias(ts_col), F.lit(-1).alias("__d")
                    ),
                )
            ).alias("__b")
        )
        .select("__b.*")
        .groupBy(ts_col)
        .agg(F.sum("__d").alias("net_delta"))
    )
    return with_global_prefix_sum(
        bounds, [ts_col], "net_delta", out_col=out_col
    ).select(
        F.col(ts_col),
        F.col("net_delta").cast("long"),
        F.col(out_col).cast("long"),
    )


def ewma_halving(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key exponential smoothing with lambda = 1/2: s_1 = x_1,
    s_i = (x_i + s_{i-1}) / 2 over the (ts, id)-ordered stream.
    Returns (key, id, ts, ewma_micro long).

    The halving constant is the engine-exactness trick: division by 2
    is exact binary scaling, and both engines run the IDENTICAL
    sequential op chain (the same truncation points when fractional
    bits exceed the mantissa), so the recursion reproduces bit-for-bit
    — general lambdas would hit libm pow/last-ulp drift.  ``value_col``
    must be integral (cents/micros first).

    Plan: ONE shuffle on the key; the recursion is a JVM ``aggregate``
    fold over each key's time-sorted array (no Python), the same
    bounded-per-key-array assumption as sessionization/funnel.
    """
    evs = (
        df.select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("eid"),
                F.col(value_col).cast("long").alias("x"),
            ).alias("__e"),
        )
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("__e")).alias("__evs"))
    )
    folded = F.aggregate(
        F.col("__evs"),
        F.array().cast("array<struct<ts:long,eid:long,s:double>>"),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.struct(
                    e["ts"].alias("ts"),
                    e["eid"].alias("eid"),
                    F.when(
                        F.size(acc) == 0, e["x"].cast("double")
                    )
                    .otherwise(
                        (e["x"].cast("double") + F.element_at(acc, -1)["s"])
                        / F.lit(2.0)
                    )
                    .alias("s"),
                )
            ),
        ),
    )
    return (
        evs.select(F.col(key_col), F.explode(folded).alias("__o"))
        .select(
            F.col(key_col),
            F.col("__o.eid").alias(id_col),
            F.col("__o.ts").alias(ts_col),
            F.round(F.col("__o.s") * F.lit(1_000_000.0))
            .cast("long")
            .alias("ewma_micro"),
        )
    )
