"""Grouped statistical scoring with engine-exact arithmetic
(beyond-reference; reference analog: the per-key aggregate family —
SumValues / AggregatingHashCounter — whose outputs feed thresholding).

The repo-wide discipline for float-bearing analytics: keep the
AGGREGATION integer (sums of scaled longs are exact and order-
independent in every engine), then derive the float score in a single
fixed expression tree of IEEE basic ops (+, -, *, /, sqrt — all
correctly rounded), so Spark and an oracle engine compute the
bit-identical double from the bit-identical integers.  Sums must stay
within 2^53 so their double images are exact; callers scale/clamp
values accordingly (cents-scaled metrics at catalog scale factors are
comfortably inside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_zscore(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-row z-score against the row's group: all input columns +
    (z_micro long) = round(1e6 * (x - mean_g) / stddev_g), population
    stddev.  ``value_col`` must be an integral column (scale floats to
    cents/micros first — that is what makes the group sums exact).

    Scale: one partial-aggregated groupBy builds the per-group
    (n, sum, sum-of-squares) — three longs per group — and the tiny
    stats relation BROADCASTS back onto the fact rows, which are never
    shuffled.  Groups with stddev 0 (or a single row) get NULL z.
    """
    x = F.col(value_col).cast("long")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).alias("__s1"),
        F.sum(x * x).alias("__s2"),
    )
    joined = df.join(F.broadcast(stats), group_col)
    n = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = s1 / n
    var = s2 / n - mean * mean
    std = F.sqrt(var)
    z = (x.cast("double") - mean) / std
    # guard on var (not std): var > 0 is decidable without sqrt, so an
    # oracle engine whose sqrt rejects negatives evaluates the same tree
    z_micro = F.when(
        (F.col("__n") > 1) & (var > 0),
        F.round(z * F.lit(1_000_000.0)).cast("long"),
    )
    return joined.withColumn("z_micro", z_micro).drop("__n", "__s1", "__s2")


def zscore_outliers(
    df: DataFrame, group_col: str, value_col: str, z_threshold_micro: int
) -> DataFrame:
    """Rows whose |z_micro| meets the threshold (in micro-sigmas, e.g.
    3_000_000 for the 3-sigma rule) — the anomaly cut over any grouped
    integral metric.  The comparison is on the exact long, so the
    boundary decision reproduces across engines.
    """
    if z_threshold_micro <= 0:
        raise ValueError(
            f"z_threshold_micro must be positive, got {z_threshold_micro}"
        )
    scored = group_zscore(df, group_col, value_col)
    return scored.where(F.abs(F.col("z_micro")) >= z_threshold_micro)


def profile_table(
    df: DataFrame,
    long_cols: dict[str, "F.Column"],
    str_cols: list[str],
    approx_rsd: float | None = None,
) -> DataFrame:
    """One-pass data-profiling summary — the quality report a curation
    pipeline runs before training: per column (col_name, n_rows,
    n_nulls, n_distinct, min_v, max_v).  ``long_cols`` maps output
    names to canonical BIGINT expressions (cents / epoch-micros / raw
    keys — the repo's exact-integer discipline, so min/max stringify
    identically on any engine); ``str_cols`` are profiled as-is with
    lexicographic min/max.

    Plan: a single global aggregate computes every column's stats in
    one pass over the input (the multi-count-distinct expands rows by
    the profiled-column count map-side — the standard cost of exact
    distincts), then one row per column is exploded from the 1-row
    result.  Nothing but the stats row ever moves.

    ``approx_rsd`` is the 100 TB switch: when set, n_distinct uses
    HyperLogLog++ (approx_count_distinct at that relative standard
    deviation) — the EXPAND disappears, each column carries a
    fixed-size sketch through the partial aggregate, and the plan
    stays one pass with no per-distinct-value shuffle growth.  Counts
    become approximate (only n_distinct; nulls/min/max stay exact),
    so the oracle-gated catalog entry keeps the exact default.
    """

    def n_distinct(c):
        if approx_rsd is not None:
            return F.approx_count_distinct(c, rsd=approx_rsd)
        return F.countDistinct(c)

    aggs = []
    names = []
    for name, expr in long_cols.items():
        c = expr.cast("long")
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"__nn_{name}"),
            n_distinct(c).alias(f"__nd_{name}"),
            F.min(c).cast("string").alias(f"__mn_{name}"),
            F.max(c).cast("string").alias(f"__mx_{name}"),
        ]
        names.append(name)
    for name in str_cols:
        c = F.col(name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"__nn_{name}"),
            n_distinct(c).alias(f"__nd_{name}"),
            F.min(c).alias(f"__mn_{name}"),
            F.max(c).alias(f"__mx_{name}"),
        ]
        names.append(name)
    one = df.groupBy().agg(F.count(F.lit(1)).alias("__rows"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nn_{name}").alias("n_nulls"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                F.col(f"__mn_{name}").alias("min_v"),
                F.col(f"__mx_{name}").alias("max_v"),
            )
            for name in names
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
