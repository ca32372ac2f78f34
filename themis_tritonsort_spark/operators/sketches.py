"""Approximate aggregates — the sketch-based scale path (beyond-
reference).

The exact forms exist as catalog queries (q26 exact distinct counts,
q42 exact per-group quantiles via percentile_disc); these are their
100 TB counterparts.  An exact distinct over a high-cardinality key
shuffles every distinct value; HyperLogLog++ merges fixed-size
(~kilobyte) registers instead, so the aggregate is one map-side pass +
a tiny combine regardless of cardinality.  Likewise percentile_approx
merges bounded GK/KLL-style summaries where percentile_disc must
materialize and sort each group.

All wrappers are thin on purpose: the sketches are Spark built-ins
(JVM-side, partial-aggregated by Catalyst); the operator layer just
fixes the output contract.  Error bounds are parameters, asserted in
tests against the exact operators on the same data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++): relative
    standard deviation ``rsd`` trades sketch size for accuracy.
    Returns group cols + (approx_distinct long)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles: bounded-memory summaries with
    rank error <= 1/accuracy.  Returns group cols + (p array<double>,
    q array<double>) — q[i] is the p[i] quantile."""
    probs = list(probabilities)
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias("q")
    ).withColumn("p", F.array(*[F.lit(p) for p in probs]))


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01
) -> list:
    """Items whose frequency may exceed ``min_share`` of the rows
    (Spark's freqItems — one pass, bounded memory, may over-report but
    never misses a true heavy hitter).  Driver-side result by design:
    the answer is at most 1/min_share items, independent of data size."""
    if not 0.0 < min_share < 1.0:
        raise ValueError(f"min_share must be in (0, 1), got {min_share}")
    [row] = df.freqItems([col], support=min_share).collect()
    return sorted(row[f"{col}_freqItems"])
