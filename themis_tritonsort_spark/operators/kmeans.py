"""K-means (reference Q9): Lloyd iterations with driver-held centers.

Reference (``functions/map/KMeansMapFunction.cc:188-214``,
``functions/reduce/KMeansReduceFunction.cc:300-345``): the map task
assigns each point to the nearest center by squared L2 (centers read
from a shared param file = a broadcast); the reduce computes per-cluster
element-wise means and appends the new centers back to the shared file
(= collect k*dim doubles to the driver each round).

Spark-first: assignment is a JVM-side expression over the broadcast
centers array (no Python UDF, no crossJoin row blowup — the argmin
folds over a literal array of centers), means via groupBy + per-dim
avg.  Only k*dim scalars ever hit the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double


def _dist_sq(vec: Column, center: list[float]) -> Column:
    # Literal center folded into the plan: codegen'd, no shuffle, no UDF.
    c = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centers: list[list[float]], out_col: str = "cluster"
) -> DataFrame:
    """Nearest-center (squared L2) assignment; ties -> lowest center id
    (matching the reference's strict-< argmin scan in id order,
    KMeansMapFunction.cc:188-214).

    Implemented as array_min over (dist, cid) structs: struct ordering
    is lexicographic, so the min is the smallest distance with the
    lowest cid on ties.  Each distance expression appears exactly once
    (a chained when/otherwise scan would double the expression tree per
    center — exponential analysis/codegen cost).
    """
    v = as_double(F.col(vec_col))
    # ONE transform lambda over a nested centers literal: the distance
    # fold is compiled once and looped over centers at eval time,
    # instead of k unrolled copies of the fold in the expression tree —
    # same arithmetic (sequential left fold per center, so bit-identical
    # to the per-center form), much cheaper analysis/codegen for large k.
    centers_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centers]
    )
    dists = F.transform(
        centers_arr,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("cid"),
        ),
    )
    return df.withColumn(out_col, F.array_min(dists)["cid"])


def lloyd(
    df: DataFrame,
    vec_col: str,
    k: int,
    iterations: int,
    initial_centers: list[list[float]],
) -> tuple[DataFrame, list[list[float]]]:
    """Full Lloyd loop.  Returns (assignments DataFrame, final centers).

    Each iteration: one broadcast-expression assignment pass + one
    groupBy shuffle of (cluster, vec) -> per-dimension means.  Empty
    clusters keep their previous center (reference behavior: a center
    with no points simply gets no update appended for it).
    """
    dim = len(initial_centers[0])
    centers = [list(map(float, c)) for c in initial_centers]
    for _ in range(iterations):
        assigned = assign_clusters(df, vec_col, centers)
        v = as_double(F.col(vec_col))
        means = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(v[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        new_centers = list(centers)
        for row in means:
            new_centers[row["cluster"]] = [float(row[f"m{i}"]) for i in range(dim)]
        centers = new_centers
    return assign_clusters(df, vec_col, centers), centers
