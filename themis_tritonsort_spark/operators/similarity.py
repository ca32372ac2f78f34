"""Similarity search over embedding columns (beyond-reference).

  brute_force_topk — exact cosine top-k: broadcast the (small) query
      set against the corpus, JVM-side fold for the dot product, window
      rank per query.  The baseline and the oracle-checkable path.
  ivf_topk — IVF-style pruned search: cluster the corpus once (k-means
      centroids), then probe only the nprobe nearest centroids per
      query.  The 100 TB path: candidate set shrinks by
      ~nprobe/n_centroids, at a recall cost; exact within probed cells.

Embeddings are array<float>; all math is done in double with a
deterministic left-fold (see functions.vectors) so results are
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .kmeans import assign_clusters


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Returns (query_id, neighbor_id, rank) with rank 1..k by descending
    cosine, ties broken by ascending neighbor id.  The query side is
    broadcast (it is small by construction); the corpus side streams —
    no shuffle of the corpus at all, and the per-query top-k heap is the
    window aggregate, which AQE executes partially per partition.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).crossJoin(F.broadcast(q))
    joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn("__cos", cosine(F.col("__cvec"), F.col("__qvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 2,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` cells (by centroid
    distance) per query.  Same output shape as brute_force_topk; recall
    < 1 by design.  Corpus is assigned to cells once — at scale this is
    the partition/bucketing key, so a probe touches ~nprobe/len(centroids)
    of the data.
    """
    qid = query_id_col or id_col
    cells = assign_clusters(corpus, vec_col, centroids, out_col="cell").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        "cell",
    )

    # nprobe cells per query: distance to every centroid, keep nprobe best.
    from ..functions.vectors import as_double
    from .kmeans import _dist_sq  # reuse the literal-fold distance

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec"))
    dists = q.select(
        "query_id",
        "__qvec",
        F.array(
            *[
                F.struct(
                    _dist_sq(as_double(F.col("__qvec")), c).alias("d"),
                    F.lit(cid).alias("cell"),
                )
                for cid, c in enumerate(centroids)
            ]
        ).alias("__cells"),
    )
    probed = dists.select(
        "query_id",
        "__qvec",
        F.explode(F.slice(F.array_sort("__cells"), 1, nprobe)).alias("__pc"),
    ).select("query_id", "__qvec", F.col("__pc.cell").alias("cell"))

    joined = cells.join(F.broadcast(probed), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn("__cos", cosine(F.col("__cvec"), F.col("__qvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )
