"""Unit tests for the round-5 curation-selection operators: hard-negative
mining, greedy k-center diverse-subset selection, and best-in-cluster
canonical selection — planted inputs with hand-computed outcomes."""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_tritonsort_spark.operators.dedup import keep_best_per_cluster
from themis_tritonsort_spark.operators.similarity import (
    hard_negative_topk,
    kcenter_select,
)


def test_hard_negatives_exclude_same_label(spark):
    # anchor 0 (label 0) at [1,0]; nearest vector 1 shares the label so
    # it must NOT appear; vectors 2 and 3 (label 1) rank by cosine.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),   # same label: excluded however close
        (2, [0.9, 0.1], 1),     # cos ~0.994
        (3, [0.0, 1.0], 1),     # cos 0
        (4, [0.7, 0.3], 2),     # cos ~0.919
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_topk(
        df, df.where(F.col("vec_id") == 0),
        id_col="vec_id", vec_col="embedding", label_col="label", k=2,
    ).collect()
    got = [(r.query_id, r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(0, 2, 1), (0, 4, 2)]
    assert all(r.cos_ppm > 0 for r in out)


def test_hard_negative_ties_break_by_id(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (5, [2.0, 0.0], 1),  # identical direction: cos 1.0
        (3, [3.0, 0.0], 1),  # identical direction: cos 1.0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_topk(
        df, df.where(F.col("vec_id") == 0),
        id_col="vec_id", vec_col="embedding", label_col="label", k=2,
    ).collect()
    got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(3, 1), (5, 2)]


def test_kcenter_farthest_point_trajectory(spark):
    # 1-D embeddings on a line: seed = min id (at 0.0); farthest is
    # 10.0; then the midpoint 5.0 (dist 25 to both ends); then 2.0
    # (dist 4 to 0) beats 7.0 (dist 4 to 5... equal) -> id tie-break.
    rows = [
        (10, [0.0]),
        (11, [10.0]),
        (12, [5.0]),
        (13, [2.0]),   # min dist to {0,10,5} = 4
        (14, [7.0]),   # min dist to {0,10,5} = 4 -> tie, higher id
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kcenter_select(df, id_col="vec_id", vec_col="embedding", k=4).collect()
    got = [(r.sel_rank, r.id, r.dist_micro) for r in sorted(out, key=lambda r: r.sel_rank)]
    assert got == [
        (1, 10, 0),
        (2, 11, 100_000_000),  # 10^2 * 1e6
        (3, 12, 25_000_000),   # 5^2 * 1e6
        (4, 13, 4_000_000),    # 2^2 * 1e6, tie with 14 broken by id
    ]


def test_keep_best_per_cluster_tiebreak(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "vid long, canonical_id long",
    )
    scored = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (7, 5), (8, 5)],
        "doc_id long, quality_pct long",
    )
    out = keep_best_per_cluster(
        clusters, scored, id_col="doc_id", score_col="quality_pct"
    ).collect()
    got = {r.cluster_id: (r.kept_id, r.n_members, r.kept_score) for r in out}
    # cluster 1: 2 and 3 tie at 50 -> smaller id; cluster 7: tie -> 7
    assert got == {1: (2, 3, 50), 7: (7, 2, 5)}


def _kcenter_reference(points: dict[int, list[float]], k: int):
    """Pure-python greedy farthest-point with the operator's exact
    contract: integer-micro distances, (md desc, id asc) argmax."""
    ids = sorted(points)
    chosen = [(1, ids[0], 0)]
    md = {i: None for i in ids}
    for step in range(2, k + 1):
        cx = points[chosen[-1][1]]
        for i in ids:
            d = round(sum((a - b) * (a - b) for a, b in zip(points[i], cx)) * 1e6)
            md[i] = d if md[i] is None else min(md[i], d)
        cand = [i for i in ids if i not in {c[1] for c in chosen}]
        best = max(cand, key=lambda i: (md[i], -i))
        chosen.append((step, best, md[best]))
    return chosen


def test_kcenter_matches_reference_on_random_data(spark):
    import random

    rng = random.Random(7)
    points = {
        i: [round(rng.uniform(-1, 1), 6) for _ in range(8)] for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in points.items()],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_select(df, id_col="vec_id", vec_col="embedding", k=6).collect()
    got = sorted(((r.sel_rank, r.id, r.dist_micro) for r in out))
    assert got == _kcenter_reference(points, 6)
    # greedy max-min distances weakly decrease after the seed
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)


def test_hard_negatives_match_numpy_reference(spark):
    import numpy as np
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], rng.randrange(3))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    k = 4
    out = hard_negative_topk(
        df, df.where(F.col("vec_id") < 3),
        id_col="vec_id", vec_col="embedding", label_col="label", k=k,
    ).collect()
    got = {(r.query_id, r.rank): r.neighbor_id for r in out}
    m = np.asarray([r[1] for r in rows])
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    labels = [r[2] for r in rows]
    for qi in range(3):
        cos = u @ u[qi]
        cand = [
            (-(cos[j]), j) for j in range(60) if labels[j] != labels[qi]
        ]
        expect = [j for _, j in sorted(cand)[:k]]
        assert [got[(qi, r)] for r in range(1, k + 1)] == expect


def test_kcenter_k_exceeding_corpus_stops_early(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [3.0])], "vec_id long, embedding array<double>"
    )
    out = kcenter_select(df, id_col="vec_id", vec_col="embedding", k=5).collect()
    got = sorted((r.sel_rank, r.id, r.dist_micro) for r in out)
    assert got == [(1, 1, 0), (2, 2, 9_000_000)]


def test_kcenter_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kcenter_select(df, id_col="vec_id", vec_col="embedding", k=3).count() == 0


def test_lsh_probe_caps_index_side_only(spark):
    from themis_tritonsort_spark.operators.dedup import lsh_probe_candidates

    # index bucket b1 holds 3 docs (over cap 2 -> dropped); b2 holds 1.
    index = spark.createDataFrame(
        [(1, 0, "b1"), (2, 0, "b1"), (3, 0, "b1"), (4, 0, "b2")],
        "doc long, band long, band_sig string",
    )
    # probe bucket sizes must NOT be capped: three probes in b2 all hit.
    probe = spark.createDataFrame(
        [(10, 0, "b1"), (11, 0, "b2"), (12, 0, "b2"), (13, 0, "b2")],
        "doc long, band long, band_sig string",
    )
    out = lsh_probe_candidates(index, probe, max_bucket=2).collect()
    got = sorted((r.doc_new, r.doc_old) for r in out)
    assert got == [(11, 4), (12, 4), (13, 4)]
