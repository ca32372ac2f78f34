"""Margin-based pair mining (operators/similarity.margin_pair_mine).

The constructed fixture pins the one behavior the oracle can't isolate:
a HUB vector that is every query's cosine top-1 must lose to the
genuine match once the margin renormalizes by the hub's own average
neighborhood similarity.
"""

from __future__ import annotations

import math

from themis_tritonsort_spark.operators.similarity import (
    margin_pair_mine,
    margin_pair_mine_ann,
)


def _xy(angle_deg):
    a = math.radians(angle_deg)
    return [float(math.cos(a)), float(math.sin(a)), 0.0]


def _xz(angle_deg):
    a = math.radians(angle_deg)
    return [float(math.cos(a)), 0.0, float(math.sin(a))]


def _unit(angle_deg, dim=4):
    a = math.radians(angle_deg)
    v = [math.cos(a), math.sin(a)] + [0.0] * (dim - 2)
    return [float(x) for x in v]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hub_loses_to_true_match(spark):
    # the hub H sits inside a tight cluster of queries q1-q3 (cos ~.99),
    # so its backward average is ~994k ppm — its similarity is "cheap".
    # the outlier query q0 sees H at cos .906 and its true match M at
    # cos .891: RAW top-1 picks the hub; the margin divides by the
    # hub's inflated backward average and flips to M
    # (margin_H = .906*2/(.750+.994) = 1.04 < margin_M =
    #  .891*2/(.750+.706) = 1.22).
    corpus = _df(
        spark,
        [
            (100, _xy(0)),  # the hub
            (200, _xz(52)),  # q0's true match
            (300, _xy(60)),  # fillers: give q0 a third positive neighbor
            (301, _xy(-60)),
        ],
    )
    queries = _df(
        spark,
        [(0, _xz(25)), (1, _xy(5)), (2, _xy(-5)), (3, _xy(8))],
    )
    mined = margin_pair_mine(corpus, queries, "vec_id", "embedding", k=3)
    got = {r["query_id"]: r["neighbor_id"] for r in mined.collect()}
    # the cluster queries legitimately mine the hub; the outlier flips
    assert got[0] == 200
    assert got[1] == 100 and got[2] == 100 and got[3] == 100


def test_raw_top1_would_pick_hub_for_tight_queries(spark):
    # control for the fixture above: make the hub the raw cosine top-1
    # for a tight query and check margin still rejects it
    corpus = _df(
        spark,
        [(100, _unit(0))]
        + [(200, _unit(8)), (201, _unit(40)), (202, _unit(60))],
    )
    # query at 3deg: hub cos(3) = .9986 beats match-200 cos(5) = .9962
    queries = _df(spark, [(0, _unit(3))])
    mined = margin_pair_mine(corpus, queries, "vec_id", "embedding", k=3)
    rows = mined.collect()
    assert len(rows) == 1
    # the hub's backward stats come only from this query here, so the
    # margin can't penalize it (avg_bwd == its own cos); with a single
    # query the scorer degenerates to raw cosine — assert that honestly
    assert rows[0]["neighbor_id"] == 100
    # now add siblings that inflate the hub's backward average; the
    # same query must flip to the genuine match
    queries_many = _df(
        spark, [(0, _unit(3)), (1, _unit(357)), (2, _unit(2)), (3, _unit(358))]
    )
    flipped = {
        r["query_id"]: r["neighbor_id"]
        for r in margin_pair_mine(
            corpus, queries_many, "vec_id", "embedding", k=3
        ).collect()
    }
    assert flipped[0] == 200


def test_empty_queries_yield_empty(spark):
    corpus = _df(spark, [(1, _unit(10)), (2, _unit(20))])
    empty = _df(spark, [])
    assert margin_pair_mine(corpus, empty, "vec_id", "embedding", k=2).count() == 0
    assert margin_pair_mine(empty, corpus, "vec_id", "embedding", k=2).count() == 0


def _icos_ppm_py(a, b):
    """Reference replica of functions.vectors.icos_ppm: micro-quantize
    (floor(1e6*x + 0.5)), exact integer dots, one floor'd division."""
    qa = [math.floor(1e6 * float(x) + 0.5) for x in a]
    qb = [math.floor(1e6 * float(x) + 0.5) for x in b]
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    d = sum(x * y for x, y in zip(qa, qb))
    return int(math.floor(1e6 * float(d) / (math.sqrt(float(na)) * math.sqrt(float(nb))) + 0.5))


def test_cos_ppm_values_are_integer_exact(spark):
    # pin the emitted cos_ppm to the quantize/idot/floor definition —
    # the r05 driver red was a float-fold cosine whose last ppm
    # depended on engine summation order; this replica has no float
    # sums, so the values are the contract
    corpus = _df(spark, [(100, _xy(0)), (200, _xz(52))])
    queries = _df(spark, [(0, _xz(25))])
    rows = {
        r["neighbor_id"]: r["cos_ppm"]
        for r in margin_pair_mine(
            corpus, queries, "vec_id", "embedding", k=2
        ).collect()
    }
    # margin keeps only the best pair; re-run with k=1 corpus singletons
    # to pin BOTH pairwise values
    for cid, cvec in [(100, _xy(0)), (200, _xz(52))]:
        got = margin_pair_mine(
            _df(spark, [(cid, cvec)]), queries, "vec_id", "embedding", k=1
        ).collect()
        assert len(got) == 1
        assert got[0]["cos_ppm"] == _icos_ppm_py(cvec, _xz(25))
    # and the combined run's winner carries the same pinned value
    (winner_id, winner_ppm), = rows.items()
    assert winner_ppm == _icos_ppm_py(
        {100: _xy(0), 200: _xz(52)}[winner_id], _xz(25)
    )


def test_zero_norm_vectors_are_excluded(spark):
    corpus = _df(spark, [(1, _unit(10)), (2, [0.0, 0.0, 0.0, 0.0])])
    queries = _df(spark, [(0, _unit(5)), (9, [0.0, 0.0, 0.0, 0.0])])
    rows = margin_pair_mine(corpus, queries, "vec_id", "embedding", k=2).collect()
    ids = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert ids == {(0, 1)}  # the zero vectors vanish from both sides


def test_ann_margin_matches_brute_on_colliding_fixture(spark):
    # near-parallel pairs share every sign-LSH band bucket (their
    # integer plane dots are far from zero relative to quantization
    # noise, so signatures are identical) — on this fixture the ANN
    # path retrieves every true match and must mine the same pairs as
    # the brute scan restricted to retrieved candidates
    corpus = _df(
        spark,
        [(100 + i, _unit(a)) for i, a in enumerate((3, 33, 63, 93, 123))],
    )
    queries = _df(
        spark,
        [(i, _unit(a)) for i, a in enumerate((2, 32, 62, 92, 122))],
    )
    got = {
        r["query_id"]: r["neighbor_id"]
        for r in margin_pair_mine_ann(
            corpus, queries, "vec_id", "embedding", dim=4, k=3,
            n_planes=8, bands=8,  # 1-bit bands: candidate recall ~1
        ).collect()
    }
    # every query finds its 1-degree-away twin
    assert got == {0: 100, 1: 101, 2: 102, 3: 103, 4: 104}


def test_ann_margin_hot_bucket_cap(spark):
    # a degenerate corpus (one direction repeated) floods one bucket;
    # the cap drops it before the join, yielding no candidates
    corpus = _df(spark, [(100 + i, _unit(1)) for i in range(20)])
    queries = _df(spark, [(0, _unit(2))])
    uncapped = margin_pair_mine_ann(
        corpus, queries, "vec_id", "embedding", dim=4, k=3,
        n_planes=8, bands=8,
    )
    capped = margin_pair_mine_ann(
        corpus, queries, "vec_id", "embedding", dim=4, k=3,
        n_planes=8, bands=8, max_bucket=5,
    )
    assert uncapped.count() == 1  # margin keeps the single best pair
    assert capped.count() == 0
