"""Margin-based pair mining (operators/similarity.margin_pair_mine).

The constructed fixture pins the one behavior the oracle can't isolate:
a HUB vector that is every query's cosine top-1 must lose to the
genuine match once the margin renormalizes by the hub's own average
neighborhood similarity.
"""

from __future__ import annotations

import math

from themis_tritonsort_spark.operators.similarity import margin_pair_mine


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
