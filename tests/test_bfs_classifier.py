"""Semantic contracts for the BFS hop operator and the hashed linear
classifier (q103/q104) on hand-built fixtures; engine parity is proved
by test_queries_oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.operators.components import bfs_hops


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, vids):
    return spark.createDataFrame([(v,) for v in vids], "vid long")


def test_bfs_path_graph_hops(spark):
    # 1-2-3-4 chain plus disjoint 5-6; seeds {1, 5}
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (5, 6)])
    got = {
        r["vid"]: r["hop"]
        for r in bfs_hops(e, _seeds(spark, [1, 5]), rounds=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 0, 6: 1}


def test_bfs_undirected_and_min_hop_wins(spark):
    # edge direction must not matter, and a vertex reachable two ways
    # gets the SHORTER distance: 3 is 1 hop from seed 1 via (3,1).
    e = _edges(spark, [(3, 1), (1, 2), (2, 3)])
    got = {
        r["vid"]: r["hop"]
        for r in bfs_hops(e, _seeds(spark, [1]), rounds=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1}


def test_bfs_zero_rounds_and_horizon(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    assert {
        r["vid"]: r["hop"]
        for r in bfs_hops(e, _seeds(spark, [1]), rounds=0).collect()
    } == {1: 0}
    # horizon 1: vertex 3 (2 hops away) must NOT appear
    assert {
        r["vid"]: r["hop"]
        for r in bfs_hops(e, _seeds(spark, [1]), rounds=1).collect()
    } == {1: 0, 2: 1}


def test_bfs_rejects_negative_rounds(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        bfs_hops(e, _seeds(spark, [1]), rounds=-1)


def test_hashed_classifier_score_matches_hand_hash(spark, sf_dir):
    # recompute one document's score with hashlib and compare
    from themis_tritonsort_spark.queries import q104_hashed_classifier
    from themis_tritonsort_spark.data import table
    from themis_tritonsort_spark.functions.text import tokens

    doc = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") == 1)
        .select("doc_id", "text", tokens("text").alias("toks"))
        .collect()[0]
    )
    expected = 0
    for w in doc["toks"]:
        bucket = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 256
        expected += (bucket * 2654435761) % 1001 - 500
    got = (
        q104_hashed_classifier(spark, sf_dir)
        .where(F.col("doc_id") == 1)
        .collect()[0]
    )
    assert got["score_milli"] == expected
    assert got["n_tokens"] == len(doc["toks"])
    assert got["pred_keep"] == (expected > 0)


def test_bm25_ranking_semantics(spark):
    from themis_tritonsort_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash"),   # dense in both terms
            (2, "hash scan filter filter"),    # one hit each of two terms
            (3, "filter sort merge"),          # no hits
            (4, "hash"),                       # short doc, one hit
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(docs, "doc_id", "text", ["hash", "join"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids                       # no-hit docs never appear
    assert ids[0] == 1                        # densest doc ranks first
    scores = {r["doc_id"]: r["score_micro"] for r in got}
    assert scores[1] > scores[4] > 0
    # k truncates deterministically
    assert [r["doc_id"] for r in
            bm25_topk(docs, "doc_id", "text", ["hash", "join"], k=1).collect()] == [1]

    import pytest as _pt
    with _pt.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", [], k=5)
    with _pt.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", ["hash"], k=0)


def test_profile_table_hand_fixture(spark):
    from themis_tritonsort_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    got = {
        r["col_name"]: r
        for r in profile_table(df, {"k": F.col("k")}, ["s"]).collect()
    }
    assert set(got) == {"k", "s"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_v"], k["max_v"]) == ("1", "2")
    s = got["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_v"], s["max_v"]) == ("a", "b")


def test_profile_table_approx_path(spark):
    """The 100 TB profiler switch: approx_rsd swaps the exact
    multi-count-distinct (row EXPAND) for HLL++ sketches.  Everything
    but n_distinct stays exact; n_distinct lands within the sketch's
    error band; and the approx plan must contain NO Expand node."""
    import contextlib
    import io

    from themis_tritonsort_spark.operators.stats import profile_table

    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("string").alias("s")
    )
    prof = profile_table(df, {"k": F.col("k")}, ["s"], approx_rsd=0.02)
    got = {r["col_name"]: r for r in prof.collect()}
    assert (got["k"]["n_rows"], got["k"]["n_nulls"]) == (2000, 0)
    assert (got["k"]["min_v"], got["k"]["max_v"]) == ("0", "1999")
    assert abs(got["k"]["n_distinct"] - 2000) <= 2000 * 0.06
    assert abs(got["s"]["n_distinct"] - 100) <= 100 * 0.06

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prof.explain("simple")
    assert "Expand" not in buf.getvalue()
    # ... while the exact path pays the EXPAND (pinning the contrast)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(df, {"k": F.col("k")}, ["s"]).explain("simple")
    assert "Expand" in buf.getvalue()


def test_local_clustering_coefficient_k4_and_path(spark):
    from themis_tritonsort_spark.operators.components import (
        local_clustering_coefficient,
    )

    # K4: every vertex has deg 3, 3 incident triangles, lcc = 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    got = {r["vid"]: r for r in local_clustering_coefficient(k4).collect()}
    assert set(got) == {1, 2, 3, 4}
    for v in got.values():
        assert (v["deg"], v["n_tri"], v["lcc_ppm"]) == (3, 3, 1_000_000)

    # path 1-2-3: middle vertex deg 2, no triangles, lcc 0; endpoints
    # deg 1 are excluded
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["vid"]: r for r in local_clustering_coefficient(path).collect()}
    assert set(got) == {2}
    assert (got[2]["n_tri"], got[2]["lcc_ppm"]) == (0, 0)


def test_ewma_halving_hand_values(spark):
    from themis_tritonsort_spark.operators.temporal import ewma_halving

    # x = 8, 4, 10 -> s = 8, 6, 8
    df = spark.createDataFrame(
        [(1, 10, 100, 8), (1, 20, 101, 4), (1, 30, 102, 10),
         (2, 5, 200, 7)],
        "k long, ts long, eid long, x long",
    )
    got = {
        r["eid"]: r["ewma_micro"]
        for r in ewma_halving(df, "k", "ts", "eid", "x").collect()
    }
    assert got == {100: 8_000_000, 101: 6_000_000, 102: 8_000_000,
                   200: 7_000_000}
