"""Semantic unit tests for SemDeDup and the bigram-LM scorer —
hand-computed expectations on planted fixtures (the DuckDB oracle
covers them at corpus scale; these pin the SEMANTICS)."""

from __future__ import annotations

import math

from themis_tritonsort_spark.operators.similarity import semdedup
from themis_tritonsort_spark.operators.textstats import bigram_surprisal

CENTERS = [
    [10.0, 0.0, 0.0],
    [0.0, 10.0, 0.0],
    [0.0, 0.0, 10.0],
]


def test_semdedup_flags_lower_id_duplicates(spark):
    rows = [
        (1, [9.0, 0.1, 0.0]),   # cluster 0, kept (lowest id there)
        (2, [9.0, 0.1, 0.0]),   # identical to 1 -> duplicate
        (3, [8.5, 0.2, 0.0]),   # near 1 -> duplicate
        (4, [0.0, 9.0, 0.3]),   # cluster 1, kept
        (5, [0.2, 0.0, 9.0]),   # cluster 2, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["is_dup"])
        for r in semdedup(df, "vec_id", "embedding", CENTERS, 0.95).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (0, 1)
    assert out[3] == (0, 1)
    assert out[4] == (1, 0)
    assert out[5] == (2, 0)


def test_semdedup_blocking_skips_cross_cluster_pairs(spark):
    # two vectors with cosine ~1 that land in DIFFERENT clusters are
    # never compared — the documented recall tradeoff of cluster
    # blocking (a diagonal pair equidistant-ish but split by argmin)
    rows = [
        (1, [6.0, 5.0, 0.0]),   # nearer center 0
        (2, [5.0, 6.0, 0.0]),   # nearer center 1, cosine(1,2) ~ 0.98
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["is_dup"])
        for r in semdedup(df, "vec_id", "embedding", CENTERS, 0.9).collect()
    }
    assert out[1][0] != out[2][0]  # split across clusters
    assert out[1][1] == 0 and out[2][1] == 0  # neither flagged


def test_bigram_surprisal_hand_computed(spark):
    # corpus: doc 1 = "a b a b", doc 2 = "a b c"
    # bigrams: d1: (a b) x2, (b a) x1; d2: (a b), (b c)
    # corpus counts: c(a b)=3, c(b a)=1, c(b c)=1
    # left totals:   c(a .)=3, c(b .)=2;  V = 3 (a, b, c)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micronat"], r["mean_micronat"])
        for r in bigram_surprisal(df, "doc_id", "text").collect()
    }

    def s(cab, ca, v=3):
        return round(-1e6 * math.log((cab + 1) / (ca + v)))

    s_ab, s_ba, s_bc = s(3, 3), s(1, 2), s(1, 2)
    d1 = 2 * s_ab + s_ba
    d2 = s_ab + s_bc
    assert out[1] == (3, d1, d1 // 3)
    assert out[2] == (2, d2, d2 // 2)


def test_bigram_surprisal_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"] for r in bigram_surprisal(df, "doc_id", "text").collect()}
    assert out == {3}
