"""Unit tests for operator semantics (the reference's gtest analog:
small fixtures, exact expected outputs — SURVEY §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.functions.text import tokens
from themis_tritonsort_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    simhash64,
)
from themis_tritonsort_spark.operators.kmeans import assign_clusters, lloyd
from themis_tritonsort_spark.operators.sessionize import sessionize_pdf
from themis_tritonsort_spark.operators.similarity import brute_force_topk, ivf_topk
from themis_tritonsort_spark.operators.sort import merge_sorted, with_global_rank


# --- tokenizer: reference WordTokenizer semantics (WordTokenizer.cc:27-69)
@pytest.mark.parametrize(
    "text,expected",
    [
        ("hello world", ["hello", "world"]),
        ("a  b..c", ["a", "b", "c"]),
        # the scanner consumes only the backslash of "\n"; the n starts
        # the next word (WordTokenizer.cc:35-39)
        (r"line one\nline two", ["line", "one", "nline", "two"]),
        ("tail\\", ["tail\\"]),  # lone trailing backslash is word material
        (r"\nstart", ["nstart"]),
        ('x(y)z?w;q/r,s."t', ["x", "y", "z", "w", "q", "r", "s", "t"]),
        ("", []),
        ("trailing word", ["trailing", "word"]),  # no terminator: counted
    ],
)
def test_tokenizer_reference_vectors(spark, text, expected):
    row = spark.createDataFrame([(text,)], "t string").select(
        tokens("t").alias("w")
    ).first()
    assert row["w"] == expected


# --- sessionization: reference anchor-reset rule
# (ClickLogSessionSummarizerReduceFunction.cc:20-64)
def test_sessionize_anchor_reset_rule():
    # clicks at t=0,15,99: 15-0 < 20 no emit; 99-0 >= 20 -> emit (0,99),
    # anchor resets; nothing left -> exactly one session.
    pdf = pd.DataFrame({"u": [1, 1, 1], "ts": [0, 15, 99], "url": ["a", "b", "c"]})
    out = sessionize_pdf(pdf, "ts", "url", 20, ["u"])
    assert out.to_dict("records") == [
        {"u": 1, "first_ts": 0, "last_ts": 99, "first_url": "a", "last_url": "c"}
    ]


def test_sessionize_closing_click_not_new_anchor():
    # After emission the NEXT click anchors: 0,25 emits (0,25); 26,30
    # anchor=26, 30-26 < 20 -> no second session.  The textbook gap rule
    # would differ; this is the reference's exact behavior.
    pdf = pd.DataFrame(
        {"u": [1] * 4, "ts": [0, 25, 26, 30], "url": list("abcd")}
    )
    out = sessionize_pdf(pdf, "ts", "url", 20, ["u"])
    assert out.to_dict("records") == [
        {"u": 1, "first_ts": 0, "last_ts": 25, "first_url": "a", "last_url": "b"}
    ]


def test_sessionize_trailing_clicks_emit_nothing():
    pdf = pd.DataFrame({"u": [1, 1], "ts": [0, 5], "url": ["a", "b"]})
    out = sessionize_pdf(pdf, "ts", "url", 20, ["u"])
    assert len(out) == 0


# --- global rank: totality, contiguity, binary-sort parity
def test_with_global_rank_is_contiguous_total_order(spark):
    df = spark.range(1000).select(
        (F.col("id") * 7919 % 1000).alias("k"), F.col("id").alias("uid")
    )
    out = with_global_rank(df, ["k", "uid"], rank_col="pos", num_partitions=7)
    rows = out.orderBy("pos").collect()
    assert [r["pos"] for r in rows] == list(range(1, 1001))
    keys = [(r["k"], r["uid"]) for r in rows]
    assert keys == sorted(keys)


def test_with_global_rank_release_bounds_cache(spark):
    # Chained sorts with the release hook must not accumulate cached
    # blocks: each sort's persisted intermediate is unpersisted after
    # its action, so the persistent-RDD count returns to baseline.
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    for i in range(3):
        released: list = []
        df = spark.range(200).select(
            ((F.col("id") * 31 + i) % 97).alias("k"), F.col("id").alias("uid")
        )
        out = with_global_rank(
            df, ["k", "uid"], rank_col="pos", num_partitions=4, release=released
        )
        assert out.count() == 200
        assert len(released) == 1
        for cached in released:
            cached.unpersist(blocking=True)
    # <= not ==: Spark's async ContextCleaner may concurrently drop
    # UNRELATED stale cached RDDs from earlier tests in the shared
    # session, shrinking the count below the captured baseline.  The
    # contract under test is only that THIS loop accumulates nothing.
    assert jsc.getPersistentRDDs().size() <= baseline


def test_with_global_prefix_sum_matches_single_window(spark):
    from themis_tritonsort_spark.operators.sort import with_global_prefix_sum

    df = spark.range(500).select(
        (F.col("id") * 7919 % 500).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    got = {
        (r["k"], r["uid"]): r["prefix_sum"]
        for r in with_global_prefix_sum(
            df, ["k", "uid"], "v", num_partitions=7
        ).collect()
    }
    rows = sorted(df.collect(), key=lambda r: (r["k"], r["uid"]))
    run = 0
    for r in rows:
        run += r["v"]
        assert got[(r["k"], r["uid"])] == run


def test_binary_sort_shorter_prefix_first(spark):
    # Comparison.h:15-30: on common prefix, shorter key sorts first.
    df = spark.createDataFrame(
        [(b"ab",), (b"a",), (b"abc",), (b"",), (b"b",)], "key binary"
    )
    got = [bytes(r["key"]) for r in df.sort("key").collect()]
    assert got == [b"", b"a", b"ab", b"abc", b"b"]


def test_merge_sorted_interleaves(spark):
    a = spark.createDataFrame([(1,), (3,), (5,)], "ts long")
    b = spark.createDataFrame([(2,), (4,), (6,)], "ts long")
    out = merge_sorted([a, b], ["ts"], rank_col="pos").orderBy("pos").collect()
    assert [r["ts"] for r in out] == [1, 2, 3, 4, 5, 6]


# --- dedup
def test_exact_duplicates_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "unique"), (4, "same text")],
        "doc_id long, text string",
    )
    out = exact_duplicates(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {1, 2, 4}
    assert all(r["canonical_id"] == 1 and r["group_size"] == 3 for r in out)


def test_jaccard_pairs_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),  # J(1,2) = 3/5
            (3, "x y z w"),
        ],
        "doc_id long, text string",
    )
    out = jaccard_pairs(df, "doc_id", "text", n=1, min_jaccard=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"], r["inter_size"], r["union_size"]) == (1, 2, 3, 5)
    # prefix filter and brute force must agree
    brute = jaccard_pairs(
        df, "doc_id", "text", n=1, min_jaccard=0.5, prefix_filter=False
    ).collect()
    assert len(brute) == 1 and brute[0] == r


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy cat again and again"),
            (3, "completely different words entirely unrelated content here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r["simhash"] for r in simhash64(df, "doc_id", "text").collect()}
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 < d13


# --- kmeans
def test_assign_clusters_argmin_and_ties(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [5.0, 0.0])],
        "id long, v array<double>",
    )
    centers = [[0.0, 0.0], [10.0, 0.0]]
    got = {
        r["id"]: r["cluster"]
        for r in assign_clusters(df, "v", centers).collect()
    }
    # point 2 is equidistant -> lowest center id wins (reference argmin)
    assert got == {0: 0, 1: 1, 2: 0}


def test_lloyd_converges_two_blobs(spark):
    pts = [(i, [float(i % 2 * 100 + (i % 5)), 0.0]) for i in range(40)]
    df = spark.createDataFrame(pts, "id long, v array<double>")
    assigned, centers = lloyd(df, "v", k=2, iterations=3,
                              initial_centers=[[0.0, 0.0], [1.0, 0.0]])
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    for i, c in got.items():
        assert c == (0 if i % 2 == 0 else 1)
    assert abs(centers[0][0] - 2.0) < 1e-9 and abs(centers[1][0] - 102.0) < 1e-9


def test_lloyd_iteration_cache_is_scoped_and_value_neutral(spark):
    """lloyd's iteration working set (vector-only projection) persists
    for the loop and is ALWAYS unpersisted before returning — no
    caller-owned cache contract (unlike pq_rerank_topk's lazy-result
    barrier) — and the cached path computes the same centers as the
    uncached path."""
    pts = [(i, [float(i % 2 * 100 + (i % 5)), 0.0]) for i in range(40)]
    df = spark.createDataFrame(pts, "id long, v array<double>")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    _, c_cached = lloyd(df, "v", k=2, iterations=3,
                        initial_centers=[[0.0, 0.0], [1.0, 0.0]])
    assert jsc.getPersistentRDDs().size() == before, "leaked cache"
    _, c_plain = lloyd(df, "v", k=2, iterations=3,
                       initial_centers=[[0.0, 0.0], [1.0, 0.0]],
                       persist_input=False)
    # same arithmetic either way: the cache stores the projection's
    # VALUES, the means fold order per partition is unchanged
    assert c_cached == c_plain


# --- similarity: IVF recall vs brute force
def test_ivf_topk_subset_of_brute(spark):
    import random

    rng = random.Random(42)
    corpus = [
        (i, [rng.gauss(cx, 1.0), rng.gauss(0, 1.0)])
        for i, cx in ((i, (i % 4) * 20.0) for i in range(80))
    ]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qs = df.where(F.col("vec_id") < 2)
    centroids = [[0.0, 0.0], [20.0, 0.0], [40.0, 0.0], [60.0, 0.0]]
    brute = brute_force_topk(df, qs, "vec_id", "embedding", k=5).collect()
    ivf = ivf_topk(df, qs, "vec_id", "embedding", k=5, centroids=centroids, nprobe=4).collect()
    # nprobe = all cells -> identical results
    assert sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in brute
    )


def test_assign_clusters_numpy_matches_literal(spark, sf_dir):
    """The large-k numpy path must agree with the literal (oracle-
    parity) path on real data — random vectors have no exact distance
    ties, so float summation-order differences cannot flip the argmin
    here."""
    from themis_tritonsort_spark.operators.kmeans import assign_clusters

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 6).orderBy("vec_id").collect()
    ]
    lit = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, "embedding", centers, strategy="literal").collect()
    }
    npy = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, "embedding", centers, strategy="numpy").collect()
    }
    assert lit == npy and len(lit) > 0


def test_build_ivf_recall_floor(spark, sf_dir):
    """Self-trained IVF with nprobe=half-the-cells must recover most of
    the exact top-k (deterministic: seeded centroids, fixed data)."""
    from themis_tritonsort_spark.operators.similarity import build_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in build_ivf_topk(
            emb, queries, "vec_id", "embedding", k=10, n_cells=8, nprobe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_cohort_fused_agg_equals_set_ops(spark, sf_dir):
    """q54's fused conditional aggregate (1 scan, 1 shuffle) must equal
    the literal DataFrame.intersect/subtract formulation (6 scans,
    3 shuffles) — the set-op API coverage witness."""
    from themis_tritonsort_spark.data import table
    from themis_tritonsort_spark.queries import q54_yearly_cohorts

    od = table(spark, sf_dir, "orders")

    def active(year):
        return od.where(F.year("o_orderdate") == year).select(
            F.col("o_custkey").alias("custkey")
        )

    a, b = active(1995), active(1996)
    set_form = (
        a.intersect(b)
        .select(F.lit("both").alias("cohort"), "custkey")
        .unionByName(
            a.subtract(b).select(F.lit("only_1995").alias("cohort"), "custkey")
        )
        .unionByName(
            b.subtract(a).select(F.lit("only_1996").alias("cohort"), "custkey")
        )
    )
    expected = {(r["cohort"], r["custkey"]) for r in set_form.collect()}
    fused = {
        (r["cohort"], r["custkey"])
        for r in q54_yearly_cohorts(spark, sf_dir).collect()
    }
    assert fused == expected and len(fused) > 0


def test_triangle_counts_known_graph(spark):
    from themis_tritonsort_spark.operators.components import triangle_counts

    # K4 on {1,2,3,4} has 4 triangles: 123,124,134 at vid 1; 234 at 2.
    # Vertex 5 hangs off 1 (no triangle); edge given reversed + dup.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (2, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["vid"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 1}


def test_triangle_total_degree_oriented_matches_exact(spark):
    from themis_tritonsort_spark.operators.components import (
        triangle_counts,
        triangle_total_degree_oriented,
    )

    # K4 + pendant (4 triangles), with duplicates/reversals thrown in.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (2, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_total_degree_oriented(df).collect()[0]["n_triangles"] == 4

    # a skewed star + rim: hub 0 connects to 1..12, rim edges close
    # consecutive spokes -> 12 triangles, all through the hub; the
    # degree-oriented total must match the id-oriented per-vertex sum.
    star = [(0, i) for i in range(1, 13)]
    rim = [(i, i % 12 + 1) for i in range(1, 13)]
    sdf = spark.createDataFrame(star + rim, ["src", "dst"])
    exact = sum(
        r["n_triangles"] for r in triangle_counts(sdf).collect()
    )
    got = triangle_total_degree_oriented(sdf).collect()[0]["n_triangles"]
    assert got == exact == 12


def test_funnel_steps_strict_ordering(spark):
    from datetime import datetime

    from themis_tritonsort_spark.operators.sessionize import funnel_steps

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full funnel in order -> 3
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2: purchase BEFORE click -> stops at 2
        (2, t(1), "view"), (2, t(3), "click"), (2, t(2), "purchase"),
        # user 3: click at the SAME instant as view -> strict > blocks
        (3, t(1), "view"), (3, t(1), "click"),
        # user 4: only irrelevant events -> absent from output
        (4, t(1), "error"),
        # user 5: click with no prior view -> 0
        (5, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r["stage"]
        for r in funnel_steps(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 5: 0}


def test_graph_ops_cache_ownership(spark, monkeypatch):
    """ADVICE r09 cache discipline: the iterative graph ops
    (connected_components, kcore_vertices, label_propagation, bfs_hops)
    materialize internally and release EVERY persist they take before
    returning; the triangle family returns lazy data-sized results that
    keep reading the persisted canonical edge set, so they expose the
    handle as ``result.cached_deps`` (the q85 caller-owned contract)
    instead of leaking it silently."""
    from themis_tritonsort_spark.operators import components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["vid"])

    # patch the CONCRETE class (pyspark 4: pyspark.sql.DataFrame is an
    # abstract facade; classic sessions instantiate a subclass)
    DataFrame = type(edges)
    taken: list = []
    orig = DataFrame.persist

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        taken.append(out)
        return out

    monkeypatch.setattr(DataFrame, "persist", spy)

    def cached(df):
        lvl = df.storageLevel
        return lvl.useMemory or lvl.useDisk

    # self-releasing ops: every persist taken is released on return
    for call in (
        lambda: C.connected_components(edges).collect(),
        lambda: C.kcore_vertices(edges, k=2).collect(),
        lambda: C.label_propagation(edges, rounds=2).collect(),
        lambda: C.bfs_hops(edges, seeds, rounds=2).collect(),
    ):
        taken.clear()
        call()
        assert taken, "op stopped persisting its edge set?"
        assert not any(cached(h) for h in taken)

    # lazy triangle family: the edge persist is caller-owned and exposed
    for op in (
        lambda: C.triangle_counts(edges),
        lambda: C.triangle_total_degree_oriented(edges),
        lambda: C.local_clustering_coefficient(edges),
    ):
        taken.clear()
        out = op()
        assert out.cached_deps == taken  # the handle IS the exposure
        first = out.collect()
        assert all(cached(h) for h in out.cached_deps)
        for h in out.cached_deps:
            h.unpersist(blocking=True)
        assert not any(cached(h) for h in out.cached_deps)
        # releasing the cache must not change the answer (lineage intact)
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, first))


def test_triangle_total_doulion(spark):
    """DOULION sparsified triangle count: p=1 degenerates to the exact
    count; p<1 counts triangles on the md5-deterministic subgraph and
    scales by the integer (1/p)^3 — replicated here brute-force in
    Python on the same hash family, so the test pins BOTH the sampling
    discipline and the estimator arithmetic."""
    import hashlib
    from itertools import combinations

    from themis_tritonsort_spark.operators.components import (
        triangle_total_doulion,
        triangle_total_degree_oriented,
    )

    # K6 minus one edge: 16 triangles, enough edges that p=1/2 keeps a
    # nontrivial strict subset.
    verts = [1, 2, 3, 4, 5, 6]
    all_edges = [e for e in combinations(verts, 2) if e != (5, 6)]
    df = spark.createDataFrame(all_edges, ["src", "dst"])

    exact = triangle_total_degree_oriented(df).collect()[0]["n_triangles"]
    assert exact == 16

    # p = 1: every edge kept, scale 1 -> the exact count
    got = triangle_total_doulion(df, p_ppm=1_000_000).collect()[0]
    assert got["n_triangles_est"] == exact

    # p = 1/2: replay the hash-sampling in Python and brute-force the
    # sampled subgraph's triangles; the operator must match count * 8.
    def kept(a, b, p_ppm):
        h = hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15]
        return int(h, 16) % 1_000_000 < p_ppm

    sampled = {e for e in all_edges if kept(*e, 500_000)}
    assert 0 < len(sampled) < len(all_edges)  # a strict, nonempty subset
    tris = sum(
        1
        for t in combinations(verts, 3)
        if all(tuple(sorted(p)) in sampled for p in combinations(t, 2))
    )
    got = triangle_total_doulion(df, p_ppm=500_000).collect()[0]
    assert got["n_triangles_est"] == tris * 8

    # invalid p: zero, >1e6, or not a divisor of 1e6
    import pytest as _pytest

    for bad in (0, 1_000_001, 300_000):
        with _pytest.raises(ValueError, match="p_ppm"):
            triangle_total_doulion(df, p_ppm=bad)


def test_connected_components_frontier_matches_union_find(spark):
    """Frontier (delta) min-label propagation (r11) must label every
    vertex with its component minimum — pinned against a brute-force
    union-find on a shape that exercises the frontier's edge cases: a
    20-hop chain (many rounds whose late frontiers are tiny, including
    rounds where previously-changed vertices go quiet and must NOT
    re-offer), two cliques bridged by a single edge (a changed vertex
    re-activating an already-converged region), and an isolated
    self-loop vertex."""
    from themis_tritonsort_spark.operators.components import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(100, 120)]  # chain, min = 100
    edges += [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(a, b) for a in range(50, 55) for b in range(50, 55) if a < b]
    edges += [(4, 50)]  # bridge: second clique must drain to 0
    edges += [(200, 200)]  # self-loop only: vertex filtered out entirely
    edges += [(119, 118), (100, 101)]  # duplicate + mirrored rows

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {(v, find(v)) for v in parent}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["vid"], r["component"])
        for r in connected_components(df, max_iterations=50).collect()
    }
    assert got == want


def test_connected_components_star_matches_min_label(spark):
    """The alternating large-star/small-star variant must produce the
    identical (vid, component) relation as min-label propagation on an
    arbitrary graph — same minimum-id component contract."""
    from themis_tritonsort_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    # seeded pseudo-random graph: 120 vertices, ~150 hash-derived edges
    # (several components of mixed shape), plus a self-loop and dups
    edges = [((i * 7919) % 120, (i * 104729 + 13) % 120) for i in range(150)]
    edges += [(5, 5), (17, 3), (3, 17)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = {
        (r["vid"], r["component"])
        for r in connected_components(df, max_iterations=50).collect()
    }
    got = {
        (r["vid"], r["component"])
        for r in connected_components_star(df).collect()
    }
    assert got == want


def test_connected_components_star_handles_long_chains(spark):
    """The adversarial shape the variant exists for: a 300-hop chain.
    Min-label needs diameter rounds (raises at max_iterations=10);
    star contraction converges in O(log n) alternations and labels
    every vertex with the chain's minimum."""
    import pytest as _pytest

    from themis_tritonsort_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, ["src", "dst"])

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=10).collect()

    out = connected_components_star(df, max_iterations=12).collect()
    assert len(out) == 301
    assert all(r["component"] == 0 for r in out)
    assert {r["vid"] for r in out} == set(range(301))


def test_connected_components_star_releases_checkpoint_blocks(spark):
    """ADVICE r10: superseded alternations' localCheckpoint blocks are
    released inside the loop, not left for GC + ContextCleaner — after
    the call returns and the result is consumed, at most the final
    round's block sets may linger, never ~2 per alternation."""
    import gc

    from themis_tritonsort_spark.operators.components import (
        connected_components_star,
    )

    sc = spark.sparkContext

    def n_stored() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    # settle any leftovers from earlier tests in the shared session
    gc.collect()
    base = n_stored()
    # a 64-hop chain forces several alternations (the shape that would
    # otherwise accumulate 2 block sets per round)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    out = connected_components_star(df, max_iterations=12)
    assert out.count() == 65
    # everything superseded was released in-loop; only the fixed-point
    # round's sets (large-star mid + final e, <= 2) may remain until
    # their Python handles die
    assert n_stored() - base <= 2


# --- fused minhash band buckets == composed signature->bands (r11)
def test_minhash_band_buckets_matches_composed(spark):
    from themis_tritonsort_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_band_buckets,
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "pack my box with five dozen liquor jugs"),
            (4, ""),  # empty doc: dropped by both paths
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    composed = lsh_band_buckets(
        minhash_signature(docs, "doc_id", "text", n=2, num_hashes=8),
        bands=4,
        num_hashes=8,
    )
    fused = minhash_band_buckets(
        docs, "doc_id", "text", n=2, num_hashes=8, bands=4
    )
    key = lambda r: (r["doc"], r["band"], r["band_sig"])  # noqa: E731
    assert sorted(map(key, fused.collect())) == sorted(
        map(key, composed.collect())
    )
    # identical docs still collide in every band through the fused path
    sigs = {
        (r["doc"], r["band"]): r["band_sig"] for r in fused.collect()
    }
    assert all(sigs[(1, b)] == sigs[(5, b)] for b in range(4))


def test_minhash_band_buckets_rejects_nondividing_bands(spark):
    from themis_tritonsort_spark.operators.dedup import minhash_band_buckets

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_band_buckets(docs, "doc_id", "text", n=1, num_hashes=8, bands=3)
