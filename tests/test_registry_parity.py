"""Registry parity with the reference function factories, plus
functional tests for the fragment forms of the iterative operators.

Reference catalogs: MapFunctionFactory.cc:24-118 (20 names),
ReduceFunctionFactory.cc:1-53 (11 names), PartitionFunctionFactory.cc
(6 names).  DiskBenchmark* are IO micro-benchmarks, not data operators
(SURVEY §3.3) and BoundaryScanner is internal to range sampling
(SURVEY §2.3 X6) — documented skips.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_tritonsort_spark.plans.job import (
    MAP_FUNCTIONS,
    PARTITION_FUNCTIONS,
    REDUCE_FUNCTIONS,
)

REFERENCE_MAP = {
    "BytesCountMapFunction", "CombiningWordCountMapFunction",
    "GenPowerLawRandomNetworkMapFunction", "GenRandomKMeansDataMapFunction",
    "GenRandomNetworkMapFunction", "GenRandomRatioDataMapFunction",
    "GrepMapFunction", "InvertedIndexMapFunction", "KMeansMapFunction",
    "NGramMapFunction", "PageRankMapFunction", "ParseNetworkMapFunction",
    "PassThroughMapFunction", "RatioMapFunction",
    "TupleLengthCounterMapFunction", "WEXLinkExtractorMapFunction",
    "WEXTextExtractorMapFunction", "WordCountMapFunction",
    "ZeroKeyMapFunction",
}
REFERENCE_REDUCE = {
    "ClickLogSessionSummarizerReduceFunction",
    "CountDuplicateKeysReduceFunction",
    "GenPowerLawRandomNetworkReduceFunction", "IdentityReduceFunction",
    "InvertedIndexReduceFunction", "KMeansReduceFunction",
    "PageRankReduceFunction", "RatioReduceFunction",
    "SumValuesReduceFunction", "WordCountReduceFunction",
}
REFERENCE_PARTITION = {
    "BoundaryListPartitionFunction", "HashedBoundaryListPartitionFunction",
    "UniformPartitionFunction", "RandomNodePartitionFunction",
    "SinglePartitionMergingPartitionFunction",
}


def test_registries_cover_reference_factories():
    assert REFERENCE_MAP <= set(MAP_FUNCTIONS), REFERENCE_MAP - set(MAP_FUNCTIONS)
    assert REFERENCE_REDUCE <= set(REDUCE_FUNCTIONS), (
        REFERENCE_REDUCE - set(REDUCE_FUNCTIONS)
    )
    assert REFERENCE_PARTITION <= set(PARTITION_FUNCTIONS), (
        REFERENCE_PARTITION - set(PARTITION_FUNCTIONS)
    )


def test_pagerank_fragments_match_operator(spark):
    from themis_tritonsort_spark.operators.pagerank import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]  # 3 is dangling (created)
    edf = spark.createDataFrame(edges, "src long, dst long")
    want = {
        (r["vid"], round(r["rank"], 9))
        for r in pagerank(edf, iterations=1).collect()
    }

    verts = (
        edf.groupBy(F.col("src").alias("vid"))
        .agg(F.array_sort(F.collect_list("dst")).alias("adj"))
        .withColumn("rank", F.lit(1.0))
    )
    mapped = MAP_FUNCTIONS["PageRankMapFunction"](verts, {})
    reduced = REDUCE_FUNCTIONS["PageRankReduceFunction"](mapped, {})
    got = {(r["vid"], round(r["rank"], 9)) for r in reduced.collect()}
    assert got == want


def test_kmeans_reduce_elementwise_mean(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "key long, value array<double>",
    )
    got = {
        r["key"]: r["value"]
        for r in REDUCE_FUNCTIONS["KMeansReduceFunction"](df, {}).collect()
    }
    assert got == {0: [2.0, 4.0], 1: [10.0, 0.0]}


def test_gen_network_fragments_deterministic(spark):
    base = spark.range(1)
    p = {"NUM_VERTICES": 200, "MAX_NEIGHBORS": 4, "SEED": 9}
    a = MAP_FUNCTIONS["GenRandomNetworkMapFunction"](base, p).collect()
    b = MAP_FUNCTIONS["GenRandomNetworkMapFunction"](base, p).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0
    assert all(0 <= r["dst"] < 200 for r in a)

    adj = REDUCE_FUNCTIONS["GenPowerLawRandomNetworkReduceFunction"](
        MAP_FUNCTIONS["GenPowerLawRandomNetworkMapFunction"](base, p), {}
    ).collect()
    assert len(adj) > 0
    assert all(len(r["adj"]) >= 1 for r in adj)


def test_ratio_map_inflates(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "key long, value string")
    out = MAP_FUNCTIONS["RatioMapFunction"](df, {"RATIO": 3}).collect()
    assert len(out) == 6
    assert len({r["key"] for r in out}) == 6  # fresh deterministic keys


def test_sessionize_reduce_fragment(spark):
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 15, "b"), (1, 99, "c"), (2, 0, "x")],
        "user_id long, ts long, url string",
    )
    out = REDUCE_FUNCTIONS["ClickLogSessionSummarizerReduceFunction"](
        df, {"THRESHOLD": 20}
    ).collect()
    assert [(r["user_id"], r["first_ts"], r["last_ts"]) for r in out] == [(1, 0, 99)]


def test_pagerank_two_iterations_via_job_chain(spark):
    """SURVEY §3.1 chaining parity: the reference's pagerank.py submits
    one job per iteration; run_in_sequence over (map, reduce) fragment
    jobs must equal the operator module's 2-iteration result."""
    from themis_tritonsort_spark.operators.pagerank import pagerank
    from themis_tritonsort_spark.plans.job import ThemisJob, run_in_sequence

    edges = [(1, 2), (1, 3), (2, 3), (4, 1), (3, 4)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    want = {
        (r["vid"], round(r["rank"], 9))
        for r in pagerank(edf, iterations=2).collect()
    }

    verts = (
        edf.groupBy(F.col("src").alias("vid"))
        .agg(F.array_sort(F.collect_list("dst")).alias("adj"))
        .withColumn("rank", F.lit(1.0))
    )
    it = ThemisJob(
        map_function="PageRankMapFunction",
        reduce_function="PageRankReduceFunction",
    )
    out = run_in_sequence(spark, [it, it], df=verts)
    got = {(r["vid"], round(r["rank"], 9)) for r in out.collect()}
    assert got == want


def test_driver_window_composition():
    """The round driver gates the FIRST 50 entries of queries() — pin
    that the window is exactly the rotation plan (round-12: the full
    48-entry r09-stale block plus the q01/q19 get-ahead slots from
    the r10 set), every windowed entry has an oracle, and nothing
    outside the window lacks local oracle coverage."""
    from themis_tritonsort_spark.queries import (
        _WINDOW_PRIORITY,
        ORACLES,
        QUERIES,
    )

    assert len(_WINDOW_PRIORITY) == 50
    assert list(QUERIES)[:50] == _WINDOW_PRIORITY
    missing = [n for n in _WINDOW_PRIORITY if n not in ORACLES]
    assert missing == []
    windowed_prefixes = {n.split("_")[0] for n in _WINDOW_PRIORITY}
    # the 48 entries whose newest driver row is r09 (3 rounds old at
    # the r12 gate) all rotate in: q04..q18 (incl. q10b), q20..q23,
    # q29, q31, q38, q39, q50..q72, q132
    stale_r09 = (
        {f"q{i:02d}" for i in range(4, 19)}
        | {"q10b"}
        | {f"q{i}" for i in range(20, 24)}
        | {"q29", "q31", "q38", "q39"}
        | {f"q{i}" for i in range(50, 73)}
        | {"q132"}
    )
    assert stale_r09 <= windowed_prefixes
    # spares: get-ahead picks from the 50-entry r10 set (first two in
    # catalog order), shrinking the r13-stale set from 50 to 48
    assert {"q01", "q19"} <= windowed_prefixes


def test_bench_set_covers_the_catalog():
    """bench.py times every catalog query (a few via scale-variant
    stand-ins sharing the qNN prefix — trigram shingles, wide LSH).
    A catalog addition without a bench row silently shrinks the
    per-round perf evidence; pin the coverage."""
    import bench

    from themis_tritonsort_spark.queries import QUERIES

    def prefix(name: str) -> str:
        return name.split("_")[0]

    benched = {prefix(n) for n in bench.BENCH_QUERIES}
    catalog = {prefix(n) for n in QUERIES}
    missing = sorted(catalog - benched)
    assert missing == [], f"catalog queries without a bench row: {missing}"
