"""Unit tests for the round-4 operator additions — deterministic HLL /
count-min sketches, SCD2 history, grouped z-scores, label propagation,
and weighted sampling.  The catalog oracle (test_queries_oracle) proves
engine parity; these prove the SEMANTIC contracts on hand-built
fixtures where the expected answer is computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.data import table
from themis_tritonsort_spark.operators.components import label_propagation
from themis_tritonsort_spark.operators.sampling import (
    weighted_priority_sample,
)
from themis_tritonsort_spark.operators.sketches import (
    cms_lookup,
    cms_sketch,
    hll_estimate,
    hll_registers,
)
from themis_tritonsort_spark.operators.stats import (
    group_zscore,
    zscore_outliers,
)
from themis_tritonsort_spark.operators.temporal import scd2_intervals

from .conftest import SF_ORACLE, SF_SMOKE


# ---------------------------------------------------------------- HLL


def test_hll_estimate_tracks_exact_distinct(spark):
    ev = table(spark, SF_ORACLE, "events").select("event_type", "user_id")
    regs = hll_registers(ev, ["event_type"], "user_id", p=9)
    est = {
        r["event_type"]: r["hll_estimate_micro"] / 1e6
        for r in hll_estimate(regs, ["event_type"], p=9).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        # raw HLL: ~1.04/sqrt(512) = 4.6% rsd; allow 4 sigma
        assert abs(est[k] - e) <= max(10.0, 0.20 * e), (k, est[k], e)


def test_hll_registers_bounded_by_m(spark):
    ev = table(spark, SF_SMOKE, "events").select("event_type", "user_id")
    regs = hll_registers(ev, ["event_type"], "user_id", p=7)
    per_group = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("bucket").alias("maxb"),
        F.min("reg").alias("minr"),
    )
    for r in per_group.collect():
        assert r["n"] <= 128
        assert 0 <= r["maxb"] < 128
        assert r["minr"] >= 1


def test_hll_merge_is_register_max(spark):
    # sketch(A union B) == elementwise-max(sketch(A), sketch(B)) — the
    # property that makes HLL a distributable aggregation state.
    ev = table(spark, SF_SMOKE, "events").select("event_type", "user_id")
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    whole = {
        (r["event_type"], r["bucket"]): r["reg"]
        for r in hll_registers(ev, ["event_type"], "user_id", p=8).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in hll_registers(part, ["event_type"], "user_id", p=8).collect():
            k = (r["event_type"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["reg"])
    assert merged == whole


# ---------------------------------------------------------------- CMS


def test_cms_never_underestimates(spark):
    docs = table(spark, SF_SMOKE, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sketch = cms_sketch(counts, "t", "n", depth=4, width=128)
    est = {
        r["t"]: r["cms_estimate"]
        for r in cms_lookup(sketch, counts.select("t"), "t", width=128).collect()
    }
    for r in counts.collect():
        assert est[r["t"]] >= r["n"], r["t"]


def test_cms_sketch_size_is_bounded(spark):
    docs = table(spark, SF_SMOKE, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sketch = cms_sketch(counts, "t", "n", depth=3, width=64).collect()
    assert len(sketch) <= 3 * 64
    total = counts.agg(F.sum("n")).collect()[0][0]
    # every row of the sketch partitions the full mass
    by_row: dict = {}
    for r in sketch:
        by_row[r["row"]] = by_row.get(r["row"], 0) + r["total"]
    assert set(by_row) == {0, 1, 2}
    assert all(v == total for v in by_row.values())


# ---------------------------------------------------------------- SCD2


def test_scd2_collapses_idempotent_upserts(spark):
    rows = [
        # key 1: a -> a (idempotent) -> b -> b -> a   => 3 versions
        (1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"),
        (1, 40, 4, "b"), (1, 50, 5, "a"),
        # key 2: single change => 1 open version
        (2, 15, 6, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "tb", "attr"])
    out = {
        (r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"])
        for r in scd2_intervals(df, ["k"], "o", "tb", ["attr"]).collect()
    }
    assert out == {
        (1, 1): ("a", 10, 30),
        (1, 2): ("b", 30, 50),
        (1, 3): ("a", 50, None),
        (2, 1): ("x", 15, None),
    }


def test_scd2_null_attrs_extend_runs(spark):
    rows = [(1, 10, 1, None), (1, 20, 2, None), (1, 30, 3, "v")]
    df = spark.createDataFrame(rows, "k int, o int, tb int, attr string")
    got = sorted(
        (r["version"], r["attr"], r["valid_from"], r["valid_to"])
        for r in scd2_intervals(df, ["k"], "o", "tb", ["attr"]).collect()
    )
    # NULL -> NULL is the same version (eqNullSafe); NULL -> 'v' opens one
    assert got == [(1, None, 10, 30), (2, "v", 30, None)]


def test_scd2_intervals_tile_the_timeline(spark):
    ev = table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_micros("ts").alias("o"), "event_id", "event_type"
    )
    out = scd2_intervals(
        ev, ["user_id"], "o", "event_id", ["event_type"]
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    bad = out.withColumn("nxt", F.lead("valid_from").over(w)).where(
        (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt")))
        | (F.col("valid_to").isNull() & F.col("nxt").isNotNull())
    )
    assert bad.count() == 0  # valid_to == next valid_from; only last open


# ---------------------------------------------------------------- z-score


def test_group_zscore_hand_values(spark):
    # group g: values 0, 10 -> mean 5, pop std 5 -> z = -1, +1
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 10), ("solo", 3, 7), ("flat", 4, 3),
         ("flat", 5, 3)],
        ["grp", "id", "v"],
    )
    z = {r["id"]: r["z_micro"] for r in group_zscore(df, "grp", "v").collect()}
    assert z[1] == -1_000_000 and z[2] == 1_000_000
    assert z[3] is None  # single row: no spread
    assert z[4] is None and z[5] is None  # zero variance


def test_zscore_outliers_threshold_is_inclusive(spark):
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([0, 0, 0, 0, 100])], ["grp", "id", "v"]
    )
    out = zscore_outliers(df, "grp", "v", 1_900_000).collect()
    assert [r["id"] for r in out] == [4]  # z of the spike = +2.0 sigma
    with pytest.raises(ValueError):
        zscore_outliers(df, "grp", "v", 0)


# ---------------------------------------------------------------- LP


def test_label_propagation_two_cliques(spark):
    # two 4-cliques bridged by one edge: labels collapse to each
    # clique's minimum within 3 rounds and the bridge does not merge them
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(11, 15) for b in range(11, 15) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(4, 11)], ["src", "dst"])
    got = {
        r["vid"]: r["label"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert {got[v] for v in (1, 2, 3)} == {1}
    assert {got[v] for v in (12, 13, 14)} == {11}
    assert got[1] != got[12]


def test_label_propagation_zero_rounds_is_identity(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {
        r["vid"]: r["label"]
        for r in label_propagation(edges, rounds=0).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


# ---------------------------------------------------------------- sample


def test_weighted_sample_favors_heavy_rows(spark):
    # 500 light rows (w=1) + 500 heavy (w=8): heavies should take a
    # clearly dominant share of a k=100 draw (E ~ 8/9 of the sample)
    rows = [(i, 1) for i in range(500)] + [(i, 8) for i in range(500, 1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = weighted_priority_sample(df, "id", "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["id"] >= 500)
    assert heavy >= 70  # binomial(100, 8/9) practically never below 70


def test_weighted_sample_is_deterministic_and_capped(spark):
    rows = [(i, 1 + i % 5) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = sorted(r["id"] for r in weighted_priority_sample(df, "id", "w", 50).collect())
    b = sorted(
        r["id"]
        for r in weighted_priority_sample(
            df.repartition(7), "id", "w", 50
        ).collect()
    )
    assert a == b  # partitioning-independent
    capped = weighted_priority_sample(
        spark.createDataFrame([(1, 10_000)], ["id", "w"]), "id", "w", 1,
        max_weight=16,
    ).collect()
    assert capped[0]["weight"] == 16
    with pytest.raises(ValueError):
        weighted_priority_sample(df, "id", "w", 0)
