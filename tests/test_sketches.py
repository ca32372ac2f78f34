"""Approximate aggregates vs their exact counterparts (error bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.data import table
from themis_tritonsort_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
)

from .conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in approx_distinct(li, ["l_returnflag"], "l_partkey", rsd=0.02).collect()
    }
    assert approx.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(5, 0.1 * e)  # 5 sigma of rsd=2%


def test_approx_quantiles_bracket_exact_median(spark):
    ev = table(spark, SF_SMOKE, "events").withColumn(
        "v", F.col("value").cast("double")
    )
    got = {
        r["event_type"]: dict(zip(r["p"], r["q"]))
        for r in approx_quantiles(
            ev, ["event_type"], "v", probabilities=(0.5,), accuracy=10_000
        ).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    for k, m in exact.items():
        # rank error 1/accuracy: approx median within the central band
        lo, hi = (
            ev.where(F.col("event_type") == k)
            .select(
                F.expr("percentile(v, 0.45)").alias("lo"),
                F.expr("percentile(v, 0.55)").alias("hi"),
            )
            .collect()[0]
        )
        assert lo <= got[k][0.5] <= hi, (k, got[k], m)


def test_frequent_items_finds_planted_heavy_hitter(spark):
    base = spark.range(10_000).select((F.col("id") % 5000).alias("v"))
    heavy = spark.range(3_000).select(F.lit(424242).cast("long").alias("v"))
    items = frequent_items(base.unionByName(heavy), "v", min_share=0.1)
    assert 424242 in items
    with pytest.raises(ValueError):
        frequent_items(base, "v", min_share=0.0)


def test_histogram_quantiles_contract(spark):
    from themis_tritonsort_spark.operators.sketches import histogram_quantiles

    import pytest as _pt
    from pyspark.sql import functions as F

    # 100 values 0..99, bin width 10: p50 -> first bin with cum >= 50
    # = bin 4 (values 40..49, cum 50) -> ub 50; p95 -> bin 9 -> ub 100
    df = spark.range(100).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    [r] = histogram_quantiles(
        df, ["g"], "v", bin_width=10, n_bins=20, percents=[50, 95]
    ).collect()
    assert (r["n"], r["p50_ub"], r["p95_ub"]) == (100, 50, 100)

    # sketch upper bound brackets the exact quantile from above
    [exact] = df.groupBy("g").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p50")
    ).collect()
    assert exact["p50"] <= r["p50_ub"]

    # overflow clamp: values beyond the range saturate at the cap
    big = spark.range(10).select(
        F.lit("g").alias("g"), (F.col("id") + 1000).alias("v")
    )
    [rb] = histogram_quantiles(
        big, ["g"], "v", bin_width=10, n_bins=5, percents=[50]
    ).collect()
    assert rb["p50_ub"] == 50  # 5 bins * width 10 = the saturation value

    # mergeability: sum of two halves' counters == whole (same sketch
    # by construction of the plan; checked semantically via equality)
    h1 = df.where(F.col("v") < 50)
    h2 = df.where(F.col("v") >= 50)
    whole = histogram_quantiles(df, ["g"], "v", 10, 20, [95])
    merged = histogram_quantiles(
        h1.unionByName(h2), ["g"], "v", 10, 20, [95]
    )
    assert whole.collect() == merged.collect()

    # NULL values are dropped before binning (contract: integral
    # non-negative input; NULL order differs across engines)
    with_null = df.unionByName(
        spark.range(1).select(
            F.lit("g").alias("g"), F.lit(None).cast("long").alias("v")
        )
    )
    [rn] = histogram_quantiles(
        with_null, ["g"], "v", bin_width=10, n_bins=20, percents=[50]
    ).collect()
    assert (rn["n"], rn["p50_ub"]) == (100, 50)

    with _pt.raises(ValueError):
        histogram_quantiles(df, ["g"], "v", 0, 10)
