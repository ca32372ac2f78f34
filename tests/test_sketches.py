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
