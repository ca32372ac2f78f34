"""Map-output-aware partition sizing — the phase-0 analog.

The reference's phase zero runs the real map function over samples and
sizes intermediate partitions from the measured bytes-in -> bytes-out
ratio (mapreduce/common/PhaseZeroSampleMetadata.cc:12-76,
main.cc:1516-1536).  These tests pin the Spark-side analog: an
inflating map must get proportionally more shuffle partitions than an
identity map over the same input, and AUTO_PARTITIONS must wire the
measured count into the job's partition step.
"""

from __future__ import annotations

from themis_tritonsort_spark.plans.job import (
    ThemisJob,
    run_job,
    sample_partition_count,
)
from themis_tritonsort_spark.sources.gensort import generate_records


def test_inflating_map_scales_partition_count(spark):
    recs = generate_records(spark, 2000)
    ident = ThemisJob()  # PassThroughMapFunction
    inflate = ThemisJob(
        map_function="RatioMapFunction", params={"RATIO": 4}
    )
    kw = dict(target_partition_bytes=64 << 10, sample_rows=500)
    n_ident = sample_partition_count(spark, ident, df=recs, **kw)
    n_inflate = sample_partition_count(spark, inflate, df=recs, **kw)
    assert n_ident >= 2  # the target is small enough to split
    # a 4x byte inflation should produce ~4x the partitions
    assert 3.0 <= n_inflate / n_ident <= 5.0


def test_identity_ratio_one_keeps_count(spark):
    recs = generate_records(spark, 2000)
    kw = dict(target_partition_bytes=64 << 10, sample_rows=500)
    n_pass = sample_partition_count(spark, ThemisJob(), df=recs, **kw)
    n_ratio1 = sample_partition_count(
        spark,
        ThemisJob(map_function="RatioMapFunction", params={"RATIO": 1}),
        df=recs,
        **kw,
    )
    assert n_pass == n_ratio1


def test_empty_input_returns_min_partitions(spark):
    recs = generate_records(spark, 2000).limit(0)
    n = sample_partition_count(spark, ThemisJob(), df=recs)
    assert n == 1


def test_auto_partitions_wired_into_run_job(spark):
    recs = generate_records(spark, 2000)
    job = ThemisJob(
        map_function="RatioMapFunction",
        partition_function="RandomNodePartitionFunction",
        params={
            "RATIO": 4,
            "AUTO_PARTITIONS": True,
            "TARGET_PARTITION_BYTES": 64 << 10,
        },
    )
    expected = sample_partition_count(
        spark, job, df=recs, target_partition_bytes=64 << 10
    )
    out = run_job(spark, job, df=recs)
    assert out.rdd.getNumPartitions() == expected


def test_explicit_num_partitions_wins_over_auto(spark):
    recs = generate_records(spark, 2000)
    job = ThemisJob(
        map_function="RatioMapFunction",
        partition_function="RandomNodePartitionFunction",
        params={"RATIO": 4, "AUTO_PARTITIONS": True, "NUM_PARTITIONS": 3},
    )
    out = run_job(spark, job, df=recs)
    assert out.rdd.getNumPartitions() == 3
