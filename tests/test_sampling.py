"""Deterministic sampling + chunking operators (corpus selection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.operators.sampling import (
    hash_rate_sample,
    stratified_topk_sample,
)
from themis_tritonsort_spark.operators.textstats import chunk_documents


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("g"),
    )


def test_stratified_topk_caps_every_group_deterministically(spark):
    df = _docs(spark)
    out = stratified_topk_sample(df, "g", "doc_id", k=10)
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"0": 10, "1": 10, "2": 10, "3": 10}
    # determinism: same selection on a differently-partitioned input
    again = stratified_topk_sample(df.repartition(13), "g", "doc_id", k=10)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # a group smaller than k survives whole
    small = stratified_topk_sample(df.where("doc_id < 3"), "g", "doc_id", k=10)
    assert small.count() == 3
    with pytest.raises(ValueError):
        stratified_topk_sample(df, "g", "doc_id", k=0)


def test_hash_rate_sample_rate_and_determinism(spark):
    df = _docs(spark, n=2000)
    kept = hash_rate_sample(df, "doc_id", rate=0.25)
    n = kept.count()
    assert 350 < n < 650  # ~500 expected; md5 is uniform
    # subset property: a higher rate strictly contains a lower one
    more = hash_rate_sample(df, "doc_id", rate=0.5)
    ids, more_ids = (
        {r["doc_id"] for r in kept.collect()},
        {r["doc_id"] for r in more.collect()},
    )
    assert ids <= more_ids
    with pytest.raises(ValueError):
        hash_rate_sample(df, "doc_id", rate=1.5)
    with pytest.raises(ValueError):
        hash_rate_sample(df, "doc_id")


def test_hash_rate_sample_per_group_rates(spark):
    df = _docs(spark, n=2000)
    out = hash_rate_sample(
        df, "doc_id", rates={"0": 1.0, "1": 0.0, "2": 0.5}, group_col="g"
    )
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes.get("0") == 500  # rate 1.0 keeps everything
    assert "1" not in sizes  # rate 0.0 drops everything
    assert 150 < sizes.get("2", 0) < 350  # ~250
    assert "3" not in sizes  # unmapped stratum dropped
    with pytest.raises(ValueError):
        hash_rate_sample(df, "doc_id", rates={"0": 1.0})  # missing group_col
    with pytest.raises(ValueError):
        hash_rate_sample(df, "doc_id", rates={"0": 2.0}, group_col="g")


def test_chunk_documents_cover_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1,4,7,10 — full coverage, 1-token overlap, short tail
    c1 = [r["chunk_text"].split() for r in by_doc[1]]
    assert [c[0] for c in c1] == ["w0", "w3", "w6", "w9"]
    assert c1[-1] == ["w9", "w10"]
    # every adjacent pair shares exactly the overlap token
    for a, b in zip(c1, c1[1:]):
        assert a[-1] == b[0]
    # doc 2 fits in one chunk; doc 3 (empty) emits none
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [3]
    assert 3 not in by_doc
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_repetition_stats_hand_computed(spark):
    """Known docs with hand-computable gram arithmetic:
    'a b a b a b' -> bigrams [ab,ba,ab,ba,ab]: top share 3/5;
    trigrams [aba,bab,aba,bab]: 2 dups of 4.  A no-repeat doc scores 0
    on both; a doc shorter than the gram sizes scores 0 via the guards.
    """
    from themis_tritonsort_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "p q r s"), (3, "x")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["dup_ngram_ppm"] == 1_000_000 * 2 // 4
    assert rows[1]["top_ngram_ppm"] == 1_000_000 * 3 // 5
    assert rows[2]["dup_ngram_ppm"] == 0 and rows[2]["top_ngram_ppm"] == 1_000_000 * 1 // 3
    assert rows[3]["dup_ngram_ppm"] == 0 and rows[3]["top_ngram_ppm"] == 0


def test_contamination_flags_planted_overlap(spark):
    """A train doc embedding an eval doc's 4-gram is flagged with the
    exact distinct-shared count; disjoint docs produce no row."""
    from themis_tritonsort_spark.operators.textstats import contamination

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train_df = spark.createDataFrame(
        [
            # contains 'alpha beta gamma delta' AND 'beta gamma delta epsilon'
            (1, "zz alpha beta gamma delta epsilon yy"),
            (2, "totally different words here none shared"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in contamination(train_df, eval_df, "doc_id", "text", n=4).collect()
    }
    assert out == {1: 2}


def test_encode_tokens_roundtrip_and_unks(spark):
    """Ids decode back to the original tokens for in-vocab words; OOV
    words map to 0 and are counted; id order follows token order."""
    from themis_tritonsort_spark.operators.textstats import (
        build_vocab,
        encode_tokens,
    )

    df = spark.createDataFrame(
        [(1, "b a b c b a"), (2, "a zz a")], ["doc_id", "text"]
    )
    vocab = build_vocab(df, "text", 3)
    v = {r["word"]: r["wid"] for r in vocab.collect()}
    # counts: a=4 b=3 c=1 zz=1 -> a=1, b=2, c=3 (count desc, word asc)
    assert v == {"a": 1, "b": 2, "c": 3}
    out = {r["doc_id"]: r for r in encode_tokens(df, "doc_id", "text", vocab).collect()}
    assert out[1]["ids_str"] == "2 1 2 3 2 1" and out[1]["n_unk"] == 0
    assert out[2]["ids_str"] == "1 0 1" and out[2]["n_unk"] == 1
    assert out[1]["n_tokens"] == 6 and out[2]["n_tokens"] == 3
