"""Unit fixtures for the round-4 additions: int8 scalar-quantized ANN,
Bloom-filter incremental decontamination, token-budget mixture
sampling.  (Their end-to-end oracle parity is q81/q82/q83 in
test_queries_oracle.py; these tests pin the hand-checkable semantics.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from themis_tritonsort_spark.functions.vectors import idot, sq8_quantize
from themis_tritonsort_spark.operators.dedup import (
    BLOOM_K,
    bloom_hits_bitmap,
    bloom_hits_join,
    bloom_position_set,
    bloom_words,
)
from themis_tritonsort_spark.operators.sampling import token_budget_sample
from themis_tritonsort_spark.operators.similarity import (
    brute_force_topk,
    sq8_topk,
)


# ------------------------------------------------------------------ sq8
def test_sq8_quantize_hand_values(spark):
    df = spark.createDataFrame(
        [([1.0, -0.5, 0.25, 0.0],), ([0.0, 0.0, 0.0, 0.0],)], ["v"]
    )
    out = [
        r["q"]
        for r in df.select(sq8_quantize(F.col("v")).alias("q"))
        .orderBy(F.size(F.filter("v", lambda x: x != 0)).desc())
        .collect()
    ]
    # floor(127*1+.5)=127, floor(-63.5+.5)=-63, floor(31.75+.5)=32
    assert out[0] == [127, -63, 32, 0]
    assert out[1] == [0, 0, 0, 0]  # zero vector -> all zeros, no NaN


def test_idot_exact_integers(spark):
    df = spark.createDataFrame([([127, -63, 32],)], ["q"])
    got = df.select(
        idot(F.col("q"), F.col("q")).alias("d")
    ).collect()[0]["d"]
    assert got == 127 * 127 + 63 * 63 + 32 * 32


def test_sq8_topk_matches_exact_on_separated_vectors(spark):
    # Clusters far apart: quantization noise cannot flip the ranking.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.05, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.02, 0.98, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    exact = {
        (r["neighbor_id"], r["rank"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=2).collect()
    }
    quant = {
        (r["neighbor_id"], r["rank"])
        for r in sq8_topk(emb, q, "vec_id", "embedding", k=2).collect()
    }
    assert quant == exact == {(1, 1), (3, 2)}


def test_sq8_topk_excludes_zero_vectors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    got = sq8_topk(emb, q, "vec_id", "embedding", k=5).collect()
    assert {r["neighbor_id"] for r in got} == {1}  # the zero vector never ranks


# ---------------------------------------------------------------- bloom
_M = 1 << 12  # deliberately small so false positives are plausible


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bloom_no_false_negatives_and_paths_agree(spark):
    snap = _docs(
        spark, [(i, f"snapshot document number {i}") for i in range(200)]
    )
    batch = _docs(
        spark,
        # doc 500 is an exact copy of snapshot doc 7 -> MUST be flagged
        [(500, "snapshot document number 7")]
        + [(600 + i, f"fresh batch document {i}") for i in range(50)],
    )
    positions = bloom_position_set(snap, "text", _M)
    words = bloom_words(positions, _M)
    assert len(words) == _M // 64

    via_bitmap = {
        r["doc_id"]: r["bloom_hit"]
        for r in bloom_hits_bitmap(batch, "text", words, _M).collect()
    }
    via_join = {
        r["doc_id"]: r["bloom_hit"]
        for r in bloom_hits_join(batch, "doc_id", "text", positions, _M).collect()
    }
    assert via_bitmap == via_join  # bitmap == position-set, bit for bit
    assert via_bitmap[500] == 1  # true duplicate: never missed


def test_bloom_python_reference_parity(spark):
    # The operator's bit positions equal the straightforward Python md5
    # reference -- the same invariant the DuckDB oracle relies on.
    def ref_positions(text: str) -> list[int]:
        return [
            int(hashlib.md5(f"{text}:{j}".encode()).hexdigest()[:15], 16) % _M
            for j in range(BLOOM_K)
        ]

    snap_texts = [f"snapshot document number {i}" for i in range(200)]
    set_bits = {p for t in snap_texts for p in ref_positions(t)}
    snap = _docs(spark, list(enumerate(snap_texts)))
    batch = _docs(
        spark, [(600 + i, f"fresh batch document {i}") for i in range(50)]
    )
    words = bloom_words(bloom_position_set(snap, "text", _M), _M)
    got = {
        r["doc_id"]: r["bloom_hit"]
        for r in bloom_hits_bitmap(batch, "text", words, _M).collect()
    }
    for i in range(50):
        expect = int(
            all(p in set_bits for p in ref_positions(f"fresh batch document {i}"))
        )
        assert got[600 + i] == expect


# --------------------------------------------------------------- budget
def test_token_budget_sample_fixture(spark):
    # Two groups; texts sized so the budget cuts mid-group.  Expected
    # keep-order replicated with the same md5 hash the operator uses.
    rows = [
        (i, " ".join(["w"] * (10 * (1 + i % 3))), "a" if i < 6 else "b")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    budget = 45
    got = {
        (r["group"], r["doc_id"]): (r["n_tokens"], r["cum_tokens"])
        for r in token_budget_sample(df, "doc_id", "text", "source", budget).collect()
    }

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1_000_000

    expected = {}
    for grp, ids in (("a", range(6)), ("b", range(6, 12))):
        cum = 0
        for i in sorted(ids, key=lambda i: (h(i), i)):
            n = 10 * (1 + i % 3)
            if cum >= budget:
                break
            cum += n
            expected[(grp, i)] = (n, cum)
    assert got == expected


def test_token_budget_under_budget_group_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "one two three", "solo") for i in range(4)],
        ["doc_id", "text", "source"],
    )
    got = token_budget_sample(df, "doc_id", "text", "source", 1000).collect()
    assert len(got) == 4
    assert max(r["cum_tokens"] for r in got) == 12


def test_token_budget_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "x", "s")], ["doc_id", "text", "source"])
    import pytest

    with pytest.raises(ValueError):
        token_budget_sample(df, "doc_id", "text", "source", 0)


def test_batch_by_length_minimizes_padding(spark):
    from themis_tritonsort_spark.operators.textstats import batch_by_length

    rows = [(i, (i % 4) * 10 + 5) for i in range(16)]  # lengths 5,15,25,35
    df = spark.createDataFrame(rows, ["sid", "n_tok"])
    out = batch_by_length(df, ["sid"], "n_tok", batch_size=4).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault(r["batch_id"], []).append(r["n_tok"])
    # sorted-by-length batching puts equal lengths together: zero pad
    assert sorted(by_batch) == [0, 1, 2, 3]
    for batch, lens in by_batch.items():
        assert len(set(lens)) == 1 and len(lens) == 4


def test_batch_by_length_rejects_bad_size(spark):
    import pytest

    from themis_tritonsort_spark.operators.textstats import batch_by_length

    df = spark.createDataFrame([(1, 2)], ["sid", "n_tok"])
    with pytest.raises(ValueError):
        batch_by_length(df, ["sid"], "n_tok", 0)


def test_cdc_latest_snapshot_tombstones(spark):
    from themis_tritonsort_spark.operators.temporal import cdc_latest_snapshot

    rows = [
        # user 1: insert then update -> latest value 20 survives
        (1, 100, 10, "upsert", 10.0),
        (1, 200, 11, "upsert", 20.0),
        # user 2: update then delete -> no snapshot row
        (2, 100, 12, "upsert", 30.0),
        (2, 300, 13, "delete", 0.0),
        # user 3: delete then REINSERT -> latest wins, row survives
        (3, 100, 14, "delete", 0.0),
        (3, 400, 15, "upsert", 40.0),
        # user 4: same ts tie -> higher event_id wins (total order)
        (4, 500, 16, "upsert", 50.0),
        (4, 500, 17, "delete", 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts_us", "event_id", "op", "value"]
    )
    snap = {
        r["user_id"]: r["value"]
        for r in cdc_latest_snapshot(
            df, ["user_id"], ["ts_us", "event_id"], F.col("op") == "delete"
        ).collect()
    }
    assert snap == {1: 20.0, 3: 40.0}
