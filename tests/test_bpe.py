"""Semantic contract of the distributed BPE trainer against an
independent pure-Python reference implementation (plain dicts and
loops — shares no code with the operator), plus encode/contract
edges.  Engine parity is proved by the q106 oracle."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from themis_tritonsort_spark.operators.bpe import (
    BPE_MAX_WORD_LEN,
    BPE_WORD_RE,
    bpe_encode,
    bpe_train,
)


def _ref_tokens(text: str) -> list[str]:
    # mirror of functions.text.tokens' split set (see its docstring)
    out = re.split(r"[\n \".,/()?;]", text)
    return [w for w in out if w]


def _ref_bpe(texts: list[str], merges: int):
    words = Counter()
    for t in texts:
        for w in _ref_tokens(t):
            if re.fullmatch("[a-z]+", w) and len(w) <= BPE_MAX_WORD_LEN:
                words[w] += 1
    syms = {w: list(w) for w in words}
    rules = []
    for _ in range(merges):
        pairs = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append(best)
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    vocab = Counter()
    for w, s in syms.items():
        for sym in s:
            vocab[sym] += words[w]
    return rules, dict(vocab)


_TEXTS = [
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest",
    "the quick brown fox; the lazy dog.",
    "aaaa aaaa ab (Mixed123 SKIPPED) aaaa",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_pure_python_reference(spark):
    rules, vocab = bpe_train(_docs(spark), merges=4)
    ref_rules, ref_vocab = _ref_bpe(_TEXTS, merges=4)
    assert rules == ref_rules
    got = {r["symbol"]: r["total_cnt"] for r in vocab.collect()}
    assert got == ref_vocab


def test_bpe_greedy_chain_semantics(spark):
    # "aaaa" under an (a, a) merge must become [aa, aa] — greedy
    # left-to-right, merged symbols not re-merged within a pass.
    docs = spark.createDataFrame([(0, "aaaa aaaa ab")], "doc_id long, text string")
    rules, vocab = bpe_train(docs, merges=1)
    assert rules == [("a", "a")]
    got = {r["symbol"]: r["total_cnt"] for r in vocab.collect()}
    assert got == {"aa": 4, "a": 1, "b": 1}


def test_bpe_zero_merges_is_char_counts(spark):
    docs = spark.createDataFrame([(0, "ab ba")], "doc_id long, text string")
    rules, vocab = bpe_train(docs, merges=0)
    assert rules == []
    got = {r["symbol"]: r["total_cnt"] for r in vocab.collect()}
    assert got == {"a": 2, "b": 2}
    with pytest.raises(ValueError):
        bpe_train(docs, merges=-1)


def test_bpe_encode_applies_rules_in_order(spark):
    docs = spark.createDataFrame(
        [(0, "lowest"), (1, "low")], "doc_id long, text string"
    )
    out = bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()
    by_id = {r["doc_id"]: r["bpe_syms"] for r in out}
    assert by_id[0] == [["low", "e", "s", "t"]]
    assert by_id[1] == [["low"]]


def test_bpe_encode_vocab_consistency(spark):
    # encoding the training corpus with the learned rules reproduces
    # exactly the trained vocabulary counts
    docs = _docs(spark)
    rules, vocab = bpe_train(docs, merges=3)
    enc = (
        bpe_encode(docs, rules)
        .select(F.explode("bpe_syms").alias("w"))
        .select(F.explode("w").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["symbol"]: r["n"] for r in enc.collect()}
    want = {r["symbol"]: r["total_cnt"] for r in vocab.collect()}
    assert got == want


_word = st.text(alphabet="ab", min_size=1, max_size=6)


@given(st.lists(_word, min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_bpe_property_matches_reference(spark, words):
    # tiny two-letter alphabet maximizes merge-chain collisions (the
    # hard case: overlapping aa/ab/ba pairs and repeated merges)
    text = " ".join(words)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rules, vocab = bpe_train(docs, merges=3)
    ref_rules, ref_vocab = _ref_bpe([text], merges=3)
    assert rules == ref_rules
    assert {r["symbol"]: r["total_cnt"] for r in vocab.collect()} == ref_vocab
