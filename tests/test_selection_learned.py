"""Unit/property tests for the learned-selection operators:
leakage-safe split (group-aware train/test assignment), the trained
hashed NB-style classifier, and DSIR-shaped importance resampling —
planted inputs with hand-checkable invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_tritonsort_spark.operators.sampling import (
    importance_resample,
    leakage_safe_split,
)
from themis_tritonsort_spark.operators.textstats import nb_token_classifier

SPLITS = [("train", 0.9), ("validation", 0.05), ("test", 0.05)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_safe_split_pairs_share_split(spark):
    # components {1,2,3} (chained pairs) and {7,8}; 5 and 9 singletons.
    docs = _docs(
        spark, [(i, f"doc {i}") for i in (1, 2, 3, 5, 7, 8, 9)]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs, "doc_id", SPLITS).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 7
    # every near-dup component lands whole in ONE split, anchored to
    # its min member id
    for comp in ((1, 2, 3), (7, 8)):
        anchors = {by_id[i].group_id for i in comp}
        splits = {by_id[i].split for i in comp}
        assert anchors == {comp[0]}
        assert len(splits) == 1
    # singletons anchor to themselves
    assert by_id[5].group_id == 5
    assert by_id[9].group_id == 9


def test_leakage_safe_split_matches_plain_split_on_anchor(spark):
    # the group split must be exactly split_assign of the anchor id
    from themis_tritonsort_spark.operators.sampling import split_assign

    docs = _docs(spark, [(i, "x") for i in range(40)])
    pairs = spark.createDataFrame(
        [(i, i + 20) for i in range(20)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: r.split
        for r in leakage_safe_split(docs, pairs, "doc_id", SPLITS).collect()
    }
    anchor = {
        r.group_id: r.split
        for r in split_assign(
            spark.createDataFrame(
                [(i,) for i in range(20)], "group_id long"
            ),
            "group_id",
            SPLITS,
        ).collect()
    }
    for i in range(20):
        assert out[i] == anchor[i]
        assert out[i + 20] == anchor[i]


def test_nb_classifier_separates_planted_vocabulary(spark):
    # class-true docs speak only "aaa bbb", class-false only "ccc ddd";
    # a held-out mixture scores by which vocabulary dominates.
    rows = [(i, "aaa bbb aaa bbb", True) for i in range(10)]
    rows += [(i + 10, "ccc ddd ccc ddd", False) for i in range(10)]
    rows += [(100, "aaa aaa aaa ddd", True), (101, "ccc ccc ccc bbb", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = {
        r.doc_id: r
        for r in nb_token_classifier(df, "doc_id", "text", "y").collect()
    }
    assert out[0].pred_label and out[0].score_micro > 0
    assert not out[10].pred_label and out[10].score_micro < 0
    # majority vocabulary wins on the mixed docs
    assert out[100].pred_label
    assert not out[101].pred_label
    assert out[100].n_tokens == 4


def test_nb_classifier_empty_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "aaa", True), (2, "", False)], "doc_id long, text string, y boolean"
    )
    out = nb_token_classifier(df, "doc_id", "text", "y").collect()
    assert [r.doc_id for r in out] == [1]


def test_importance_resample_prefers_target_vocabulary(spark):
    # target docs speak "tgt"; raw-only docs speak "raw".  A fixed
    # budget admits the target-flavored docs first.
    rows = [(i, "tgt tgt tgt tgt", True) for i in range(5)]
    rows += [(i + 5, "raw raw raw raw", False) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = importance_resample(
        df, "doc_id", "text", "t", budget_tokens=12
    ).collect()
    kept = sorted(r.doc_id for r in out)
    # 12-token budget at 4 tokens/doc -> exactly the 3 highest-score
    # docs, all from the target-vocabulary side (ties break by id)
    assert kept == [0, 1, 2]
    scores = {r.doc_id: r.score_micro for r in out}
    assert all(s > 0 for s in scores.values())


def test_importance_resample_budget_invariant(spark):
    rows = [(i, " ".join(["w%d" % (i % 7)] * (1 + i % 5)), i % 3 == 0)
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    budget = 40
    out = importance_resample(df, "doc_id", "text", "t", budget_tokens=budget)
    rows_out = sorted(out.collect(), key=lambda r: r.cum_tokens)
    # every kept doc started strictly under budget; cum is a correct
    # running total in (score desc, id) order
    run = 0
    last_key = None
    for r in rows_out:
        assert r.cum_tokens - r.n_tokens < budget
        run += r.n_tokens
        assert r.cum_tokens == run
        key = (-r.score_micro, r.doc_id)
        assert last_key is None or key > last_key
        last_key = key
