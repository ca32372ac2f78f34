"""ExactSubstr sliding-window dedup (operators/dedup.
duplicate_substring_spans / scrub_duplicate_substrings).

Constructed fixtures pin the semantics the DuckDB oracle can't isolate:
boundary-straddling duplicates (the case fixed-block dedup_spans
misses by design), within-document repetition, adjacency merging, and
sub-window documents.
"""

from __future__ import annotations

from themis_tritonsort_spark.operators.dedup import (
    duplicate_substring_spans,
    scrub_duplicate_substrings,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(k, start=0):
    return " ".join(f"t{i}" for i in range(start, start + k))


def test_cross_doc_span_offsets(spark):
    """Two docs share an 8-token run at different offsets; each doc
    reports ONE merged span at its own token positions."""
    shared = _toks(8, 100)
    a = _toks(3, 0) + " " + shared + " " + _toks(3, 50)  # run at [3, 11)
    b = shared + " " + _toks(6, 200)  # run at [0, 8)
    out = duplicate_substring_spans(
        _docs(spark, [(1, a), (2, b)]), "doc_id", "text", window_tokens=4
    )
    spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out.collect()}
    assert spans == {1: (3, 11), 2: (0, 8)}


def test_straddling_dup_missed_by_blocks_is_caught(spark):
    """A duplicate run straddling a fixed-block boundary: block dedup
    with span_tokens=4 sees four distinct chunks, the sliding window
    still flags it."""
    shared = _toks(6, 100)
    # run occupies positions [2, 8) in doc 1 and [4, 10) in doc 2 —
    # different 4-token block alignments in each doc
    a = _toks(2, 0) + " " + shared + " " + _toks(4, 50)
    b = _toks(4, 60) + " " + shared + " " + _toks(2, 70)
    out = duplicate_substring_spans(
        _docs(spark, [(1, a), (2, b)]), "doc_id", "text", window_tokens=4
    )
    spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out.collect()}
    assert spans == {1: (2, 8), 2: (4, 10)}


def test_within_doc_repetition_counts(spark):
    """A doc repeating its own 4-token phrase is self-duplicated: both
    occurrences are flagged even with no other document involved."""
    phrase = _toks(4, 100)
    text = phrase + " " + _toks(5, 0) + " " + phrase
    out = duplicate_substring_spans(
        _docs(spark, [(1, text)]), "doc_id", "text", window_tokens=4
    ).collect()
    got = sorted((r["span_start"], r["span_end"]) for r in out)
    assert got == [(0, 4), (9, 13)]


def test_overlapping_windows_merge_to_one_span(spark):
    """A shared 10-token run yields 7 overlapping 4-token dup windows
    that must merge into ONE span, n_windows preserved."""
    shared = _toks(10, 100)
    out = duplicate_substring_spans(
        _docs(spark, [(1, shared), (2, shared)]),
        "doc_id",
        "text",
        window_tokens=4,
    ).collect()
    assert len(out) == 2
    for r in out:
        assert (r["span_start"], r["span_end"], r["n_windows"]) == (0, 10, 7)


def test_short_docs_produce_no_rows(spark):
    out = duplicate_substring_spans(
        _docs(spark, [(1, "a b c"), (2, "a b c")]),
        "doc_id",
        "text",
        window_tokens=4,
    )
    assert out.count() == 0


def test_scrub_removes_spans_and_keeps_clean_docs(spark):
    shared = _toks(8, 100)
    a = _toks(3, 0) + " " + shared + " " + _toks(3, 50)
    b = shared + " " + _toks(6, 200)
    c = _toks(5, 300)  # unique, untouched
    out = scrub_duplicate_substrings(
        _docs(spark, [(1, a), (2, b), (3, c)]),
        "doc_id",
        "text",
        window_tokens=4,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 14 and rows[1]["n_removed"] == 8
    assert rows[1]["clean_text"] == _toks(3, 0) + " " + _toks(3, 50)
    assert rows[2]["n_removed"] == 8
    assert rows[2]["clean_text"] == _toks(6, 200)
    assert rows[3]["n_removed"] == 0 and rows[3]["clean_text"] == _toks(5, 300)


def test_fully_duplicated_doc_scrubs_to_empty(spark):
    text = _toks(6, 100)
    out = scrub_duplicate_substrings(
        _docs(spark, [(1, text), (2, text)]),
        "doc_id",
        "text",
        window_tokens=4,
    )
    for r in out.collect():
        assert r["n_removed"] == 6 and r["clean_text"] == ""
