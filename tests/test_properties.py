"""Property-based tests (hypothesis): operator implementations vs
straight-line Python ports of the reference semantics.

The Spark side is exercised once per case batch (collected examples run
through one DataFrame) to keep JVM round-trips sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from themis_tritonsort_spark.operators.sessionize import sessionize_pdf

# ---------------------------------------------------------------- tokenizer
# Straight port of WordTokenizer.cc:27-69 (the C++ scanner).
STOP = set(' ".,/()?;')


def reference_tokenize(s: str) -> list[str]:
    words = []
    start = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        stop = c in STOP or (i < n - 1 and c == "\\" and s[i + 1] == "n")
        if stop:
            if start == i:
                start += 1
            else:
                words.append(s[start:i])
                start = i + 1
        i += 1
    if start < n:
        words.append(s[start:])
    return words


# The sentinel formulation both the Spark plan and the DuckDB oracle
# use: replace the "\n" pair with <SENTINEL>n, split on sentinel+stops.
SENTINEL = "\x01"
SPLIT_RE = re.compile(f'[{SENTINEL} ".,/()?;]')


def engine_tokenize(s: str) -> list[str]:
    replaced = re.sub(r"\\n", SENTINEL + "n", s)
    return [w for w in SPLIT_RE.split(replaced) if w != ""]


@given(
    st.text(
        alphabet=st.sampled_from(list('abcXYZ0"., /()?;\\n')),
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_engine_tokenizer_matches_reference_scanner(s):
    """The sentinel formulation must equal the reference C++ scanner on
    arbitrary input — including the subtle case where only the
    backslash of a '\\n' pair is consumed and the n prefixes the next
    word (this test originally caught a naive two-char-split regex
    diverging there)."""
    assert engine_tokenize(s) == reference_tokenize(s)


# ------------------------------------------------------------ sessionization
def reference_sessions(clicks: list[tuple[int, str]], threshold: int):
    """Straight port of ClickLogSessionSummarizerReduceFunction.cc:20-64."""
    out = []
    anchor = None  # (ts, url)
    for ts, url in clicks:
        if anchor is None:
            anchor = (ts, url)
        if ts - anchor[0] >= threshold:
            out.append((anchor[0], ts, anchor[1], url))
            anchor = None
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=300, deadline=None)
def test_sessionize_pdf_matches_reference(gaps, threshold):
    import pandas as pd

    ts = []
    t = 0
    for g in gaps:
        t += g
        ts.append(t)
    clicks = [(t, f"u{i}") for i, t in enumerate(ts)]
    pdf = pd.DataFrame(
        {"u": [1] * len(clicks), "ts": [c[0] for c in clicks],
         "url": [c[1] for c in clicks]}
    )
    got = [
        (r["first_ts"], r["last_ts"], r["first_url"], r["last_url"])
        for _, r in sessionize_pdf(pdf, "ts", "url", threshold, ["u"]).iterrows()
    ]
    assert got == reference_sessions(clicks, threshold)


def test_jaccard_prefix_filter_is_exact(spark):
    """ppjoin prefix filtering is an EXACT optimization: with and
    without it, the qualifying pair set must be identical (random docs,
    seeded)."""
    import random

    from themis_tritonsort_spark.operators.dedup import jaccard_pairs

    rnd = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rnd.choices(vocab, k=rnd.randrange(3, 15))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=1, min_jaccard=0.5)
    with_filter = {
        (r["doc_a"], r["doc_b"], r["inter_size"], r["union_size"])
        for r in jaccard_pairs(docs, "doc_id", "text", prefix_filter=True, **kw).collect()
    }
    without = {
        (r["doc_a"], r["doc_b"], r["inter_size"], r["union_size"])
        for r in jaccard_pairs(docs, "doc_id", "text", prefix_filter=False, **kw).collect()
    }
    assert with_filter == without
    assert len(without) > 0
