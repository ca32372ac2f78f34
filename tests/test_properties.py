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


# ------------------------------------------------------------- chunking
def reference_chunks(toks: list[str], chunk: int, overlap: int) -> list[list[str]]:
    """Straight-line port of the chunking contract: starts at
    1 + i*step up to max(n - overlap, 1)."""
    if not toks:
        return []
    step = chunk - overlap
    n = len(toks)
    last_start = max(n - overlap, 1)
    out = []
    s = 1
    while s <= last_start:
        out.append(toks[s - 1 : s - 1 + chunk])
        s += step
    return out


@given(
    n_tokens=st.integers(min_value=0, max_value=200),
    chunk=st.integers(min_value=2, max_value=50),
    overlap_frac=st.floats(min_value=0.0, max_value=0.99),
)
@settings(max_examples=60, deadline=None)
def test_chunk_contract_covers_all_tokens_in_order(n_tokens, chunk, overlap_frac):
    overlap = min(int(chunk * overlap_frac), chunk - 1)
    toks = [f"w{i}" for i in range(n_tokens)]
    chunks = reference_chunks(toks, chunk, overlap)
    if not toks:
        assert chunks == []
        return
    # full in-order coverage: stitching chunks (dropping each overlap)
    # reconstructs the document exactly
    step = chunk - overlap
    stitched = list(chunks[0])
    for c in chunks[1:]:
        stitched.extend(c[overlap:])
    assert stitched == toks
    # every chunk except possibly the last is full-size; none is a
    # subset of its predecessor
    for c in chunks[:-1]:
        assert len(c) == min(chunk, len(toks))
    assert len(chunks[-1]) > overlap or len(toks) <= overlap
    # starts advance by exactly step
    for i, c in enumerate(chunks):
        assert c[0] == toks[i * step]


def test_chunk_documents_matches_reference_contract(spark):
    import random

    from pyspark.sql import functions as F

    from themis_tritonsort_spark.operators.textstats import chunk_documents

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"t{rng.randrange(100)}x{j}" for j in range(rng.randrange(0, 90))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, "doc_id", "text", chunk_tokens=16, overlap=4).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"].split()))
    for doc_id, text in docs:
        expected = reference_chunks(text.split(), 16, 4)
        have = [c for _, c in sorted(got.get(doc_id, []))]
        assert have == expected, doc_id


# ------------------------------------------------------------- as-of join
def test_asof_join_matches_naive_python(spark):
    import random

    from themis_tritonsort_spark.operators.temporal import asof_join

    rng = random.Random(11)
    left = [(rng.randrange(6), rng.randrange(50), i) for i in range(300)]
    # right side unique per (k, rts): with duplicates the winner among
    # equal timestamps is engine-order-dependent in ANY as-of engine
    # (q36 dedups the same way before joining)
    uniq: dict[tuple[int, int], int | None] = {}
    for i in range(120):
        uniq[(rng.randrange(6), rng.randrange(50))] = (
            1000 + i if rng.random() > 0.2 else None
        )
    right = [(k, rts, p) for (k, rts), p in uniq.items()]
    ldf = spark.createDataFrame(left, "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, payload long")
    got = {
        (r["k"], r["ts"], r["lid"]): (r["asof_ts"], r["payload"])
        for r in asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="rts", right_cols=["payload"]
        ).collect()
    }
    assert len(got) == len(left)
    # naive: latest right row with rts <= ts; ties on rts -> the row
    # that sorts last among equals (running last() semantics)
    by_key: dict[int, list[tuple[int, int | None]]] = {}
    for k, rts, payload in right:
        by_key.setdefault(k, []).append((rts, payload))
    for k in by_key:
        by_key[k].sort(key=lambda t: t[0])
    for k, ts, lid in left:
        matches = [t for t in by_key.get(k, []) if t[0] <= ts]
        want = matches[-1] if matches else (None, None)
        assert got[(k, ts, lid)] == want, (k, ts, lid)


@given(
    st.lists(st.integers(0, 255), min_size=6, max_size=6),
    st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_error_bound_on_blockwise_constant(grays, subsample):
    """Analytic JPEG bound: an image that is CONSTANT per 16x16 tile
    has (near-)zero AC energy in every 8x8 block of every component,
    so the only loss is DC quantization (luma table 16, chroma 17 —
    at most ~half a quant step per coefficient, ~2 gray levels
    spatially) plus color-transform rounding.  The decoder must land
    within that bound for every subsampling mode — a real bit-level
    contract, not a looks-about-right check."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    tiles = np.array(grays, dtype=np.uint8).reshape(2, 3)
    gray = np.kron(tiles, np.ones((16, 16), np.uint8))  # 32x48
    img = np.repeat(gray[:, :, None], 3, axis=2)  # gray in RGB space
    arr = decode_jpeg(encode_jpeg(img, subsample=subsample))
    assert arr is not None and arr.shape == img.shape
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 6


def test_histogram_sketch_brackets_exact_percentiles(spark):
    """Random-data bracket contract: for every group and percentile,
    the sketch's upper bound must (a) be >= the exact percentile_disc
    value and (b) overshoot it by at most one bin width (or saturate
    at the overflow cap) — the whole point of a deterministic binned
    sketch.  Deterministic multi-seed sweep instead of @given: one
    Spark job per seed batch keeps JVM round-trips sane."""
    import random

    from pyspark.sql import functions as F

    from themis_tritonsort_spark.operators.sketches import (
        histogram_quantiles,
    )

    bin_w, n_bins = 16, 32
    cap = bin_w * n_bins
    rows = []
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(1, 400)
        dist = rng.choice(["uniform", "clumped", "overflow"])
        for _ in range(n):
            if dist == "uniform":
                v = rng.randint(0, cap - 1)
            elif dist == "clumped":
                v = rng.choice([3, 3, 3, 100, 101, 499])
            else:
                v = rng.randint(0, 2 * cap)  # exercises saturation
            rows.append((f"g{seed}", v))
    df = spark.createDataFrame(rows, "g string, v long")
    sketch = {
        r["g"]: r
        for r in histogram_quantiles(
            df, ["g"], "v", bin_w, n_bins, percents=[50, 95, 99]
        ).collect()
    }
    exact = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({p / 100}) WITHIN GROUP (ORDER BY v)"
                ).alias(f"p{p}")
                for p in (50, 95, 99)
            ]
        )
        .collect()
    }
    assert set(sketch) == set(exact)
    for g, row in sketch.items():
        for p in (50, 95, 99):
            ub, ex = row[f"p{p}_ub"], exact[g][f"p{p}"]
            assert ub >= min(ex, cap), (g, p, ub, ex)
            if ex < cap:
                assert ub - ex <= bin_w, (g, p, ub, ex)
            else:
                assert ub == cap  # saturation value
