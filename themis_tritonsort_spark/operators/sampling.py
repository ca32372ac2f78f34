"""Deterministic corpus sampling — the selection half of a training-data
pipeline (beyond-reference; reference analog: the seeded samplers behind
``RdRandFormatReader`` and the Ratio inflate/sample functions,
``functions/map/RatioMapFunction.cc``).

Training mixes are specified as "at most k documents per stratum" and
"sample stratum g at rate r_g".  Both are implemented HASH-deterministic
(md5 of the row id), not pseudo-random:

  * reruns and retried tasks pick the SAME rows (Spark's ``sample()`` is
    seed-stable only per-partitioning; a shuffle upstream changes it),
  * the selection is reproducible by any engine (the DuckDB oracle
    computes the identical md5), and
  * no coordination: rate sampling is a stateless per-row predicate —
    at 100 TB it runs map-side, touches each row once, and shuffles
    nothing.

``stratified_topk_sample`` needs one shuffle on the stratum key (the
same shuffle any per-group top-k pays).  Strata are low-cardinality
(language, domain, source); for a hot stratum the row_number window
sorts that stratum on one executor — acceptable for selection caps,
or pre-thin with ``hash_rate_sample`` first so the window sees only
~k·fudge rows per stratum.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-hex prefix of 15 nibbles = 60 bits, the same oracle-reproducible
# integer family as operators.dedup (minhash / simhash).
_HASH_MOD = 1_000_000


def _row_hash(id_col: str):
    """Uniform deterministic bucket in [0, 1e6) from the row id."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % _HASH_MOD
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic global shuffle + sharding — the export step that
    randomizes training-example order and splits the corpus into
    ``n_shards`` output shards: (id, shard, pos) with
    ``shard = md5_hash(id) % n_shards`` and ``pos`` the 1-based rank
    within the shard by (hash, id).  Reading shards 0..n-1 in pos
    order replays one fixed pseudo-random permutation of the corpus —
    reproducible across engines and reruns (the md5 discipline of this
    module, not an RNG).

    Scale: one hash shuffle keyed on shard + per-shard sort — the
    window partitions by shard, so parallelism equals ``n_shards``;
    pick shard counts like the 1000s of output files a 100 TB export
    writes anyway, never single digits.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    # full 60-bit md5-prefix hash (NOT the [0,1e6) bucket of _row_hash:
    # shard ordering needs the whole hash for a uniform permutation)
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.select(F.col(id_col), h.alias("__h"))
        .withColumn("shard", (F.col("__h") % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def stratified_topk_sample(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Keep at most ``k`` rows per stratum, chosen by md5(id) order —
    a uniform, deterministic, engine-reproducible per-group sample.

    Ties broken by the id itself so the result is total-order stable.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame, id_col: str, splits: list[tuple[str, float]]
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of the named
    fractions (e.g. ``[("train", .9), ("validation", .05),
    ("test", .05)]``) by md5-bucket of the row id.

    Deterministic and engine-reproducible like ``hash_rate_sample``:
    the same row lands in the same split on every rerun, at every
    scale factor, and under any partitioning.  Fractions must sum to 1
    (±1e-9); the last split absorbs the rounding remainder so every
    row is assigned.  Purely map-side: no shuffle, no state.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if any(f < 0 for _, f in splits):
        raise ValueError("split fractions must be non-negative")
    bucket = _row_hash(id_col)
    expr = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cond = bucket < F.lit(int(round(acc * _HASH_MOD)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_rate_sample(
    df: DataFrame,
    id_col: str,
    rate: float | None = None,
    rates: Mapping[str, float] | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Keep each row iff md5-bucket(id) < rate·1e6 — a deterministic
    Bernoulli sample.  With ``rates`` + ``group_col``, each stratum gets
    its own rate (the training-mixture weighting: {"en": 1.0,
    "code": 0.5, ...}; strata absent from the map are dropped).

    Purely map-side: no shuffle, no state, each row decided from its
    own bytes.
    """
    bucket = _row_hash(id_col)
    if rates is not None:
        if group_col is None:
            raise ValueError("rates requires group_col")
        if not rates:
            raise ValueError("rates must be non-empty")
        thresh = None
        for g, r in sorted(rates.items()):
            if not 0.0 <= r <= 1.0:
                raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
            cond, val = F.col(group_col) == g, F.lit(int(r * _HASH_MOD))
            thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
        # no otherwise: unmatched strata compare NULL -> dropped
        return df.where(bucket < thresh)
    if rate is None:
        raise ValueError("pass rate= or rates=")
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(bucket < F.lit(int(rate * _HASH_MOD)))


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    max_weight: int = 64,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of exactly
    ``k`` rows: each row draws priority = max of ``weight`` independent
    md5-uniforms and the top-k priorities win.  The max of w iid
    uniforms has the u^(1/w) distribution, so this IS the
    Efraimidis-Spirakis A-Res scheme — but expressed entirely in
    integer hashes (no pow/log floats), which keeps the selection
    bit-reproducible by any engine, rerun, and partitioning.  Integer
    weights only (bucket real-valued weights first); ``max_weight``
    bounds the per-row hash count so one mis-weighted row can't become
    a compute hot spot.

    Returns (id, weight, priority) for the k winners.

    Scale: priorities are pure map-side expressions; the top-k compiles
    to TakeOrderedAndProject (partial top-k per partition, merge of
    k-row heaps) — no global sort, no shuffle of the corpus.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive, got {max_weight}")
    w = F.least(
        F.greatest(F.col(weight_col).cast("long"), F.lit(1)),
        F.lit(max_weight),
    )
    draw = F.transform(
        F.sequence(F.lit(1), w),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(id_col).cast("string"), i.cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    return (
        df.select(
            F.col(id_col),
            w.alias("weight"),
            F.array_max(draw).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Downsample each group (source/domain/language) to a token
    budget: walk the group's docs in the deterministic pseudo-random
    (md5-hash, id) order and keep docs while the tokens consumed SO FAR
    are under ``budget_tokens`` — the mixture-balancing step that turns
    per-source weights into hard token counts (the last kept doc may
    overflow the budget; nothing after it is admitted).

    Returns kept rows only: (group, id, n_tokens, cum_tokens) with
    cum_tokens the inclusive running total within the group.

    Scale: the running total is the distributed prefix-sum form
    (operators/sort.py: with_global_prefix_sum) over the total order
    (group, hash, id) — one range shuffle, NO per-group window, so a
    single giant group (one domain = half the corpus) still spreads
    over many partitions.  Per-group start offsets fall out of a tiny
    groupBy-min (the exclusive prefix at a group's first row is the
    group's minimum of cum - n) joined back by group key.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from .sort import with_global_prefix_sum

    staged = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[^ ]+"), 0)
        ).cast("long").alias("n_tokens"),
        _row_hash(id_col).alias("__h"),
    )
    summed = with_global_prefix_sum(
        staged, ["group", "__h", id_col], "n_tokens", out_col="__cum"
    )
    starts = summed.groupBy("group").agg(
        F.min(F.col("__cum") - F.col("n_tokens")).alias("__group_start")
    )
    scoped = summed.join(F.broadcast(starts), "group").withColumn(
        "cum_tokens", (F.col("__cum") - F.col("__group_start")).cast("long")
    )
    return (
        scoped.where(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
        .select("group", id_col, "n_tokens", "cum_tokens")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Train/validation/test split that cannot leak near-duplicates
    across the boundary: near-dup ``pairs`` (e.g. MinHash-LSH
    candidates) are grouped into connected components, every document
    is anchored to its component's minimum member id (``group_id``;
    singletons anchor to themselves), and the split is assigned by
    md5-bucket OF THE GROUP — so two near-identical documents always
    land in the same split.  Per-doc hash splits (``split_assign``)
    famously leak eval data at LLM scale; this is the group-aware fix.

    Returns (id, group_id, split) for every row of ``df``.

    Scale: the component loop touches only the pair graph (near-dup
    pairs are a small fraction of the corpus); the anchor join is a
    left join of the corpus against the component table keyed on the
    doc id — one shuffle — and the split itself is the stateless
    map-side bucket predicate of ``split_assign``.
    """
    from .components import dedup_clusters

    comp = dedup_clusters(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    )
    anchored = (
        df.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("vid"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("canonical_id"), F.col(id_col))
            .cast("long")
            .alias("group_id"),
        )
    )
    return split_assign(anchored, "group_id", splits)


def importance_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    budget_tokens: int,
    buckets: int = 512,
) -> DataFrame:
    """Data-selection-by-importance (DSIR-shaped: Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    rank the raw corpus by how much each document's hashed-unigram
    profile resembles a small TARGET distribution (rows where
    ``target_col`` is true), then admit documents in importance order
    until a token budget is spent.

    Importance is integer fixed-point end to end (the module's
    engine-reproducibility discipline — DSIR's log-ratio is replaced
    by the smoothed count ratio itself, monotone in the same
    quantity): per bucket

        r(b) = ((n_target(b)+1) * 1e6) div (n_raw(b)+buckets)

    and per document score_micro = (sum of its tokens' r) div
    n_tokens — the mean target-affinity of its tokens.  Returns kept
    rows only: (id, score_micro, n_tokens, cum_tokens), walking docs
    in (score desc, id) order while the tokens consumed BEFORE a doc
    are under ``budget_tokens`` (the last kept doc may overflow).

    Scale: bucket stats are one map-side-partial aggregate to
    ``buckets`` rows; the ratio table broadcasts; the budget walk is
    the distributed prefix sum of ``token_budget_sample`` (range
    shuffle + partition offsets) — no global window, no driver
    collect of anything corpus-sized.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from .sort import with_global_prefix_sum

    scored = importance_scores(df, id_col, text_col, target_col, buckets)
    summed = with_global_prefix_sum(
        scored, ["__neg", id_col], "n_tokens", out_col="cum_tokens"
    )
    return summed.where(
        F.col("cum_tokens") - F.col("n_tokens") < budget_tokens
    ).select(
        id_col, "score_micro", "n_tokens", F.col("cum_tokens").cast("long")
    )


def importance_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    buckets: int = 512,
) -> DataFrame:
    """The tokenize-and-score stage of ``importance_resample``,
    factored out so the two cost terms — this O(total tokens)
    aggregate vs the prefix-sum budget walk — can be measured
    independently (VERDICT r07 #4: the combined operator probed
    alpha 1.22 at 64x, and the decomposition names which term grows).
    Returns (id, score_micro, n_tokens, __neg), persisted — see the
    in-body comment for why the cache is load-bearing."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    from ..functions.text import tokens

    scale = 1_000_000
    bucket = (
        F.conv(F.substring(F.md5(F.col("__word")), 1, 15), 16, 10).cast("long")
        % buckets
    )
    tb = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("__t"),
        F.explode(tokens(F.col(text_col))).alias("__word"),
    ).select(F.col(id_col), "__t", bucket.alias("__b"))
    from pyspark import StorageLevel

    # Collapse the token stream to per-(doc, bucket) counts FIRST and
    # persist THAT (r11, guide §2.3 "aggregate before you shuffle" +
    # §5): the bucket-ratio aggregate and the per-doc score are both
    # exact integer sums over these counts, so the tokenize + md5 +
    # base-conv pipeline — the operator's dominant cost — runs ONCE
    # instead of once per consumer.  Cardinality is bounded by
    # min(n_tokens, buckets) rows per doc, far below the token stream,
    # and map-side partial aggregation collapses each doc's tokens
    # before the exchange (a doc's exploded tokens stay in its scan
    # partition).
    tbc = (
        tb.groupBy(id_col, "__t", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ratio = tbc.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__nt"),
        F.sum("__c").alias("__nr"),
    ).select(
        "__b",
        F.expr(f"((__nt + 1) * {scale}) div (__nr + {buckets})").alias("__r"),
    )
    # persisted: the range partitioner's sampling pass AND the range
    # shuffle both read the per-doc scores — without the cache the
    # join+aggregate lineage runs twice (measured alpha 1.3 at 64x;
    # ~1 with the cache).  Four long columns per doc, tiny next to
    # the corpus.
    scored = (
        tbc.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__r") * F.col("__c")).alias("__rsum"),
            F.sum("__c").cast("long").alias("n_tokens"),
        )
        .select(
            F.col(id_col),
            F.expr("__rsum div n_tokens").cast("long").alias("score_micro"),
            "n_tokens",
        )
        .withColumn("__neg", -F.col("score_micro"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return scored
