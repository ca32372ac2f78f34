"""Deduplication operators for large-scale corpus curation.

Beyond-reference components (the reference's closest primitive is
CountDuplicateKeysReduceFunction — exact duplicate keys,
``functions/reduce/CountDuplicateKeysReduceFunction.cc:77-99``); the
near-dup family is standard corpus-dedup practice re-expressed as
DataFrame plans:

  exact        — group by content hash, pick canonical representative.
  jaccard      — exact n-gram Jaccard via a shared-shingle self-join
                 (pairs with jaccard >= t MUST share a shingle, so the
                 join prunes without losing candidates).
  minhash/LSH  — banded min-hash signatures; candidate pairs = docs
                 colliding in any band bucket.  Hash = md5 (string min),
                 chosen because the DuckDB oracle computes the identical
                 digest — lexicographic min over uniformly distributed
                 hex digests is a valid min-hash.
  simhash      — 64-bit sign-sum fingerprint over token hashes.

Scale notes: every operator is shuffle-on-key only; the shingle join's
worst case is a hot shingle shared by many docs — cap posting-list
length (drop shingles with document frequency > max_df) exactly like
production near-dup pipelines drop ubiquitous shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, content_hash, canonical_id, group_size): one row per doc that
    belongs to a duplicate group (group_size > 1); canonical = min id."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return (
        h.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .where(F.col("group_size") > 1)
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct word-n-gram shingles per doc."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard duplicate pairs via shared-shingle join.

    Returns (doc_a, doc_b, inter_size, union_size) with doc_a < doc_b
    and inter/union >= min_jaccard.  Integer outputs only (hash-stable).

    ``max_df`` drops shingles appearing in more than max_df docs before
    the self-join — the skew guard that keeps the join linear-ish at
    corpus scale (a ubiquitous shingle otherwise makes a quadratic
    bucket).  NOTE: pruning ubiquitous shingles changes inter/union
    counts, so leave it None when oracle-matching exactness is required.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")

    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("union_size", (F.col("sz_a") + F.col("sz_b") - F.col("inter_size")).cast("long"))
        .where(F.col("inter_size") >= F.lit(min_jaccard) * F.col("union_size"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter_size").cast("long").alias("inter_size"),
            "union_size",
        )
    )
    return out


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc, h, mh): per-doc min-hash component for h in [0, num_hashes).

    hash_h(shingle) = md5(h || '|' || shingle); the component is the
    lexicographic MIN digest — uniform over hex strings, so collision
    probability per component ≈ Jaccard similarity (standard MinHash
    guarantee).  md5 is used (not xxhash64) so the DuckDB oracle can
    compute the identical digest.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    hs = F.broadcast(
        df.sparkSession.range(num_hashes).select(F.col("id").alias("h"))
    )
    return (
        sh.crossJoin(hs)
        .select(
            "doc",
            "h",
            F.md5(F.concat_ws("|", F.col("h").cast("string"), F.col("shingle"))).alias("d"),
        )
        .groupBy("doc", "h")
        .agg(F.min("d").alias("mh"))
    )


def lsh_band_buckets(
    sig: DataFrame, bands: int, num_hashes: int
) -> DataFrame:
    """Fold signature components into band buckets: (doc, band, band_sig)."""
    rows_per_band = num_hashes // bands
    # Zero-pad h so the lexicographic array_sort equals numeric h order
    # (collect_list order is nondeterministic; the sort restores it).
    elem = F.concat_ws(":", F.lpad(F.col("h").cast("string"), 2, "0"), F.col("mh"))
    return (
        sig.withColumn("band", F.floor(F.col("h") / rows_per_band).cast("long"))
        .groupBy("doc", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(elem)))).alias("band_sig"))
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing any band bucket."""
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over tokens: bit b of the fingerprint is 1 iff the
    sum over tokens of sign(bit b of xxhash64(token)) is positive.

    JVM-side: explode tokens -> xxhash64 -> per-bit +/-1 sums via a
    64-element aggregate.  Returns (doc, simhash long).
    """
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("w")
    ).withColumn("hh", F.xxhash64("w"))
    bit_sums = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hh"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("doc", sig.alias("simhash"))
