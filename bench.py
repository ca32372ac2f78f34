#!/usr/bin/env python
"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect overhead).  The dedup benchmarks use 3-gram shingles
(the scale-realistic setting; the sf0.01 correctness variants use
unigrams because the synthetic vocabulary is tiny).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from themis_tritonsort_spark import queries as q
from themis_tritonsort_spark.data import table
from themis_tritonsort_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_band_buckets,
)
from themis_tritonsort_spark.session import get_spark


def _jaccard3(spark, sf):
    # Production near-dup setting: trigram shingles, t=0.8, exact
    # prefix-filtered candidate generation.
    docs = table(spark, sf, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.8)


def _lsh_neardup_wide(spark, sf):
    # Scale config: 64-plane signature, 8 bands of 8 bits — candidate
    # set stays ~linear on near-orthogonal corpora (collision 2^-8 per
    # band) while true near-dups (cos>=0.9) keep ~0.94 recall.
    from themis_tritonsort_spark.operators.similarity import hyperplane_lsh_neardup

    emb = table(spark, sf, "embeddings")
    return hyperplane_lsh_neardup(
        emb, "vec_id", "embedding", threshold=0.4, dim=64, n_planes=64, bands=8
    )


def _minhash3(spark, sf):
    docs = table(spark, sf, "documents")
    buckets = minhash_band_buckets(docs, "doc_id", "text", n=3, num_hashes=16, bands=4)
    return lsh_candidate_pairs(buckets)


def _dedup_clusters3(spark, sf):
    # Scale setting for q46: trigram shingles (the unigram variant the
    # sf0.01 oracle uses makes every doc collide on the tiny synthetic
    # vocabulary — a worst case the components loop then has to chew
    # through; production near-dup clustering runs on n-gram LSH).
    from themis_tritonsort_spark.operators.components import dedup_clusters

    docs = table(spark, sf, "documents")
    buckets = minhash_band_buckets(docs, "doc_id", "text", n=3, num_hashes=16, bands=4)
    pairs = lsh_candidate_pairs(buckets)
    return dedup_clusters(pairs, id_a="doc_a", id_b="doc_b")


BENCH_QUERIES = {
    "q01_sort_events": q.q01_sort_events,
    "q03_wordcount": q.q03_wordcount,
    "q04_ngrams": q.q04_ngrams,
    "q05_inverted_index": q.q05_inverted_index,
    "q06_sessionize": q.q06_sessionize,
    "q07_pagerank": q.q07_pagerank,
    "q09_kmeans_assign": q.q09_kmeans_assign,
    "q12_merge_sorted": q.q12_merge_sorted,
    "q14_pricing_summary": q.q14_pricing_summary,
    "q15_revenue_by_nation": q.q15_revenue_by_nation,
    "q18_jaccard3": _jaccard3,
    "q19_minhash3": _minhash3,
    "q20_ann_topk": q.q20_ann_topk,
    "q21_text_quality": q.q21_text_quality,
    "q24_window_funcs": q.q24_window_funcs,
    "q26_distinct_agg": q.q26_distinct_agg,
    "q28_json_extract": q.q28_json_extract,
    "q36_asof_join": q.q36_asof_join,
    "q37_range_join": q.q37_range_join,
    "q39_lsh_neardup": _lsh_neardup_wide,
    "q41_token_counts": q.q41_token_counts,
    "q42_value_quantiles": q.q42_value_quantiles,
    "q43_corpus_pipeline": q.q43_corpus_pipeline,
    "q49_stratified_sample": q.q49_stratified_sample,
    "q51_chunk_documents": q.q51_chunk_documents,
    "q52_small_qty_revenue": q.q52_small_qty_revenue,
    "q53_order_count_distribution": q.q53_order_count_distribution,
    "q54_yearly_cohorts": q.q54_yearly_cohorts,
    "q55_returnflag_pivot": q.q55_returnflag_pivot,
    "q56_rolling_hour": q.q56_rolling_hour,
    "q57_cube_revenue": q.q57_cube_revenue,
    "q58_repetition_stats": q.q58_repetition_stats,
    "q59_decontaminate": q.q59_decontaminate,
    "q62_pii_scrub": q.q62_pii_scrub,
    "q65_dedup_spans": q.q65_dedup_spans,
    "q63_tfidf_topk": q.q63_tfidf_topk,
    "q64_unigram_surprisal": q.q64_unigram_surprisal,
    "q67_gap_fill": q.q67_gap_fill,
    "q68_triangle_counts": q.q68_triangle_counts,
    "q69_funnel": q.q69_funnel,
    "q70_cooccurrence_pmi": q.q70_cooccurrence_pmi,
    "q71_retention": q.q71_retention,
    "q72_cheapest_supplier": q.q72_cheapest_supplier,
    "q73_pack_sequences": q.q73_pack_sequences,
    "q74_triangle_total": q.q74_triangle_total,
    "q75_surprisal_mix": q.q75_surprisal_mix,
    "q76_shuffle_shards": q.q76_shuffle_shards,
    "q77_full_curation": q.q77_full_curation,
    "q78_media_decode": q.q78_media_decode,
    "q79_semdedup": q.q79_semdedup,
    "q80_bigram_perplexity": q.q80_bigram_perplexity,
    "q81_sq8_ann": q.q81_sq8_ann,
    "q82_bloom_decontam": q.q82_bloom_decontam,
    "q83_token_budget": q.q83_token_budget,
    "q84_pq_ann": q.q84_pq_ann,
    "q85_pq_rerank": q.q85_pq_rerank,
    "q86_kcore": q.q86_kcore,
    "q87_length_batches": q.q87_length_batches,
    "q88_cdc_snapshot": q.q88_cdc_snapshot,
    "q89_scd2_history": q.q89_scd2_history,
    "q90_hll_distinct": q.q90_hll_distinct,
    "q91_cms_heavy_hitters": q.q91_cms_heavy_hitters,
    "q92_zscore_outliers": q.q92_zscore_outliers,
    "q93_label_propagation": q.q93_label_propagation,
    "q94_weighted_sample": q.q94_weighted_sample,
    "q95_volume_shipping": q.q95_volume_shipping,
    "q96_product_profit": q.q96_product_profit,
    "q97_important_parts": q.q97_important_parts,
    "q98_supplier_variety": q.q98_supplier_variety,
    "q99_large_orders": q.q99_large_orders,
    "q100_bracket_revenue": q.q100_bracket_revenue,
    "q101_excess_suppliers": q.q101_excess_suppliers,
    "q102_waiting_suppliers": q.q102_waiting_suppliers,
    "q103_bfs_hops": q.q103_bfs_hops,
    "q104_hashed_classifier": q.q104_hashed_classifier,
    "q105_concurrency": q.q105_concurrency,
    "q106_bpe_train": q.q106_bpe_train,
    "q107_bm25_retrieval": q.q107_bm25_retrieval,
    "q108_profile_events": q.q108_profile_events,
    "q109_fuzzy_supplier_match": q.q109_fuzzy_supplier_match,
    "q110_attribution": q.q110_attribution,
    "q111_bm25_multi": q.q111_bm25_multi,
    "q112_clustering_coeff": q.q112_clustering_coeff,
    "q113_ewma": q.q113_ewma,
    "q114_markov_transitions": q.q114_markov_transitions,
    "q115_filtered_revenue": q.q115_filtered_revenue,
    "q116_priority_by_class": q.q116_priority_by_class,
    "q117_promo_share": q.q117_promo_share,
    "q118_top_supplier": q.q118_top_supplier,
    "q119_histogram_quantiles": q.q119_histogram_quantiles,
    "q120_lineno_gaps": q.q120_lineno_gaps,
    "q121_orphan_audit": q.q121_orphan_audit,
    "q122_event_paths": q.q122_event_paths,
    "q123_segment_mode": q.q123_segment_mode,
    "q124_spend_deciles": q.q124_spend_deciles,
    "q125_video_frames": q.q125_video_frames,
    "q125b_mjpeg_frames": q.q125b_mjpeg_frames,
    "q78b_audio_decode": q.q78b_audio_decode,
    # round-5 fill: the remaining catalog entries, so the bench set IS
    # the catalog (q18/q19/q39 keep their scale-variant stand-ins
    # above — trigram shingles / 64-plane LSH, the 100 TB settings).
    "q02_sort_lineitem": q.q02_sort_lineitem,
    "q08_link_extract": q.q08_link_extract,
    "q10_global_agg": q.q10_global_agg,
    "q10b_length_histogram": q.q10b_length_histogram,
    "q11_duplicate_keys": q.q11_duplicate_keys,
    "q13_grep": q.q13_grep,
    "q16_top_customers": q.q16_top_customers,
    "q17_exact_dedup": q.q17_exact_dedup,
    "q22_lang_id": q.q22_lang_id,
    "q23_fingerprint": q.q23_fingerprint,
    "q25_customers_without_orders": q.q25_customers_without_orders,
    "q27_parts_shipped_by_brand": q.q27_parts_shipped_by_brand,
    "q29_kmeans_full": q.q29_kmeans_full,
    "q30_simhash": q.q30_simhash,
    "q31_ivf_ann": q.q31_ivf_ann,
    "q32_above_avg_parts": q.q32_above_avg_parts,
    "q33_late_ship_orders": q.q33_late_ship_orders,
    "q34_region_share": q.q34_region_share,
    "q35_rollup_revenue": q.q35_rollup_revenue,
    "q38_cosine_neardup": q.q38_cosine_neardup,
    "q40_nation_market": q.q40_nation_market,
    "q44_salted_count": q.q44_salted_count,
    "q45_time_rollup": q.q45_time_rollup,
    "q46_dedup_clusters3": _dedup_clusters3,
    "q47_gap_sessions": q.q47_gap_sessions,
    "q48_shipping_priority": q.q48_shipping_priority,
    "q50_mixture_sample": q.q50_mixture_sample,
    "q60_encode_tokens": q.q60_encode_tokens,
    "q61_train_split": q.q61_train_split,
    "q66_blocklist_filter": q.q66_blocklist_filter,
    "q126_local_supplier_volume": q.q126_local_supplier_volume,
    "q127_market_share": q.q127_market_share,
    "q128_returned_items": q.q128_returned_items,
    "q129_sales_opportunity": q.q129_sales_opportunity,
    "q130_variant_json": q.q130_variant_json,
    "q131_k_anonymity": q.q131_k_anonymity,
    "q132_hard_negatives": q.q132_hard_negatives,
    "q133_kcenter_sample": q.q133_kcenter_sample,
    "q134_keep_best": q.q134_keep_best,
    "q135_incremental_neardup": q.q135_incremental_neardup,
    "q136_leakage_safe_split": q.q136_leakage_safe_split,
    "q137_trained_classifier": q.q137_trained_classifier,
    "q138_importance_resample": q.q138_importance_resample,
    "q139_dup_substrings": q.q139_dup_substrings,
    "q140_substring_scrub": q.q140_substring_scrub,
    "q141_margin_pairs": q.q141_margin_pairs,
    "q142_ann_margin_pairs": q.q142_ann_margin_pairs,
    "q143_approx_triangles": q.q143_approx_triangles,
    "q144_chain_components": q.q144_chain_components,
    "q145_budget_stream_replay": q.q145_budget_stream_replay,
}


# The headline scale-factor dir lives in ONE place (ADVICE r07: it was
# previously duplicated into the sf-guard below, so a drift of the
# headline SF would silently classify every run as non-headline and
# the bare BENCH_FULL.json would go permanently stale).  Override with
# SPARK_GRAFT_HEADLINE_SF if the headline ever moves.
HEADLINE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_HEADLINE_SF", "/root/testdata/sf0.1"
)

# A sample whose load1 exceeds this multiple of the cpu count provably
# overlapped a co-tenant: local[32] alone holds load1 around 1.0x cpus
# (BASELINE.md's contention forensics, r10).  Shared by bench.py's
# capture warning and tools/bench_diff.py's flag annotation.
CONTENDED_X = 1.25


# Host co-tenant contention is often INVISIBLE to in-VM load1 (the
# r09/r10 episodes: vmstat 99-100% idle, loadavg ~5, queries 2-13x
# slow — BASELINE.md).  CPU steal time is the direct signal the
# hypervisor does expose: jiffies this VM was runnable but the host
# ran someone else.  A sample whose steal share exceeds this percent
# of its wall x cpus provably ran contended.
STEAL_PCT_X = 5.0


def _steal_jiffies() -> int | None:
    """Cumulative steal jiffies from /proc/stat (None off-Linux)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return None


def ledger_eligible(only: str, sf_dir: str) -> bool:
    """Only headline-SF partial captures enter BENCH_PARTIALS.jsonl
    (ADVICE r10): the ledger is what adjudications anchor on, and a
    smoke-scale (sf0.001) partial mixed in would let a calm-window
    re-measure silently cite smoke timings as headline evidence."""
    return bool(only) and os.path.realpath(sf_dir) == os.path.realpath(
        HEADLINE_SF_DIR
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", HEADLINE_SF_DIR)
    spark = get_spark(app_name="themis-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen AND the Python worker pool before timing
    # (the first Arrow UDF otherwise pays worker spin-up, which is
    # session overhead, not query cost).
    table(spark, sf_dir, "lineitem").count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warm the shuffle/sort machinery too (exchange + external sorter
    # codegen paths), on synthetic data — not on any bench query.
    spark.range(100_000).repartitionByRange(8, "id").sortWithinPartitions(
        "id"
    ).write.format("noop").mode("overwrite").save()

    # Median of 3 samples per query: this box shows +-20% run-to-run
    # variance (BASELINE.md), so a single sample makes rounds
    # incomparable.  Samples interleave full passes over the query set
    # (run 1 of everything, then run 2, ...) so one transient system
    # stall skews one pass, not all three samples of one query.
    samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    # Targeted re-measure knob (VERDICT r07 #3): a comma-separated
    # subset re-times just those queries (e.g. median-of-5 noise
    # adjudication) and writes BENCH_FULL_partial.json — a subset run
    # must never pose as the round's full-catalog perf evidence.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    bench_queries = BENCH_QUERIES
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in BENCH_QUERIES]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY: unknown {unknown}")
        bench_queries = {n: BENCH_QUERIES[n] for n in names}
    runs: dict[str, list[float]] = {name: [] for name in bench_queries}
    loads: dict[str, list[float]] = {name: [] for name in bench_queries}
    steals: dict[str, list[float]] = {name: [] for name in bench_queries}
    hz = os.sysconf("SC_CLK_TCK") or 100
    cpus = os.cpu_count() or 1
    for _ in range(samples):
        # Queries that persist intermediates (q63, q77) would otherwise
        # hit their own cache from the previous pass and time the cache
        # read, not the query.
        spark.catalog.clearCache()
        for name, fn in bench_queries.items():
            st0 = _steal_jiffies()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            runs[name].append(round(dt, 3))
            # Host contention evidence, per sample (VERDICT r10 #3):
            # load1 right after the sample reflects the preceding
            # minute incl. any in-VM co-tenant; CPU steal during the
            # sample is the hypervisor-level signal the r09/r10
            # episodes showed load1 CANNOT see.  Steal is recorded as
            # percent of the sample's wall x cpus.
            loads[name].append(round(os.getloadavg()[0], 2))
            st1 = _steal_jiffies()
            if st0 is not None and st1 is not None and dt > 0:
                steals[name].append(
                    round(100.0 * (st1 - st0) / (dt * hz * cpus), 2)
                )

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(median(ts), 3) for name, ts in runs.items()}
    full, compact, suffix, warnings = emit_payloads(
        timings, runs, samples, sf_dir, only, loads=loads, steals=steals
    )
    for w in warnings:
        print(w, file=sys.stderr)
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_FULL{suffix}.json",
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    if ledger_eligible(only, sf_dir):
        # Partial captures are adjudication evidence (median-of-5 noise
        # re-measures), and BENCH_FULL_partial.json is overwritten by
        # every subsequent subset run — append each capture to a dated
        # JSONL ledger too, so the evidence trail survives the next
        # re-measure instead of living only in prose (VERDICT r09 #7).
        # Headline-SF runs only (ADVICE r10): smoke-scale partials in
        # the same ledger would let adjudications silently anchor on
        # sf0.001 timings.
        ledger = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_PARTIALS.jsonl",
        )
        with open(ledger, "a") as f:
            f.write(json.dumps(
                {"ts": time.strftime("%Y-%m-%dT%H:%M:%S%z"), **full},
                sort_keys=True,
            ))
            f.write("\n")
    print(json.dumps(compact))


def emit_payloads(
    timings: dict[str, float],
    runs: dict[str, list[float]],
    samples: int,
    sf_dir: str,
    only: str,
    loads: dict[str, list[float]] | None = None,
    steals: dict[str, list[float]] | None = None,
) -> tuple[dict, dict, str, list[str]]:
    """Build the BENCH_FULL payload, the compact stdout line, the
    BENCH_FULL filename suffix, and any warning lines.  Pure — unit
    tests pin the evidence contract without a Spark run.

    Full per-query medians + min/max spread go to an in-repo file —
    the driver's stdout capture keeps only a ~2000-char tail, which a
    142-entry map outgrew in r03 (BENCH_r03..r05 all have
    parsed: null).  The printed line stays compact (total + slowest
    10) so the driver can parse it again.

    A subset run (SPARK_GRAFT_BENCH_ONLY) must never pose as
    full-catalog evidence: its metric NAME changes, not just a side
    field, so any parser keyed on "headline_queries_wall_clock" can
    only ever ingest a full-catalog total (ADVICE r08).

    Only the HEADLINE scale factor may own the bare BENCH_FULL.json:
    the verify recipe runs an sf0.001 smoke right after the sf0.1
    pass, and an unconditional overwrite would let a later
    `cp BENCH_FULL.json BENCH_FULL_r{N}.json` snapshot smoke numbers
    as the round's perf evidence.  Non-headline runs write a suffixed
    file (e.g. BENCH_FULL_sf0.001.json) instead.  realpath on both
    sides: a relative path, symlink, or doubled slash spelling of the
    headline dir must still count as headline, or a genuine sf0.1 run
    writes the suffixed file and the stale previous BENCH_FULL.json
    gets snapshotted as this round's evidence — the exact failure
    this logic exists to prevent."""
    total = round(sum(timings.values()), 3)
    metric = "partial_queries_wall_clock" if only else (
        "headline_queries_wall_clock"
    )
    full = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "partial": bool(only),
        "queries": timings,
        "samples": samples,
        "spread": {name: [min(ts), max(ts)] for name, ts in runs.items()},
        "sf": sf_dir,
    }
    if loads is not None:
        # Per-sample load1 + CPU-steal%, parallel to spread: the
        # contention evidence that r10's adjudications reconstructed by
        # hand.  A sample counts as contended when load1 > CONTENDED_X
        # x cpus (in-VM co-tenant; local[32] alone saturates ~1.0x) OR
        # steal > STEAL_PCT_X % of its wall x cpus (host co-tenant —
        # the r09/r10 signature load1 cannot see).  bench_diff
        # annotates its flags from these fields.
        cpus = os.cpu_count() or 1
        full["load"] = loads
        full["cpus"] = cpus
        if steals:
            full["steal_pct"] = steals
        full["contended_samples"] = sum(
            1 for ts in loads.values() for x in ts if x > CONTENDED_X * cpus
        ) + sum(
            1
            for ts in (steals or {}).values()
            for x in ts
            if x > STEAL_PCT_X
        )
    headline = os.path.realpath(HEADLINE_SF_DIR)
    suffix = "" if os.path.realpath(sf_dir) == headline else (
        "_sf" + os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    )
    if only:
        suffix = "_partial" + suffix
    warnings = []
    if suffix:
        # Name the actual reason(s): a partial run at the headline SF
        # is not a "non-headline" run (ADVICE r08).
        reasons = []
        if only:
            reasons.append(f"partial run (SPARK_GRAFT_BENCH_ONLY={only})")
        if os.path.realpath(sf_dir) != headline:
            reasons.append(
                f"non-headline SF ({sf_dir} != {HEADLINE_SF_DIR})"
            )
        warnings.append(
            f"WARNING: {'; '.join(reasons)}; "
            f"writing BENCH_FULL{suffix}.json — the bare BENCH_FULL.json "
            "is untouched"
        )
    if full.get("contended_samples"):
        warnings.append(
            f"WARNING: contended capture: {full['contended_samples']} "
            f"query-sample(s) saw load1 > {CONTENDED_X}x cpus or CPU "
            f"steal > {STEAL_PCT_X}% — see the 'load'/'steal_pct' fields"
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "partial": bool(only),
        "n_queries": len(timings),
        "samples": samples,
        "queries": slowest,
        "full": f"BENCH_FULL{suffix}.json",
        "sf": sf_dir,
    }
    return full, compact, suffix, warnings


if __name__ == "__main__":
    main()
