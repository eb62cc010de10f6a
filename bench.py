"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines: first the full
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"sf": ...} map (also written to bench_full.json), then a compact FINAL
line (same metric/value/unit/sf, the slowest queries, cross-round subset
total) guaranteed to fit the driver's 2000-char stdout tail capture —
round 4's full map on the final line overflowed it and produced
BENCH_r04.json parsed:null.

Each query is forced end-to-end with a noop-format write (full compute,
no driver-side collect). BASELINE.md records the first-run numbers; later
rounds must stay within 2×.
"""

from __future__ import annotations

import json
import os
import re
import time

from options_data_pipeline_spark.session import get_spark
from options_data_pipeline_spark import registry

# ngram_jaccard deliberately excluded: exact all-pairs verification on the
# synthetic corpus (tiny vocab → ~all pairs are candidates) is inherently
# quadratic; minhash_lsh is the benched scale path for near-dup.
# containment_near_dup + containment_recall_audit excluded for the same
# reason (the one-sided prefix filter cannot bound the superset side);
# containment_winnowed is the benched scale path for containment.
# dedup_clusters (re-admitted): the star-contraction loop still runs
# EAGERLY at query construction, so the timer starts BEFORE construction
# for every query — lazy queries charge ~ms there, iterative ones their
# real cost.
HEADLINE = [
    "dedup_clusters",
    "ohlc_5m",
    "ohlc_true_range",
    "atr_wilder",
    "gap_fill",
    "dedup_delta",
    "value_percentiles",
    "tick_sessions",
    "props_json_stats",
    "pricing_summary",
    "revenue_by_nation",
    "top_parts_per_brand",
    "orders_cube",
    "doc_quality",
    "exact_dedup",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "cosine_topk_ivf",
    "embedding_near_dup",
    "asof_close",
    "range_join_sessions",
    "rp_lsh_near_dup",
    "simhash_near_pairs",
    "winnow_overlap",
    "ivf_multiprobe_topk",
    "salted_ohlc_5m",
    "shipping_priority",
    "quantize_int8",
    "rare_token_stats",
    "dataset_splits",
    "ohlc_sliding",
    "dup_ngram_stats",
    "gopher_quality",
    "pq_quantize",
    "decontamination",
    "chunk_documents",
    "pack_sequences",
    "pq_adc_topk",
    "vocab_topk",
    "stratified_sample",
    "tfidf_top_terms",
    "ohlc_resample_1h",
    "donchian_channels",
    "sma_20",
    # round-4 additions: the indexed ADC search (min-of-2 makes the
    # recorded number the warm, search-only cost — run 1 builds the
    # write-once index) and the learned-quantizer multiprobe
    "pq_adc_topk_indexed",
    "ivf_kmeans_multiprobe",
    "dedup_canonical",
    "source_overlap_matrix",
    "minhash_jaccard_estimate",
    "local_supplier_volume",
    "large_order_quantities",
    "ivf_kmeans_multiprobe_indexed",
    # round-4 TPC-H breadth (the shapes the reduced schema supports)
    "forecast_revenue",
    "promo_revenue",
    "volume_shipping",
    "market_share",
    "top_supplier",
    "dormant_high_balance",
    # round-4 LLM-pipeline additions
    "knn_join",
    "ann_recall_report",
    "length_buckets",
    "pii_scrub_stats",
    "domain_quality_filter",
    "temperature_mixture",
    "span_dedup",
    "vwap_5m",
    "bollinger_20",
    "customer_order_distribution",
    "priority_order_check",
    "ema_12",
    "rsi_14",
    "budget_sample",
    "event_funnel",
    # incremental-dedup index: min-of-2 makes the recorded number the
    # warm probe-only cost (run 1 builds the write-once signature index)
    "lsh_index_build",
    "minhash_lsh_incremental",
    "unigram_logprob",
    "semdedup_prune",
    "small_quantity_revenue",
    "oov_rate",
    "pq_learned_quantize",
    "bpe_merge_token_count",
    "simhash_wide_pairs",
    # continued-session additions: Q21/Q19/Q9 shapes + contrastive mining,
    # cluster audit, CCNet perplexity terciles
    "waiting_supplier",
    "discounted_band_revenue",
    "profit_by_nation_year",
    "hard_negatives",
    "cluster_prototypes",
    "ccnet_buckets",
    "retention_cohorts",
    "max_drawdown",
    "dsir_weights",
    "corpus_curation",
    "embedding_drift",
    "macd_12_26_9",
    "kcenter_coreset",
    "media_features",
    "data_expectations",
    "salted_join_enrichment",
    "scd2_intervals",
    # round-5 additions (lsh_incremental_recall excluded: its exact
    # ground-truth arm is the declared verify-only audit, like
    # ngram_jaccard)
    "stochastic_14",
    "obv",
    "token_entropy",
    "cooccurrence_pmi",
    "keltner_channels",
    "heikin_ashi",
    "zipf_slope",
    "adx_14",
    "ivf_cell_balance",
    "mrl_truncation_audit",
    "asof_nearest_close",
    "filter_agreement",
    "event_type_pivot",
    "ohlc_unpivot",
    "close_rank_analytics",
    # eager CC at construction, like dedup_clusters — timer spans it
    "vector_curation",
    "session_symbol_setops",
    "item_cooccurrence",
    "user_path_transitions",
    "rfm_segments",
    "weighted_sample",
    "symbol_return_correlation",
    "event_rate_anomaly",
    "monthly_revenue_growth",
    "parse_row_ids",
    "min_cost_supplier",
    "repetition_char_stats",
    "bloom_prefilter_stats",
    "zorder_span_audit",
    "key_skew_report",
    "quality_linear_score",
    "image_phash_near_dup",
    "audio_fp_near_dup",
    "item_pagerank",
    "video_frame_near_dup",
    "hll_distinct_sketch",
    # round-6 cont.: remaining TPC-H shapes + sketch/graph additions
    "shipmode_priority",
    "important_part_value",
    "supplier_part_variety",
    "excess_shipper",
    "cms_heavy_hitters",
    "part_triangle_counts",
    "part_kcore",
    "histogram_quantile_sketch",
    "cdc_apply",
    "kmv_overlap_estimate",
    "pareto_frontier",
    "attribution_last_touch",
    "snapshot_diff",
    "fk_integrity_audit",
    "bitmap_distinct_rollup",
    "sequence_gap_audit",
    "watermark_lateness_audit",
    "dau_wau_mau",
    "name_edit_near_dup",
    "conversion_lag_stats",
    "event_session_window",
    "orders_grouping_sets",
    "part_communities_lpa",
    "inverted_index_build",
    "bm25_rank",
    "user_first_paths",
    "holt_forecast",
    # round-7 additions
    "approx_sketch_stats",
    "approx_sketch_stats_builtin",
    "copurchase_basket_audit",
    "pagerank_dangling",
    "benford_audit",
    "surrogate_keys",
    "bigram_logprob",
    # eager power iteration at construction (timer spans it, like
    # dedup_clusters)
    "embedding_top_pc",
    "table_profile",
    "compaction_bins",
    "seasonal_hour_anomaly",
    "adamic_adar_links",
    "bootstrap_mean_ci",
    "mmr_diversified_topk",
    "association_rules",
    "k_anonymity_audit",
    "ab_test_zscore",
    "containment_winnowed",
    "join_skew_audit",
    "chi2_drift",
    "embedding_int8_quantize",
    "weighted_bernoulli_sample",
    "part_entity_resolution",
    "mad_outlier_audit",
    "feature_correlations",
    "discount_elasticity",
    "split_leakage_audit",
    "hll_segment_rollup",
    "knn_label_noise",
    "tv_distance_matrix",
    "half_life_engagement",
    "wilson_ctr_bands",
    "winsorized_stats",
    "abc_classification",
    "neyman_stratified_sample",
    # round-8 additions (quality_train_score trains EAGERLY at
    # construction — timer spans the 32 GD jobs, like dedup_clusters)
    "quality_train_score",
    "ivf_recluster_audit",
    "entity_blocking_audit",
    "quality_holdout_eval",
    "content_chunk_dedup",
    "backoff_heldout_logprob",
    "url_canonical_dedup",  # r8 query, first benched r9
    # round-9 additions (verdict/seed/retrain run EAGERLY at
    # construction — timer spans the three driver-coordinated jobs)
    "ivf_recluster_repair",
    "substring_cut_list",
    # mirror-descent runs EAGERLY at construction (timer spans the
    # 8+2 driver-coordinated jobs, like quality_train_score)
    "doremi_mixture_weights",
    "substring_dedup_apply",
    "doremi_mixture_sample",
    # min-of-2 makes the recorded number the warm probe-only cost
    # (run 1 builds the write-once gram index)
    "substring_cut_list_incremental",
    "hybrid_rrf_retrieval",
    "decontamination_cut_list",
    # round 10 (min-of-2: run 1 pays the write-once index builds for
    # the *_indexed rows; skew_robust pays its per-run gram
    # materialization by design — the self-contained form)
    "substring_cut_list_skew_robust",
    "decontamination_cut_list_indexed",
    "bm25_rank_indexed",
    "hybrid_rrf_retrieval_indexed",
    "decontamination_apply",
    "dedup_clusters_incremental",
    "dedup_canonical_incremental",
    "dedup_cluster_stats",
    # round 11 (min-of-2: run 1 pays the write-once bucketed-table store
    # for the bucketed_* rows — later sessions re-register metadata-only)
    "bucketed_order_revenue",
    "bucketed_orderkey_lookup",
    "near_dup_threshold_sweep",
    # min-of-2: run 1 pays the write-once full-corpus signature index
    "near_dup_threshold_sweep_indexed",
    "unimax_mixture",
    # min-of-2: run 1 pays the write-once base build + the one delta
    # ingest (replays append 0); run 2 records the merge-on-read serve
    "bucketed_base_delta_revenue",
    # eager CC at construction, like dedup_clusters — timer spans it
    "cluster_aware_splits",
    "ks_drift_sources",
    # round 12: skew-robust band joins (heavy_bucket pinned low so the
    # blocked arm runs on real buckets; expected ≈ plain + the size
    # pre-pass — the escape is for adversarial corpora, not a speedup)
    "minhash_lsh_skew_robust",
    "simhash_skew_robust",
    # round 12: the observability report (A7 at pipeline grain) — one
    # hash-agg over an events-derived metrics-shaped frame
    "pipeline_stage_latency",
    # round 12: the ingest drift gate's live routing code (KS vs stored
    # reference at value-grid grain)
    "drift_gate_routing",
]


# Common subsets with earlier rounds' baselines, so the final compact line
# can carry cross-round ratios even though the full per-query map no longer
# fits in the driver's 2000-char tail capture (BENCH_r04.json parsed:null).
R1_SUBSET = [
    "ohlc_5m", "ohlc_true_range", "atr_wilder", "gap_fill", "dedup_delta",
    "value_percentiles", "tick_sessions", "props_json_stats",
    "pricing_summary", "revenue_by_nation", "top_parts_per_brand",
    "orders_cube", "doc_quality", "exact_dedup", "minhash_lsh", "simhash",
    "cosine_topk", "cosine_topk_ivf", "embedding_near_dup",
]


# Bench-signal hygiene (round 7, widened round 8): the full suite is 200+
# queries and grows every round, so suite-total drift detection drowns in
# suite growth. This PINNED subset is the stable cross-round signal — the
# r1 subset (19) plus the top-cost representative of EVERY family with a
# >1 s member (graph, connected-components, ANN, wide-simhash, CDC, IR,
# and since round 8 the previously-unpinned LSH/winnow/stats families
# whose r6→r7 drift was unbounded). Per-query budgets are 1.6× the last
# recorded times (floor 0.5 s; part_entity_resolution re-based on its
# round-8 two-tier rebuild) — a query over budget is a real regression,
# not suite growth. BASELINE.md §bench documents the set.
PINNED_BUDGETS = {
    # r10: the legacy sub-second pins (1.6× lucky 0.3-0.6 s recordings)
    # flapped twice in one session by 12-24 ms of suite noise
    # (ohlc_true_range 0.682 vs 0.67, dedup_delta 0.884 vs 0.86, while
    # solo warm floors were 0.60 and 0.55) — the exact cdc_apply lesson.
    # Round 9 already floors NEW sub-second pins at 0.9 on creation;
    # the same floor now applies to the legacy r1-subset pins. Pins
    # ≥0.9 are untouched: sub-second noise is ±0.1 s on this machine,
    # and a real regression on these queries (2-10× their floor) still
    # trips the line.
    "ohlc_5m": 0.9, "ohlc_true_range": 0.97, "atr_wilder": 0.92,
    "gap_fill": 0.95, "dedup_delta": 0.9, "value_percentiles": 0.9,
    "tick_sessions": 0.9, "props_json_stats": 0.9, "pricing_summary": 1.4,
    "revenue_by_nation": 0.9, "top_parts_per_brand": 0.9,
    "orders_cube": 0.9, "doc_quality": 0.9, "exact_dedup": 1.09,
    "minhash_lsh": 1.94, "simhash": 2.08, "cosine_topk": 0.93,
    "cosine_topk_ivf": 0.9, "embedding_near_dup": 0.9,
    "part_triangle_counts": 11.49, "dedup_clusters": 8.12,
    "ivf_kmeans_multiprobe": 5.53, "simhash_wide_pairs": 5.83,
    # re-based r8: solo warm floor 0.56-0.97 s — the old 0.64 line (1.6x
    # a lucky 0.4 s recording) flapped on sub-second noise; 1.6 x 0.56
    "cdc_apply": 0.90, "bm25_rank": 3.36,
    # round-8 additions (1.6× the BENCH_r07 recordings)
    "part_entity_resolution": 5.5,   # re-based: two-tier warm 3.4 s
    "dedup_canonical": 8.05,
    "approx_sketch_stats_builtin": 7.26,
    "vector_curation": 6.69,
    "bootstrap_mean_ci": 6.35,
    "embedding_top_pc": 5.95,
    "feature_correlations": 5.87,
    "semdedup_prune": 5.12,
    "part_kcore": 4.66,
    "containment_winnowed": 4.34,
    "part_communities_lpa": 4.30,
    "rp_lsh_near_dup": 4.08,
    "winnow_overlap": 3.84,
    "simhash_near_pairs": 3.50,
    # round-9 additions: the round-8 queries (1.6× their BENCH_r08
    # recordings; sub-second recordings floored at 0.9 — the cdc_apply
    # lesson) plus the two unpinned r7→r8 drifters, so the #1/#2 suite
    # costs and the drift outliers are all drift-bounded
    "quality_holdout_eval": 12.4,
    "quality_train_score": 10.7,
    "backoff_heldout_logprob": 4.25,
    "content_chunk_dedup": 3.45,
    "bloom_prefilter_stats": 3.26,
    "embedding_drift": 2.54,
    "ivf_recluster_audit": 1.46,
    "entity_blocking_audit": 0.9,
    "url_canonical_dedup": 2.95,  # first recording r9: solo warm 1.85 s
    "ivf_recluster_repair": 3.95,  # first recording r9: solo warm 2.45 s
    "substring_cut_list": 2.45,  # first recording r9: solo warm 1.52 s
    "doremi_mixture_weights": 5.4,  # first recording r9: solo warm 3.36 s
    "substring_dedup_apply": 3.45,  # first recording r9: solo warm 2.14 s
    "doremi_mixture_sample": 7.8,  # first recording r9: solo warm 4.88 s
    "substring_cut_list_incremental": 3.0,  # first recording r9: warm probe 1.86 s
    "hybrid_rrf_retrieval": 4.0,  # first recording r9: solo warm 2.50 s
    "decontamination_cut_list": 2.05,  # first recording r9: solo warm 1.26 s
    # round-10 additions, pinned on creation (1.6× first solo warm)
    "substring_cut_list_skew_robust": 3.96,  # r10: solo warm 2.48 s
    "decontamination_cut_list_indexed": 1.8,  # r10: solo warm 1.12 s
    "bm25_rank_indexed": 2.0,  # r10: solo warm 1.27 s
    "hybrid_rrf_retrieval_indexed": 2.75,  # r10: solo warm 1.71 s
    "decontamination_apply": 2.8,  # r10: solo warm 1.75 s
    "dedup_clusters_incremental": 6.9,  # r10: solo warm 4.30 s
    # re-based r11 (VERDICT r10 item 3): the r10 pins (23.9 / 22.0) were
    # 1.6× CACHE-PRESSURE-INFLATED end-of-suite recordings (14.9 s at
    # position 220-of-220 vs a 3.2-3.8 s solo floor) and would have
    # admitted a 5× real regression. bench.py now clears cache/checkpoint
    # state between queries (_clear_state), so in-suite ≈ solo; pins are
    # 1.6× the clean in-suite numbers (r10 committed bench_full: 3.66 /
    # 4.11 s; r11 solo medians 3.27 / 3.41 s).
    "dedup_canonical_incremental": 5.9,
    "dedup_cluster_stats": 6.6,
    # round-11 additions, pinned on creation (1.6× solo warm median,
    # sub-second recordings floored at 0.9 — the cdc_apply lesson)
    "bucketed_order_revenue": 1.75,  # r11: solo warm median 1.09 s
    "bucketed_orderkey_lookup": 0.9,  # r11: solo warm median 0.52 s
    "near_dup_threshold_sweep": 2.8,  # r11: solo warm median 1.74 s
    "near_dup_threshold_sweep_indexed": 2.0,  # r11: solo warm median 1.23 s
    "unimax_mixture": 1.4,  # r11: solo warm median 0.86 s
    "bucketed_base_delta_revenue": 3.45,  # r11: solo warm median 2.14 s
    "cluster_aware_splits": 10.3,  # r11: solo warm median 6.45 s (eager CC)
    "ks_drift_sources": 2.55,  # r11: solo warm median 1.60 s
    # round-12 additions, pinned on creation (1.6× solo warm median,
    # sub-second floored at 0.9)
    "pipeline_stage_latency": 0.9,  # r12: solo warm median 0.54 s
    "drift_gate_routing": 2.35,  # r12: solo warm median 1.46 s
    "minhash_lsh_skew_robust": 3.3,  # r12: solo warm median 2.05 s
    "simhash_skew_robust": 4.85,  # r12: solo warm median 3.03 s
}


def _effective_cores(n_workers: int) -> float:
    """Steal probe (VERDICT r12 item 1): measure how many cores this host
    ACTUALLY delivers right now, so a contaminated run is distinguishable
    from a regression (r12: the driver's local[32] bench ran on ~8
    effective cores and 14/15 queries looked regressed). One 0.5-s serial
    md5 spin for the single-core rate, then an n_workers-way parallel spin
    for 1.5 s; effective cores = parallel aggregate rate / serial rate.
    Runs BEFORE the SparkSession exists so it measures the host, not the
    JVM. ~2 s total; emitted in both JSON lines."""
    import hashlib
    from multiprocessing import Pool

    def _spin(seconds: float) -> float:
        h = hashlib.md5()
        chunk = b"\x5a" * 4096
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < seconds:
            h.update(chunk)
            n += 1
        return n / (time.perf_counter() - t0)

    serial = _spin(0.5)
    try:
        with Pool(n_workers) as pool:
            rates = pool.map(_parallel_spin, [1.5] * n_workers)
    except OSError:
        return 1.0
    return round(sum(rates) / serial, 1)


def _parallel_spin(seconds: float) -> float:
    """Worker body for _effective_cores (module-level so Pool can pickle)."""
    import hashlib

    h = hashlib.md5()
    chunk = b"\x5a" * 4096
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        h.update(chunk)
        n += 1
    return n / (time.perf_counter() - t0)


def _bw_spin(seconds: float = 1.0, mb: int = 256) -> float:
    """GB/s of sequential reads over a DRAM-resident array (numpy sum).
    Worker body for _mem_bw_gbps (module-level so Pool can pickle)."""
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.perf_counter()
    n = 0
    s = 0.0
    while time.perf_counter() - t0 < seconds:
        s += float(a.sum())
        n += 1
    return n * mb / 1024.0 / (time.perf_counter() - t0)


def _mem_bw_gbps(n_workers: int = 8) -> float:
    """Aggregate memory read bandwidth (GB/s, 8-way). The r13 companion
    to _effective_cores: a contaminated host can deliver full CPU cycles
    to a cache-resident md5 spin while a noisy neighbor saturates DRAM
    bandwidth — measured: a bench run read 382 s with trivial early
    queries 2.2x their pins while BOTH md5 probes said 27-30 effective
    cores. Spark is DRAM-bound, so this probe is the indicator that
    actually tracks that failure mode. ~2 s; healthy reference on this
    host ~70 GB/s at 8 workers."""
    from multiprocessing import Pool

    try:
        with Pool(n_workers) as pool:
            rates = pool.starmap(_bw_spin, [(1.5, 256)] * n_workers)
    except OSError:
        return 0.0
    return round(sum(rates), 1)


def _clear_state(spark) -> None:
    """Inter-query hygiene: drop accumulated cache/localCheckpoint state so
    late-suite queries aren't measured under 200 queries' worth of RDD-cache
    pressure (round 10: dedup_canonical_incremental recorded 14.9 s at
    position 220-of-220 vs a 4.1-4.4 s solo floor — pure cache-pressure
    inflation, which then inflated its pin to 23.9 s). clearCache drops
    CacheManager entries; the gc.collect + JVM System.gc pair flushes py4j
    finalizers and lets ContextCleaner reclaim localCheckpoint RDDs whose
    Python wrappers are gone. Never force-unpersists live RDDs — a freed
    localCheckpoint cannot be recomputed (dedupe.py:66)."""
    spark.catalog.clearCache()
    import gc

    gc.collect()
    try:
        spark._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
    eff_cores = _effective_cores(cpus)
    mem_bw = _mem_bw_gbps()

    spark = get_spark("bench")
    qs = registry.queries()
    # warmup: JIT + parquet footer caches, so the first timed query isn't
    # charged for session spin-up
    qs["buffer_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # min of 2 runs: single-shot timings at toy SF swing 20-30% from
        # JIT/page-cache noise (measured 15.5-19.8 s for the same subset);
        # min-of-2 is the standard warm-best-case convention and makes
        # cross-round comparisons meaningful
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        # clear AFTER both runs (not between them): the min-of-2 warm run
        # legitimately reuses run 1's on-disk index artifacts and session
        # caches; the hygiene target is cross-QUERY accumulation only
        _clear_state(spark)
    total = round(sum(timings.values()), 3)

    # Full per-query map: its own (earlier) stdout line plus a file
    # artifact.  The driver's BENCH capture keeps only the last ~2000
    # chars of stdout, so the FINAL line must stay compact — round 4's
    # full map on the final line produced parsed:null.
    # end-of-suite re-probe: r12's committed bench started at 12.3
    # effective cores and DEGRADED to ~7.5 by the late suite — one probe
    # at launch alone cannot certify the whole run
    eff_cores_end = _effective_cores(cpus)
    mem_bw_end = _mem_bw_gbps()

    full = {
        "metric": "headline_query_suite_wall_time",
        "value": total,
        "unit": "sec",
        "effective_cores": eff_cores,
        "effective_cores_end": eff_cores_end,
        "mem_bw_gbps": mem_bw,
        "mem_bw_gbps_end": mem_bw_end,
        "queries": timings,
        "sf": sf,
    }
    # record any env conf override so a number taken with a lingering
    # probe knob can never masquerade as a clean run (ADVICE session.py)
    if os.environ.get("SPARK_GRAFT_CONF"):
        full["conf_overrides"] = os.environ["SPARK_GRAFT_CONF"]
    print(json.dumps(full))
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try:
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass

    # Compact FINAL line: summary + cross-round subset totals + the
    # slowest queries, trimmed until the serialized line fits the tail
    # window with headroom.
    r1_total = round(sum(timings[q] for q in R1_SUBSET if q in timings), 3)
    pinned = {q: timings[q] for q in PINNED_BUDGETS if q in timings}
    over_budget_all = {
        q: [pinned[q], PINNED_BUDGETS[q]]
        for q in pinned
        if pinned[q] > PINNED_BUDGETS[q]
    }
    # Cap the over-budget dict at the top 5 by overage ratio (VERDICT r12
    # item 1b): the r12 contaminated run produced a 24-entry dict that ate
    # the 1600-char budget and left room for only 16 of 233 queries — PERF
    # then reported 30 queries "dropped". The full dict is always in
    # bench_full.json; the compact line carries the count + worst 5.
    over_budget = dict(
        sorted(
            over_budget_all.items(),
            key=lambda kv: kv[1][0] / kv[1][1],
            reverse=True,
        )[:5]
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    # summary fields FIRST, queries last, so the trim loop only ever drops
    # per-query entries — every aggregate survives the tail capture
    compact = {
        "metric": "headline_query_suite_wall_time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "effective_cores": eff_cores,
        "effective_cores_end": eff_cores_end,
        "mem_bw_gbps": mem_bw,
        "mem_bw_gbps_end": mem_bw_end,
        "r1_subset_total": r1_total,
        "pinned_total": round(sum(pinned.values()), 3),
        "pinned_budget_total": round(sum(PINNED_BUDGETS.values()), 2),
        "pinned_over_budget_n": len(over_budget_all),
        "pinned_over_budget": over_budget,
        "queries_file": out_path,
        "queries": slowest,
    }
    # 1700: the driver's tail window is ~2000 chars and BENCH_r12 showed
    # a 1600-char line surviving with ~400 chars of the previous line —
    # 1700 keeps 300 chars of headroom while fitting ~40 query entries
    while len(json.dumps(compact)) > 1700 and compact["queries"]:
        compact["queries"].popitem()
    compact["queries_shown"] = len(compact["queries"])
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
