from __future__ import annotations

import pytest

from options_data_pipeline_spark.session import get_spark

# ---------------------------------------------------------------------------
# Default-profile sizing (VERDICT r12 item 2): the full suite outgrew the
# driver's verify window (57 min on the r12 host; 31.5 min on a quiet one),
# so the driver's `pytest tests/ -x -q` was cut off mid-run and the round
# shipped with tests_ok:false despite zero failures. Every test that took
# ≥ 10 s in the timed full run (2026-08-18, quiet host, --durations=0;
# 45 tests, 1055 s of 1890 s total) carries the `slow` marker — soaks,
# ×100 probes, streaming lifecycle/replay suites, hypothesis property
# sweeps — and pytest.ini deselects them by default, leaving a ~15-min
# profile. Run the slow tier explicitly with: pytest tests/ -m slow
# (the round-close convention runs BOTH tiers).
# Applied centrally here (not as per-test decorators) so hypothesis
# @given / parametrize decorator stacks keep their structure.
_SLOW_TESTS = {
    # test_plans: the registry-wide output-schema audit (148 s)
    "test_no_array_or_map_columns_in_query_outputs",
    # streaming lifecycle / replay / maintenance suites
    "test_maintenance_pair_composed_with_live_pipeline",
    "test_full_pipeline_kill_restart_exactly_once",
    "test_streaming_mixture_weights_matches_batch",
    "test_cluster_ingest_replay_and_crash_window",
    "test_quality_weight_version_pinning",
    "test_streaming_chunk_store_matches_batch_report",
    "test_mixture_compaction_and_version_pinning",
    "test_streaming_sessions_watermark_finalization_and_batch_parity",
    "test_streaming_cluster_map_matches_oneshot",
    "test_streaming_quality_score_matches_batch",
    "test_quality_score_merge_replay_writes_zero",
    "test_streaming_drift_monitor_matches_batch_and_flags_drift",
    "test_streaming_drawdown_matches_batch",
    # ingest loops / index soaks
    "test_streaming_ingest_matches_sequential_batches",
    "test_compact_flat_sink_lossless_and_resets_file_tax",
    "test_sequential_batches_drop_cross_batch_near_dups",
    "test_streamed_corpus_index_pair_matches_oneshot",
    "test_streaming_bm25_index_matches_oneshot",
    "test_bm25_incremental_merge_equals_rebuild",
    "test_incremental_map_matches_oneshot_cc",
    "test_label_index_stays_exact_across_merges",
    "test_lsh_index_append_compact_maintenance",
    "test_gate_then_dedup_full_door",
    "test_pipeline_populates_metrics_table",
    # repair/publish lifecycle probes
    "test_repair_crash_before_publish_leaves_live_index",
    "test_repair_kmeans_index_rebalances_and_publishes",
    "test_repair_until_clean_converges_and_validates",
    "test_repair_splits_lone_hot_cell_via_recipient",
    "test_kmeans_index_atomic_layout_and_stale_root",
    # hypothesis property sweeps (many generated examples each)
    "test_cdc_merge_any_batch_split_matches_batch_operator",
    "test_incremental_lsh_equals_full_selfjoin_restriction",
    "test_salted_join_equals_plain_join",
    "test_containment_winnowed_guarantee_on_contiguous_embeds",
    "test_bloom_never_false_negative_for_any_keys",
    "test_asof_nearest_equals_brute_force",
    "test_temperature_weights_properties",
    "test_budget_sample_prefix_property",
    "test_token_entropy_bounds",
    "test_unigram_logprob_matches_python_model",
    "test_ohlc_invariants_hold_for_any_series",
    "test_packing_never_overfills_except_singletons",
    "test_canonical_url_idempotent_property",
    "test_connected_components_star_randomized_equivalence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[", 1)[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s
    s.stop()
