import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from enterprise_warp_spark.session import get_spark

    spark = get_spark(app_name="ews-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("EWS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


# Budgeted default gate (r14 verdict #2): the driver's `pytest tests/ -x -q`
# must fit a fixed window the full suite outgrew. Every nodeid below
# measured >=8s per call (pytest --durations on quiet local[8] hardware;
# /tmp mirror committed in OPTIMIZATION_r15.md), or belongs to a module-
# fixture group whose shared setup alone costs ~30s. They get the `slow`
# marker here — one greppable list instead of 50 decorators — and
# pyproject's `addopts = "-m 'not slow'"` deselects them by default.
# Full run: pytest tests/ -m "slow or not slow".
SLOW_TESTS = frozenset((
    "tests/test_cdc.py::test_chunk_store_stream_full_store_restores",
    "tests/test_cdc.py::test_chunk_store_stream_incremental_and_replay",
    "tests/test_cdc.py::test_compact_chunk_store_preserves_contract",
    "tests/test_cdc.py::test_stream_with_bloom_and_compaction_rebuild",
    "tests/test_classify.py::test_classifier_deterministic_and_filter_schema",
    "tests/test_classify.py::test_classifier_separates_holdout",
    "tests/test_cli.py::test_cross_flag_separate_load_and_saved_os_compose",
    "tests/test_cli.py::test_results_main_covm_and_os",
    "tests/test_cli.py::test_results_main_info_corner",
    "tests/test_cli.py::test_run_paramfile_adaptive_ess_target",
    "tests/test_cli.py::test_run_paramfile_adaptive_sampler",
    "tests/test_coverage_extras.py::test_curate_corpus",
    "tests/test_coverage_extras.py::test_curate_repetition_gate",
    "tests/test_coverage_extras.py::test_prepare_training_corpus_end_to_end",
    "tests/test_coverage_extras.py::test_prepare_training_corpus_semdedup_auto_switch",
    "tests/test_coverage_extras.py::test_prepare_training_corpus_tokenize_and_pack",
    "tests/test_coverage_extras.py::test_prepare_training_corpus_with_quality_model",
    "tests/test_coverage_extras.py::test_semdedup_stage_keeps_coverage_less_docs",
    "tests/test_coverage_extras.py::test_sketch_branch_timing_instrumentation",
    "tests/test_coverage_extras.py::test_web_hygiene_branch_timing_instrumentation",
    "tests/test_exact_rank_fuzz.py::test_hostile_values_exact_vs_sorted_oracle",
    "tests/test_exact_rank_fuzz.py::test_small_cap_narrowing_exact_or_loud",
    "tests/test_examples.py::test_curate_corpus_example_subprocess",
    "tests/test_examples.py::test_run_example_paramfile_subprocess",
    "tests/test_fuzzy.py::test_edit_distance_join_multiplicity_and_q_sweep",
    "tests/test_general2_pipeline.py::test_general2_noise_json_matches_reference_key_set",
    "tests/test_general2_pipeline.py::test_general2_pipeline_posterior_and_evidence",
    "tests/test_general2_pipeline.py::test_general2_recovers_dominant_backend",
    "tests/test_golden_recovery.py::test_sampler_health",
    "tests/test_golden_recovery.py::test_tier_a_medians_within_30pct",
    "tests/test_golden_recovery.py::test_tier_b_golden_inside_90pct_band",
    "tests/test_golden_recovery.py::test_tier_c_ridge_combination",
    "tests/test_graph.py::test_degrees_and_quality_weights",
    "tests/test_graph.py::test_pagerank_matches_dense_reference",
    "tests/test_html.py::TestLinkExtraction::test_link_edges_domain_graph",
    "tests/test_importance_posterior.py::test_high_dimension_takes_diagonal_family",
    "tests/test_maintenance.py::test_dedup_corpus_stream",
    "tests/test_mojibake.py::test_curation_fix_encoding_stage",
    "tests/test_mojibake.py::test_property_repair_inverts_any_cleanly_wreckable_text",
    "tests/test_oracle_parity.py::test_learned_sketch_ops_concurrent_sessions_deterministic",
    "tests/test_product_space.py::test_adaptive_evidence_differences_agree_with_hypermodel_bf",
    "tests/test_search.py::test_bm25_pruned_equals_exhaustive",
    "tests/test_search.py::test_query_tokenization_contract_all_five_paths",
    "tests/test_suffix.py::test_cross_shard_span_missed_but_hash_backstop_catches_it",
    "tests/test_suffix.py::test_max_run_members_guard",
    "tests/test_suffix.py::test_randomized_corpora_match_brute",
    "tests/test_suffix.py::test_sharded_spans_subset_of_global_and_exact_within_shard",
    "tests/test_suffix.py::test_sharded_strip_with_backstop_covers_the_straddling_span",
    "tests/test_suffix.py::test_within_doc_repeats_gated_by_flag",
))


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
