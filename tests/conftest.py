from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two-tier suite (SURVEY §5): tests measured >8 s on the shared host
# (pytest --durations, r10 full run) carry the `slow` marker so the
# inner loop can run `pytest -m "not slow"` (measured 13m19s vs 26m
# full on the shared host — the 2-5 s mid-tail dominates what remains);
# the FULL suite remains the certification gate.
# Centralized here instead of scattering decorators: one list, matched
# by test name (parametrized ids matched in full).
_SLOW_TESTS = {
    "test_sessionize_stream_vs_batch_oracle",
    "test_stream_dedup_ingest_folds_replay_and_crash",
    "test_duplicate_clusters_matches_union_find",
    "test_ann_join_distributed_query_side_equals_driver",
    "test_heavy_hitters_tree_merge_high_partition_count",
    "test_graph_traversal_mode_recall",
    "test_ivf_range_join_cosine_equals_brute",
    "test_graph_random_pivots_recall",
    "test_ivf_range_join_distributed_equals_driver_bitwise",
    "test_ivf_range_join_large_codebook_fallback",
    "test_query_matches_oracle[dedup_clusters]",
    "test_exact_quantiles_matches_sorted_rank",
    "test_stream_line_dedup_folds_equal_batch_operator",
    "test_query_matches_oracle[dedup_embedding_cosine]",
    "test_heavy_recall_n1000",
    "test_semantic_dedup_splits_oversized_cluster",
    "test_query_matches_oracle[index_search_graph]",
    "test_logistic_score_is_codegen_and_separates",
    "test_stream_add_scrub_after_crash_before_commit",
    "test_bpe_merges_match_python_reference",
    "test_stream_repeated_spans_folds_equal_batch_operator",
    "test_embedding_near_dup_plan_only_with_dim",
    "test_lsh_multi_probe_superset_and_recall",
    "test_heavy_hitters_exact_or_loud",
    "test_compact_crash_before_registry_swap_recover_rerun",
    "test_stream_dedup_ingest_streaming_query",
    "test_logistic_fit_matches_numpy_model",
    "test_stream_scd2_maintain_equals_batch_and_survives_replay",
    "test_stream_passage_dedup_folds_equal_batch_operator",
    # r12 additions: bucketed fold state, frontier compaction, and the
    # canonicalization fuzz are DDL/fold-heavy (30-70 s each)
    "test_fold_url_dedup_bucketed_state",
    "test_compact_url_frontier",
    "test_stream_url_dedup_auto_compaction",
    "test_fold_dedup_bucketed_state_layouts",
    "test_stream_dedup_ingest_bucketed_band_state",
    "test_canonicalize_fuzz_vs_stdlib_model",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_TESTS or item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    # 16 local threads (r13): the suite is compute-bound in its heavy
    # tail (graph recall, IVF range joins, codec corpora, fold DDL) and
    # the host has 32 CPUs — 8→16 measured 1.7× on the five heaviest
    # files (1029s→620s) with identical results; 16 leaves headroom for
    # the DuckDB oracle side of the parity tests, which threads on its
    # own.
    spark = get_spark("vectorsearch_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
