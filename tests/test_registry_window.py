"""Registry-window guard: the driver's correctness harness records only
the FIRST 50 registered queries. Round 7 finishes the staleness
rotation the r6 verdict asked for: (a) the two result-cap queries whose
code and oracle changed this round, (b) all 28 round-6 additions that
had never earned a driver row (C98–C125), (c) the 11 non-TPC-H
round-2-stale oracle-backed queries, (d) 9 of the 14 round-2-stale
TPC-H shapes (the remaining 5 lead round 8). The window is an explicit
name list in registry._WINDOW_50; this test pins the exact 50 so any
registry change that perturbs the driver's view fails loudly.

If you intentionally re-curate the window, update registry._WINDOW_50
AND this pin together, and say so in the commit message."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import (
    _WINDOW_50,
    all_oracles,
    all_queries,
)

WINDOW_50 = [
    # (a) changed result-cap queries (2)
    "q_moving_sum", "q_window_range_frame",
    # (b) the 28 never-driver-checked round-6 additions
    "q_linreg", "q_skew_kurt", "q_mann_whitney", "q_ks_test",
    "q_avg_weighted", "q_bitmap_ops", "q_roc_auc", "q_corr_matrix",
    "q_anova", "q_exp_decay", "q_sparkbar", "q_url_funcs",
    "q_geo_distance", "q_multi_search", "q_kmeans_semantic",
    "q_semantic_dedup", "q_ann_ivf_exact", "q_pq_quantize",
    "q_chunk_dedup", "q_substring_dup", "q_curriculum_schedule",
    "q_jsonl_roundtrip", "q_ngram_distance", "q_lightweight_delete",
    "q_update_mutation", "q_stream_linreg", "q_stream_chunk_dedup",
    "q_stream_ivf_ingest",
    # (c) the non-TPC-H round-2-stale cohort (11)
    "q_docs_by_lang", "q_fingerprint", "q_lang_id", "q_multimodal_bytes",
    "q_ngram_jaccard", "q_quality_score", "q_rolling_hash",
    "q_term_stats", "q_tfidf_top_terms", "q_token_count",
    "q_token_count_bpe",
    # (d) 9 round-2-stale TPC-H shapes
    "q_tpch_q10_shape", "q_tpch_q12_shape", "q_tpch_q13_shape",
    "q_tpch_q14_shape", "q_tpch_q15_shape", "q_tpch_q16_shape",
    "q_tpch_q17_shape", "q_tpch_q18_shape", "q_tpch_q19_shape",
]


def test_first_50_registrations_are_the_curated_window():
    assert list(all_queries())[:50] == WINDOW_50
    assert _WINDOW_50 == WINDOW_50


def test_window_is_exactly_50_known_names():
    qs = all_queries()
    assert len(WINDOW_50) == 50
    assert len(set(WINDOW_50)) == 50
    missing = [q for q in WINDOW_50 if q not in qs]
    assert missing == []


def test_window_oracle_coverage():
    """The round-7 window is all-oracle-backed by construction — the six
    rows-only-by-design queries (and the four legacy_-tagged superseded
    sketches) are deliberately excluded: a rows-only row buys no hash
    signal."""
    oracles = all_oracles()
    missing = [q for q in WINDOW_50 if q not in oracles]
    assert missing == []


def test_legacy_queries_are_tagged_and_out_of_window():
    """The four superseded rows-only sketches keep their implementations
    under a legacy_ prefix; each has an oracle-checked portable twin in
    the registry (C24/C32/C60/C112)."""
    qs = all_queries()
    oracles = all_oracles()
    twins = {
        "legacy_minhash_lsh": "q_minhash_portable",
        "legacy_simhash": "q_simhash_portable",
        "legacy_ann_lsh": "q_ann_portable",
        "legacy_ann_ivf": "q_ann_ivf_exact",
    }
    for legacy, twin in twins.items():
        assert legacy in qs
        assert legacy not in oracles
        assert legacy not in WINDOW_50
        assert twin in oracles
