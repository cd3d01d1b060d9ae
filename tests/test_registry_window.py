"""Registry-window guard: the driver's correctness harness records only
the FIRST 50 registered queries. Since round 8 the window is DERIVED by
tools/make_window.py from the recorded CORRECTNESS_r* history (changed/
new queries first, then never-checked, then oldest-green-row first,
hash-signal queries before rows-only) — the r7 verdict asked for
exactly this after hand-curation drifted once. This test pins the
derived 50 so any registry change that perturbs the driver's view
fails loudly.

To re-curate: re-run the tool with this round's --changed list and
paste its output into registry._WINDOW_50 AND this pin together."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import (
    _WINDOW_50,
    all_oracles,
    all_queries,
)

WINDOW_50 = [
    "q_token_shards",  # changed/new
    "q_stream_token_shards",  # changed/new
    "q_shard_mixture",  # changed/new
    "q_nb_pr_curve",  # changed/new
    "q_corpus_export_full",  # changed/new
    "q_ann_index_upsert",  # changed/new
    "q_corpus_clean_nb",  # changed/new
    "q_nb_quality",  # changed/new
    "q_stream_bm25",  # changed/new
    "q_stream_bm25_upsert",  # changed/new
    "q_partition_detach",  # changed/new
    "q_embedding_near_dup",  # changed/new
    "q_bpe_train",  # changed/new
    "q_bpe_tokenize",  # changed/new
    "q_stream_bpe",  # changed/new
    "q_ann_ivfpq",  # changed/new
    "q_ann_ivfpq_residual",  # changed/new
    "q_pq_quantize",  # changed/new
    "q_corpus_export",  # changed/new
    "q_tpch_q20_shape",  # last green r5
    "q_tpch_q2_shape",  # last green r5
    "q_tpch_q9_shape",  # last green r5
    "q_udaf_geomean",  # last green r5
    "q_udf_domain",  # last green r5
    "q_udtf_tokenize",  # last green r5
    "q_uniq_up_to",  # last green r5
    "q_weighted_median",  # last green r5
    "q_window_funnel_dedup",  # last green r5
    "q_window_funnel_strict",  # last green r5
    "q_agg_suite",  # last green r6
    "q_argmax_segment",  # last green r6
    "q_argmin_first_event",  # last green r6
    "q_array_funcs",  # last green r6
    "q_case_bucket",  # last green r6
    "q_cond_agg",  # last green r6
    "q_corr_cov",  # last green r6
    "q_cross_join",  # last green r6
    "q_cte_reuse",  # last green r6
    "q_cube",  # last green r6
    "q_date_funcs",  # last green r6
    "q_default_coalesce",  # last green r6
    "q_distinct_users",  # last green r6
    "q_enum_encode",  # last green r6
    "q_exact_distinct",  # last green r6
    "q_exists_correlated",  # last green r6
    "q_full_outer",  # last green r6
    "q_having",  # last green r6
    "q_in_subquery",  # last green r6
    "q_interval_length_sum",  # last green r6
    "q_join_broadcast_nation",  # last green r6
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


# the only rows-only queries allowed a window slot: the four p-value
# companions, rows-only BY DESIGN (libm erf/lgamma are not correctly
# rounded cross-engine; operators/pvalues.py module doc) and
# quantitatively bounded in tests/test_pvalues.py instead, plus the
# float-LSH recall probe (recall vs brute force is evaluated inside
# the query itself; numpy replay in tests/test_similarity.py)
_ROWS_ONLY_BY_DESIGN = {
    "q_mwu_pvalue",
    "q_welch_pvalue",
    "q_student_pvalue",
    "q_ks_pvalue",
    "q_ann_recall_float",
}


def test_window_oracle_coverage():
    """Every window slot is oracle-backed except the declared p-value
    companions — a rows-only row buys no hash signal, so rows-only
    queries only enter the window when they are NEW (to record that
    they execute under the driver's vanilla session)."""
    oracles = all_oracles()
    missing = [
        q for q in WINDOW_50 if q not in oracles and q not in _ROWS_ONLY_BY_DESIGN
    ]
    assert missing == []


def test_legacy_queries_are_tagged_and_out_of_window():
    """Superseded rows-only sketches keep their implementations under a
    legacy_ prefix; each has an oracle-checked twin in the registry
    (C24/C32/C60/C112, and since round 8 the deterministic one-shot MG
    C29 and the portable register-exact HLL C31)."""
    qs = all_queries()
    oracles = all_oracles()
    twins = {
        "legacy_minhash_lsh": "q_minhash_portable",
        "legacy_simhash": "q_simhash_portable",
        "legacy_ann_lsh": "q_ann_portable",
        "legacy_ann_ivf": "q_ann_ivf_exact",
        "legacy_heavy_hitters": "q_heavy_hitters",
        "legacy_hll_sketch": "q_hll_sketch_union",
    }
    for legacy, twin in twins.items():
        assert legacy in qs
        assert legacy not in oracles
        assert legacy not in WINDOW_50
        assert twin in oracles
