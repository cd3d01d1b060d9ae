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
    "q_bpe_train",  # changed/new
    "q_stream_bpe",  # changed/new
    "q_bpe_tokenize",  # changed/new
    "q_kn_quality",  # changed/new
    "q_kmv_setops",  # changed/new
    "q_multimodal_jpeg_prog",  # changed/new
    "q_multimodal_jpeg_sa",  # changed/new
    "q_with_totals",  # changed/new
    "q_ann_recall_float",  # changed/new
    "q_ks_pvalue",  # changed/new
    "q_ann_portable",  # last green r4
    "q_ann_recall",  # last green r4
    "q_corpus_clean_portable",  # last green r4
    "q_cosine_topk",  # last green r4
    "q_csv_roundtrip",  # last green r4
    "q_decontaminate",  # last green r4
    "q_doc_signals",  # last green r4
    "q_embedding_near_dup",  # last green r4
    "q_embedding_truncate",  # last green r4
    "q_first_seen_cumulative",  # last green r4
    "q_group_array",  # last green r4
    "q_inverted_index",  # last green r4
    "q_json_extract",  # last green r4
    "q_kmv_sketch",  # last green r4
    "q_kmv_union",  # last green r4
    "q_limit_by",  # last green r4
    "q_minhash_portable",  # last green r4
    "q_mixture_weights",  # last green r4
    "q_mode_by_type",  # last green r4
    "q_multimodal_decode",  # last green r4
    "q_multimodal_features",  # last green r4
    "q_mv_daily",  # last green r4
    "q_near_dup_components",  # last green r4
    "q_orc_roundtrip",  # last green r4
    "q_partition_prune",  # last green r4
    "q_pivot_events",  # last green r4
    "q_pricing_summary",  # last green r4
    "q_qualify_latest",  # last green r4
    "q_quartiles",  # last green r4
    "q_retention",  # last green r4
    "q_sessionize",  # last green r4
    "q_simhash_portable",  # last green r4
    "q_stream_corpus_funnel",  # last green r4
    "q_stream_dedup",  # last green r4
    "q_stream_funnel",  # last green r4
    "q_stream_funnel_ttl",  # last green r4
    "q_stream_join",  # last green r4
    "q_stream_late_drop",  # last green r4
    "q_stream_mv_daily",  # last green r4
    "q_stream_retention",  # last green r4
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
