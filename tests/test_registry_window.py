"""Registry-window guard: the driver's correctness harness records only
the FIRST 50 registered queries. Round 4 re-curated the window to (a)
the 20 queries that never had a driver CORRECTNESS row, (b) the two
array-column queries whose r3 rows ERRed (now boundary-serialized),
(c) the four new round-4 queries (watermark late-drop, TTL funnel,
portable ANN, decoded multimodal features), and (d) 24 sentinels
weighted toward timestamp-reading queries (the testdata timestamp
encoding changed this round). The window is an explicit name list in
registry._WINDOW_50; this test pins the exact 50 so any registry change
that perturbs the driver's view fails loudly.

If you intentionally re-curate the window, update registry._WINDOW_50
AND this pin together, and say so in the commit message."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import (
    _WINDOW_50,
    all_oracles,
    all_queries,
)

WINDOW_50 = [
    # (a) never driver-checked (20)
    "q_multimodal_decode", "q_embedding_truncate", "q_top_weighted",
    "q_stream_sum_map", "q_stream_dedup", "q_stream_join",
    "q_stream_sessions", "q_kmv_sketch", "q_kmv_union", "q_quartiles",
    "q_approx_quartiles", "q_mode_by_type", "q_pivot_events",
    "q_unpivot_measures", "q_qualify_latest", "q_limit_by",
    "q_window_distribution", "q_first_seen_cumulative", "q_decontaminate",
    "q_mixture_weights",
    # (b) r3 array-ERR rows, now boundary-serialized (2)
    "q_sum_map", "q_inverted_index",
    # (c) new round-4 queries (8)
    "q_stream_late_drop", "q_stream_funnel_ttl", "q_ann_portable",
    "q_multimodal_features", "q_doc_signals", "q_unigram_surprisal",
    "q_csv_roundtrip", "q_orc_roundtrip",
    # (d) sentinels (20)
    "q_mv_daily", "q_corpus_clean_portable", "q_partition_prune",
    "q_pricing_summary", "q_cosine_topk", "q_sessionize",
    "q_embedding_near_dup", "q_minhash_portable", "q_simhash_portable",
    "q_group_array", "q_stream_mv_daily", "q_stream_funnel",
    "q_stream_retention", "q_near_dup_components", "q_token_packing",
    "q_stream_corpus_funnel", "q_window_funnel", "q_retention", "q_ann_recall",
    "q_json_extract",
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
    """Within the window, only the sketch-randomized / non-SQL queries
    may be rows-only — everything else must carry a DuckDB oracle."""
    oracles = all_oracles()
    rows_only_by_design = {"q_approx_quartiles"}
    missing = [q for q in WINDOW_50 if q not in oracles and q not in rows_only_by_design]
    assert missing == []


def test_every_oracle_has_a_query():
    qs = all_queries()
    assert set(all_oracles()) <= set(qs)


def test_union_of_windows_covers_every_oracle_backed_query():
    """r1∪r2∪r3∪r4 driver windows == all oracle-backed queries: after
    this round every operator claim has a hard-signal driver row."""
    import json
    import os

    seen = set(WINDOW_50)
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        path = os.path.join(os.path.dirname(__file__), "..", f)
        if os.path.exists(path):
            with open(path) as fh:
                seen |= set(json.load(fh))
    unseen = [q for q in all_oracles() if q not in seen]
    assert unseen == []
