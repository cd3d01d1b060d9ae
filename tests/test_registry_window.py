"""Registry-window guard: the driver's correctness harness records only
the FIRST 50 registered queries, and round 2 curated that window to
exactly cover reference parity (tier_a), TPC-H, and the LLM-pipeline
tier. Appending a query to an in-window module silently pushes the last
window entry out — this test makes that fail loudly instead.

If you intentionally re-curate the window, update WINDOW_50 here and
say so in the commit message."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import all_oracles, all_queries

WINDOW_50 = [
    # tier_a (9) — the reference's literal query surface
    "q_mv_daily", "q_level_totals", "q_summing_reaggregate",
    "q_opens_for_campaign", "q_ingest_roundtrip", "q_partition_prune",
    "q_json_extract", "q_enum_encode", "q_default_coalesce",
    # tpch (17) — Q1 + the 16 shapes
    "q_pricing_summary", "q_tpch_q3", "q_tpch_q6", "q_tpch_q8_shape",
    "q_tpch_q16_shape", "q_tpch_q21_shape", "q_tpch_q13_shape",
    "q_tpch_q17_shape", "q_tpch_q19_shape", "q_tpch_q22_shape",
    "q_tpch_q15_shape", "q_tpch_q7_shape", "q_tpch_q4_shape",
    "q_tpch_q12_shape", "q_tpch_q14_shape", "q_tpch_q18_shape",
    "q_tpch_q10_shape",
    # text (8)
    "q_term_stats", "q_docs_by_lang", "q_token_count", "q_quality_score",
    "q_tfidf_top_terms", "q_token_count_bpe", "q_rolling_hash", "q_lang_id",
    # similarity (4)
    "q_cosine_topk", "q_ann_lsh", "q_ann_recall", "q_ann_ivf",
    # sessions (1), udx (3)
    "q_sessionize", "q_udf_domain", "q_udaf_geomean", "q_udtf_tokenize",
    # dedup (7)
    "q_dedup_docs", "q_jaccard_pairs", "q_ngram_jaccard", "q_fingerprint",
    "q_minhash_lsh", "q_simhash", "q_embedding_near_dup",
    # multimodal (1st of 2)
    "q_multimodal_bytes",
]


def test_first_50_registrations_are_the_curated_window():
    assert list(all_queries())[:50] == WINDOW_50


def test_window_oracle_coverage():
    """Within the window, only the sketch-randomized queries may be
    rows-only — everything else must carry a DuckDB oracle."""
    oracles = all_oracles()
    rows_only_by_design = {"q_minhash_lsh", "q_simhash", "q_ann_lsh", "q_ann_recall", "q_ann_ivf"}
    missing = [q for q in WINDOW_50 if q not in oracles and q not in rows_only_by_design]
    assert missing == []


def test_every_oracle_has_a_query():
    qs = all_queries()
    assert set(all_oracles()) <= set(qs)
