"""Declared-query registry — the contract surface the driver checks.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator, pairing a Spark callable ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or ``None`` for
non-SQL-expressible operators → driver does a rows-only check).

Discipline (SURVEY §2 notes): identical column aliases on both sides;
every float-emitting column ROUNDs identically on both sides; integer
sums in the oracle are CAST to BIGINT (DuckDB sum(BIGINT) → HUGEINT,
Spark sum(long) → long).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_ORIGIN: dict[str, tuple[str, int]] = {}  # name -> (defining module, registration seq)
_SEQ = 0

# Round-7 curated correctness window. The driver's harness records the
# FIRST 50 registered queries each round, so this explicit list — not
# module import order — decides what gets a hard-signal driver row.
# History: r1 tier_a/tpch slots; r2 reference-parity + LLM tier; r3 the
# 43 then-never-checked; r4 the never-checked remainder + fixes + 8 new
# + ts sentinels (after r4 every oracle-backed query had ≥1 green row);
# r5 all 44 new-that-round queries + 6 r2 picks; r6 the r1-stale cohort
# (38) + ADVICE-changed (5) + 7 r2 picks.
# Round 7 finishes the staleness rotation the r6 verdict asked for:
#   (a) 2 slots for queries whose code AND oracle changed this round
#       (the per-user aggregate-finish result caps) — changed queries
#       always re-earn a fresh row;
#   (b) all 28 round-6 additions that have never had a driver row
#       (C98–C125; three of them — semantic_dedup, ngram_distance,
#       stream_ivf_ingest — also changed this round: the k(n) rule,
#       the degenerate-doc guard, the single-pass argmin);
#   (c) the 11 non-TPC-H round-2-stale oracle-backed queries;
#   (d) 9 of the 14 round-2-stale TPC-H shapes. The remaining 5
#       (q4/q7/q8/q21/q22 shapes) lead the round-8 window; until then
#       the committed full-surface sweeps are their auditable gate.
# Queries not listed here sort after the window, by _MODULE_RANK.
_WINDOW_50 = [
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

# Canonical module order for queries OUTSIDE the curated window above.
_MODULE_RANK = [
    "kafka_clickhouse_implementation_spark.operators.tier_a",
    "kafka_clickhouse_implementation_spark.operators.tpch",
    "kafka_clickhouse_implementation_spark.operators.text",
    "kafka_clickhouse_implementation_spark.operators.similarity",
    "kafka_clickhouse_implementation_spark.operators.sessions",
    "kafka_clickhouse_implementation_spark.operators.udx",
    "kafka_clickhouse_implementation_spark.operators.dedup",
    "kafka_clickhouse_implementation_spark.operators.multimodal",
    "kafka_clickhouse_implementation_spark.operators.relational",
    "kafka_clickhouse_implementation_spark.operators.relational_ext",
    "kafka_clickhouse_implementation_spark.operators.components",
    "kafka_clickhouse_implementation_spark.operators.embeddings_ext",
    "kafka_clickhouse_implementation_spark.operators.funnels",
    "kafka_clickhouse_implementation_spark.operators.text_ext",
    "kafka_clickhouse_implementation_spark.operators.minhash_portable",
    "kafka_clickhouse_implementation_spark.pipelines.corpus",
    "kafka_clickhouse_implementation_spark.streaming.pipeline",
    "kafka_clickhouse_implementation_spark.streaming.funnel",
    "kafka_clickhouse_implementation_spark.streaming.retention",
    "kafka_clickhouse_implementation_spark.streaming.sessions",
    "kafka_clickhouse_implementation_spark.operators.sketches",
    "kafka_clickhouse_implementation_spark.operators.relational_ext2",
    "kafka_clickhouse_implementation_spark.operators.corpus_ext",
    "kafka_clickhouse_implementation_spark.streaming.watermark",
    "kafka_clickhouse_implementation_spark.operators.quality_ext",
    "kafka_clickhouse_implementation_spark.sources.formats",
    "kafka_clickhouse_implementation_spark.streaming.corpus_stream",
    "kafka_clickhouse_implementation_spark.streaming.sketches_stream",
    "kafka_clickhouse_implementation_spark.operators.jpeg_codec",
    "kafka_clickhouse_implementation_spark.operators.analytics_ext",
    "kafka_clickhouse_implementation_spark.streaming.bloom_stream",
    "kafka_clickhouse_implementation_spark.streaming.analytics_stream",
    "kafka_clickhouse_implementation_spark.operators.gif_codec",
    "kafka_clickhouse_implementation_spark.operators.stats_ext",
    "kafka_clickhouse_implementation_spark.operators.parity_ext",
    "kafka_clickhouse_implementation_spark.operators.clustering",
    "kafka_clickhouse_implementation_spark.operators.mutations",
    "kafka_clickhouse_implementation_spark.streaming.vector_stream",
    "kafka_clickhouse_implementation_spark.operators.flac_codec",
    "kafka_clickhouse_implementation_spark.operators.pvalues",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query (and its DuckDB oracle, if any)."""

    def deco(fn: QueryFn) -> QueryFn:
        global _SEQ
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        _ORIGIN[name] = (fn.__module__, _SEQ)
        _SEQ += 1
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _canonical_order(name: str) -> tuple[int, int, str, int]:
    try:
        return (0, _WINDOW_50.index(name), "", 0)
    except ValueError:
        pass
    mod, seq = _ORIGIN[name]
    try:
        rank = _MODULE_RANK.index(mod)
    except ValueError:
        rank = len(_MODULE_RANK)
    # Within a module, decorators run top-to-bottom, so the global seq
    # is monotonic within each module no matter when it was imported.
    return (1, rank, mod, seq)


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {n: _QUERIES[n] for n in sorted(_QUERIES, key=_canonical_order)}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {n: _ORACLES[n] for n in sorted(_ORACLES, key=_canonical_order)}


_loaded = False


def _load_operator_modules() -> None:
    """Import every operator module exactly once so decorators run.
    _MODULE_RANK is the single source of truth: it is both the import
    list and the canonical ordering, so registration and the driver's
    50-entry correctness window cannot drift apart (the window itself
    is pinned by tests/test_registry_window.py)."""
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _MODULE_RANK:
        importlib.import_module(mod)

    _loaded = True
