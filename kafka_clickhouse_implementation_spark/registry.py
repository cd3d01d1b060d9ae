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

# Round-3 curated correctness window. The driver's harness records the
# FIRST 50 registered queries each round, so this explicit list — not
# module import order — decides what gets a hard-signal driver row.
# Round 1 checked tier_a/tpch-adjacent slots, round 2 re-curated to the
# reference-parity + LLM tier (45 green / 5 rows-only / 0 fail); round 3
# rotates in the 43 queries that have NEVER had a driver row (everything
# registered after slot 50: relational_ext round-2 additions, components,
# embeddings_ext, funnels, text_ext, minhash_portable, corpus, streaming
# twins), keeping 7 already-green sentinels for regression cover.
# Queries not listed here sort after the window, by _MODULE_RANK.
_WINDOW_50 = [
    # sentinels (6) — green in r1/r2, kept for regression cover — plus
    # the round-3 flagship composition (end-to-end oracle-checked
    # corpus clean), promoted into the window for a hard driver row
    "q_mv_daily", "q_corpus_clean_portable", "q_partition_prune",
    "q_pricing_summary", "q_cosine_topk", "q_sessionize",
    "q_embedding_near_dup",
    # relational_ext round-2 additions (14)
    "q_collect_tokens", "q_asof_join", "q_sliding_window", "q_salted_agg",
    "q_map_funcs", "q_histogram", "q_weekly_rollup", "q_gap_fill",
    "q_systematic_sample", "q_range_join", "q_grouping_sets", "q_bit_aggs",
    "q_hll_sketch_union", "q_scd2_join",
    # components (1), embeddings_ext (2)
    "q_near_dup_components", "q_embedding_norms", "q_embedding_quantize",
    # funnels (9)
    "q_window_funnel", "q_retention", "q_sequence_match", "q_sum_map",
    "q_delta_sum", "q_event_paths", "q_sequence_count", "q_sliding_counts",
    "q_session_bounds",
    # text_ext (10)
    "q_stratified_sample", "q_bigram_counts", "q_inverted_index",
    "q_zipf_rank", "q_pii_mask", "q_edit_distance", "q_heavy_hitters",
    "q_collocations", "q_doc_chunks", "q_token_packing",
    # minhash_portable (2), corpus (2), streaming twins (3)
    "q_minhash_portable", "q_simhash_portable", "q_corpus_funnel",
    "q_corpus_clean", "q_stream_mv_daily", "q_stream_funnel",
    "q_stream_retention",
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
