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

# Round-4 curated correctness window. The driver's harness records the
# FIRST 50 registered queries each round, so this explicit list — not
# module import order — decides what gets a hard-signal driver row.
# Round 1 checked tier_a/tpch-adjacent slots; round 2 the
# reference-parity + LLM tier; round 3 the 43 then-never-checked
# queries (45 green / 2 array-ERR). Round 4 rotates in (a) the 20
# queries that have never had a driver row, (b) the two array-column
# queries whose r3 rows ERRed in the driver canonicalizer, now
# serialized at the boundary, (c) the four new round-4 queries, and
# (d) 24 sentinels weighted toward timestamp-reading queries (the
# testdata timestamp encoding changed to micros-NTZ this round — every
# unix_micros/window/to_date path deserves a fresh hard-signal row).
# After r4 the r1∪r2∪r3∪r4 union covers every oracle-backed query.
# Queries not listed here sort after the window, by _MODULE_RANK.
_WINDOW_50 = [
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
    # (d) sentinels (20): flagships + the ts-reading regression slice
    "q_mv_daily", "q_corpus_clean_portable", "q_partition_prune",
    "q_pricing_summary", "q_cosine_topk", "q_sessionize",
    "q_embedding_near_dup", "q_minhash_portable", "q_simhash_portable",
    "q_group_array", "q_stream_mv_daily", "q_stream_funnel",
    "q_stream_retention", "q_near_dup_components", "q_token_packing",
    "q_stream_corpus_funnel", "q_window_funnel", "q_retention", "q_ann_recall",
    "q_json_extract",
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
