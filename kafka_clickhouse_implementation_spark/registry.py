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

# Round-6 curated correctness window. The driver's harness records the
# FIRST 50 registered queries each round, so this explicit list — not
# module import order — decides what gets a hard-signal driver row.
# History: r1 tier_a/tpch slots; r2 reference-parity + LLM tier; r3 the
# 43 then-never-checked; r4 the never-checked remainder + fixes + 8 new
# + ts sentinels (after r4 every oracle-backed query had ≥1 green row);
# r5 all 44 new-that-round queries + 6 r2 picks.
# Round 6 is the STALE-COHORT rotation the r5 verdict asked for: after
# r5, 76 queries' most-recent hard driver row dated from r1/r2 (70 of
# them oracle-backed; the other 6 are rows-only by design and a slot
# would buy no hash signal). This window spends:
#   (a) 5 slots on queries whose CODE or ORACLE changed this round
#       (ADVICE fixes: schema-evolution // division, interval-island
#       tie order — batch + streaming twin; result-capping:
#       moving_sum / window_range_frame user slice) — changed queries
#       always re-earn a fresh row;
#   (b) all 38 oracle-backed queries whose latest row is from ROUND 1;
#   (c) 7 r2-cohort picks (the reference-parity Tier-A five + the two
#       canonical TPC-H queries).
# The remaining 25 r2-cohort queries rotate in round 7; until then the
# committed full-surface sweep artifacts (docs/CORRECTNESS_full_*.json,
# new this round) are their auditable gate.
# Queries not listed here sort after the window, by _MODULE_RANK.
_WINDOW_50 = [
    # (a) changed this round (5)
    "q_schema_evolution", "q_interval_length_sum",
    "q_stream_interval_length", "q_moving_sum", "q_window_range_frame",
    # (b) the full round-1-stale oracle-backed cohort (38)
    "q_agg_suite", "q_argmax_segment", "q_argmin_first_event",
    "q_array_funcs", "q_case_bucket", "q_cond_agg", "q_corr_cov",
    "q_cross_join", "q_cte_reuse", "q_cube", "q_date_funcs",
    "q_distinct_users", "q_exact_distinct", "q_exists_correlated",
    "q_full_outer", "q_having", "q_in_subquery",
    "q_join_broadcast_nation", "q_join_orders_customer",
    "q_left_join_orders", "q_math_funcs", "q_null_funcs", "q_pagination",
    "q_percentiles", "q_pivot", "q_regex_funcs", "q_revenue_by_nation",
    "q_rollup_day_type", "q_scalar_subquery", "q_semi_anti", "q_setops",
    "q_string_funcs", "q_topk_spenders", "q_union_by_name",
    "q_window_analytics", "q_window_lag", "q_window_rank",
    "q_window_runsum",
    # (c) round-2-cohort picks (7)
    "q_opens_for_campaign", "q_level_totals", "q_summing_reaggregate",
    "q_enum_encode", "q_default_coalesce", "q_tpch_q3", "q_tpch_q6",
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
