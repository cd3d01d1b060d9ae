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

# Canonical module order for the driver-facing listing. The driver's
# correctness harness records the FIRST 50 registered queries, so this
# ranking — not Python import order, which tests can perturb by
# importing an operator module directly — decides what lands inside
# the checked window. Modules absent from this list sort last,
# alphabetically.
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


def _canonical_order(name: str) -> tuple[int, str, int]:
    mod, seq = _ORIGIN[name]
    try:
        rank = _MODULE_RANK.index(mod)
    except ValueError:
        rank = len(_MODULE_RANK)
    # Within a module, decorators run top-to-bottom, so the global seq
    # is monotonic within each module no matter when it was imported.
    return (rank, mod, seq)


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
