"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``kafka_clickhouse_implementation_spark.operators.*`` and register
themselves into the registry; this module just exposes the registry in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_clickhouse_implementation_spark import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    materialized-view body (daily counts per level,
    kafka+clickhouse.md:221-229)."""
    from kafka_clickhouse_implementation_spark.operators.tier_a import q_mv_daily

    return q_mv_daily(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for streaming /
    sketch-randomized operators → rows-only check)."""
    return all_oracles()
