"""Unit tests for the Tier A reference-parity operators on tiny literal
DataFrames with exact expected rows (SURVEY §5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.operators.tier_a import daily_counts
from kafka_clickhouse_implementation_spark.schemas import EVENT_TYPES, EVENTS_SCHEMA


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=EVENTS_SCHEMA)


def test_daily_counts_mv_body(spark):
    """The MV body: toDate bucket + groupBy(day, level) count."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 5, 0, 0), 1, "click", 1.0, None),
        (2, dt.datetime(2024, 1, 1, 23, 59, 59), 2, "click", 1.0, None),
        (3, dt.datetime(2024, 1, 2, 0, 0, 0), 1, "view", 1.0, None),
    ]
    out = daily_counts(_events(spark, rows)).collect()
    got = {(str(r["day"]), r["level"]): r["total"] for r in out}
    assert got == {("2024-01-01", "click"): 2, ("2024-01-02", "view"): 1}


def test_summing_contract_partial_plus_final(spark):
    """Partial per-day counts re-summed == one-shot global count
    (the SummingMergeTree read contract, SURVEY A7)."""
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 3), i, "click" if i % 2 else "view", 1.0, None)
        for i in range(20)
    ]
    ev = _events(spark, rows)
    partials = daily_counts(ev)
    reagg = {
        r["level"]: r["total"]
        for r in partials.groupBy("level").agg(F.sum("total").alias("total")).collect()
    }
    direct = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert reagg == direct


def test_enum_domain_is_closed():
    assert set(EVENT_TYPES.values()) == {1, 2, 3, 4, 5}
    assert len(EVENT_TYPES) == 5
