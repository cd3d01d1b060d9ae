"""Tests for the ReplacingMergeTree-style upsert layout."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.plans.upsert import (
    append_versions,
    compact_versions,
    read_latest,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ver long")


def test_read_latest_resolves_newest_version(spark, tmp_path):
    path = str(tmp_path / "t")
    append_versions(_df(spark, [(1, "a", 1), (2, "x", 1)]), path)
    append_versions(_df(spark, [(1, "b", 2), (3, "z", 1)]), path)
    got = {r["k"]: (r["v"], r["ver"]) for r in read_latest(spark, path, ("k",), "ver").collect()}
    assert got == {1: ("b", 2), 2: ("x", 1), 3: ("z", 1)}


def test_compact_preserves_latest_and_shrinks(spark, tmp_path):
    path = str(tmp_path / "t")
    append_versions(_df(spark, [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "x", 1)]), path)
    before = {r["k"]: r["v"] for r in read_latest(spark, path, ("k",), "ver").collect()}
    compact_versions(spark, path, ("k",), "ver")
    after = {r["k"]: r["v"] for r in read_latest(spark, path, ("k",), "ver").collect()}
    assert before == after == {1: "c", 2: "x"}
    assert spark.read.parquet(path).count() == 2  # versions collapsed
