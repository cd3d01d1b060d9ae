"""The materialize-then-compare contract for the mutation tier
(operators/mutations.py): the masked/overlaid READ PATH must be
row-for-row indistinguishable from the table a background mutation
would rewrite — ClickHouse's ``_row_exists`` guarantee."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.mutations import (
    _DEL_COHORT,
    delete_markers,
    materialize_delete,
    materialize_update,
    q_lightweight_delete,
    q_update_mutation,
    update_patch,
)


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="spark_graft_mut_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_delete_read_path_equals_materialized(spark, sf_dir, tmp_out):
    out = os.path.join(tmp_out, "events_deleted")
    materialize_delete(spark, sf_dir, out)
    rewritten = spark.read.parquet(out)
    ev = load(spark, sf_dir, "events")
    marks = delete_markers(spark, sf_dir)
    masked = ev.join(F.broadcast(marks), "event_id", "left_anti")
    cols = ["event_id", "user_id", "event_type"]
    assert _rows(masked, cols) == _rows(rewritten, cols)
    # the mutation is non-vacuous and targeted: only the cohort is gone
    n_before = ev.count()
    n_after = rewritten.count()
    assert n_after < n_before
    assert rewritten.filter(F.col("user_id") % 31 == _DEL_COHORT).count() == 0
    assert (
        ev.filter(F.col("user_id") % 31 != _DEL_COHORT).count() == n_after
    )


def test_update_read_path_equals_materialized(spark, sf_dir, tmp_out):
    out = os.path.join(tmp_out, "events_updated")
    materialize_update(spark, sf_dir, out)
    rewritten = spark.read.parquet(out).select(
        "event_id", F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm")
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm0"),
    )
    patch = update_patch(spark, sf_dir)
    overlaid = ev.join(F.broadcast(patch), "event_id", "left").select(
        "event_id", F.coalesce("new_vm", "vm0").alias("vm")
    )
    assert _rows(overlaid, ["event_id", "vm"]) == _rows(rewritten, ["event_id", "vm"])
    assert patch.count() > 0  # non-vacuous


def test_mutation_queries_broadcast(spark, sf_dir):
    # the read paths must be broadcast joins — no shuffle of the fact
    for q in (q_lightweight_delete, q_update_mutation):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
