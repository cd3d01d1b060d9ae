"""C132 AggregatingMergeTree state-table tests: the state algebra must
be associative (merging merged states == merging the originals), and
the state columns must be pure functions of the row set (independent
python replay)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.agg_state import (
    _KMV_K,
    build_state_table,
    merge_states,
)
from tests.conftest import SF_DIR as SF


def _collect_states(df):
    return {
        r.g: (r.s_cnt, r.s_sum, r.s_min, r.s_max, tuple(r.s_hll), tuple(r.s_kmv))
        for r in df.collect()
    }


def test_merge_is_associative(spark):
    """daily -> global must equal daily -> weekly -> global: the
    defining AggregatingMergeTree property (background merges can
    combine parts in any grouping without changing reads)."""
    daily = build_state_table(spark, SF).localCheckpoint()
    direct = _collect_states(merge_states(daily, "CAST(0 AS BIGINT)"))
    weekly = merge_states(
        daily, "CAST(datediff(day, DATE '1970-01-01') AS BIGINT) div 7"
    ).withColumnRenamed("g", "day")
    twice = _collect_states(merge_states(weekly, "CAST(0 AS BIGINT)"))
    assert direct == twice


def test_daily_states_match_python_replay(spark):
    """Every state column is a pure function of the day's row set:
    an independent hashlib/python replay over the raw rows must equal
    the Spark-built daily state table exactly."""
    daily = {
        r.day.isoformat(): (
            r.s_cnt,
            r.s_sum,
            r.s_min,
            r.s_max,
            tuple(r.s_hll),
            tuple(r.s_kmv),
        )
        for r in build_state_table(spark, SF).collect()
    }
    rows = (
        load(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS day", "value", "user_id")
        .collect()
    )
    per_day: dict[str, list] = {}
    for r in rows:
        per_day.setdefault(r.day.isoformat(), []).append((r.value, r.user_id))
    for day, vs in per_day.items():
        vms = [int(math.floor(v * 1000 + 0.5)) for v, _ in vs]
        regs = [0] * 64
        digests = set()
        for _, uid in vs:
            h = hashlib.md5(str(uid).encode()).hexdigest()
            digests.add(h)
            idx = int(h[:2], 16) % 64
            w = int(h[2:15], 16)
            rho = 53 if w == 0 else 53 - w.bit_length()
            regs[idx] = max(regs[idx], rho)
        kmv = tuple(sorted(digests)[:_KMV_K])
        want = (len(vs), sum(vms), min(vms), max(vms), tuple(regs), kmv)
        assert daily[day] == want, day


def test_weekly_rollup_never_rescans_raw(spark):
    """The merge stage's physical plan must read the STATE frame, not
    the events table: scan the executed plan of merge_states over a
    checkpointed state table for parquet scans."""
    daily = build_state_table(spark, SF).localCheckpoint()
    weekly = merge_states(
        daily, "CAST(datediff(day, DATE '1970-01-01') AS BIGINT) div 7"
    )
    plan = weekly._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan
