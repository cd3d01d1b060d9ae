"""Round-3 relational widening: distribution stats and reshaping."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.operators.relational_ext2 import (
    q_approx_quartiles,
    q_quartiles,
)

SF = "/root/testdata/sf0.01"


def test_approx_quartiles_within_bound_of_exact(spark):
    """approx_percentile at accuracy=10000 must land within one
    quantity unit of the exact interpolated quartiles (l_quantity is
    integers 1..50, so a 1e-4 rank error is well under one value)."""
    exact = {r["l_returnflag"]: (r["p25"], r["p50"], r["p75"]) for r in q_quartiles(spark, SF).collect()}
    approx = {r["l_returnflag"]: (r["p25"], r["p50"], r["p75"]) for r in q_approx_quartiles(spark, SF).collect()}
    assert set(exact) == set(approx)
    for flag, ex in exact.items():
        for e, a in zip(ex, approx[flag]):
            assert abs(e - a) <= 1.0, (flag, ex, approx[flag])


def test_with_totals_matches_python_replay(spark, sf_dir):
    """ClickHouse WITH TOTALS (rollup + grouping marker): the totals
    row must re-aggregate the input — distinct users in particular is
    NOT the sum of per-group distincts."""
    import pyarrow.parquet as pq

    from kafka_clickhouse_implementation_spark.registry import all_queries

    tab = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "user_id"]
    )
    et, vals, uids = (tab[c].to_pylist() for c in ("event_type", "value", "user_id"))
    import collections
    import math

    agg: dict[str, list] = collections.defaultdict(lambda: [0, 0, set()])
    for t, v, u in zip(et, vals, uids):
        for key in (t, ""):
            a = agg[key]
            a[0] += 1
            a[1] += int(math.floor(v * 1000 + 0.5))
            a[2].add(u)
    rows = all_queries()["q_with_totals"](spark, sf_dir).collect()
    for r in rows:
        a = agg[r.event_type if not r.is_total else ""]
        assert (r.n_events, r.sum_vm, r.n_users) == (a[0], a[1], len(a[2]))
    totals = [r for r in rows if r.is_total == 1]
    assert len(totals) == 1 and totals[0].event_type == ""
    # distinct-user totals really re-aggregate (strictly less than the
    # per-group sum when users span types)
    assert totals[0].n_users <= sum(r.n_users for r in rows if not r.is_total)
