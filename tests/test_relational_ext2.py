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
