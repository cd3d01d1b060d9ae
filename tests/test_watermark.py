"""Non-vacuousness guards for the driver-checked watermark queries
(streaming/watermark.py): the oracle equivalence is only meaningful if
late rows are actually dropped and both expiry classes actually occur.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.streaming.watermark import (
    q_stream_funnel_ttl,
    q_stream_late_drop,
)


def test_late_drop_actually_drops(spark, sf_dir):
    out = q_stream_late_drop(spark, sf_dir)
    kept = out.agg(F.sum("total")).first()[0]
    total = load(spark, sf_dir, "events").count()
    assert 0 < kept < total, f"kept {kept} of {total}: no rows were late-dropped"


def test_funnel_ttl_has_both_classes(spark, sf_dir):
    rows = q_stream_funnel_ttl(spark, sf_dir).collect()
    expired = {r["expired"] for r in rows}
    assert expired == {True, False}, f"expiry split is vacuous: {rows}"
    # the truncated cohort is exactly the expired population
    n_expired = sum(r["n_users"] for r in rows if r["expired"])
    users = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 7 == 3)
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_expired == users
