"""Non-vacuousness guards for the driver-checked watermark queries
(streaming/watermark.py): the oracle equivalence is only meaningful if
late rows are actually dropped and both expiry classes actually occur.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.streaming.watermark import (
    TRUNCATE_DAYS_US,
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
    # The expired population is exactly the cohort users the wire
    # still CONTAINS: a cohort user whose every event falls inside the
    # final 12 days is removed from the wire entirely, never emits
    # state, and cannot expire — so count only cohort users with at
    # least one event at or before the truncation horizon.
    n_expired = sum(r["n_users"] for r in rows if r["expired"])
    ev = load(spark, sf_dir, "events")
    mx_us = ev.agg(F.max(F.unix_micros("ts"))).first()[0]
    users = (
        ev.filter(
            (F.col("user_id") % 7 == 3)
            & (F.unix_micros("ts") <= mx_us - TRUNCATE_DAYS_US)
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_expired == users


def test_available_now_watermark_lag_is_two_batches(spark, tmp_path):
    """Pins the lag-2 global-watermark behavior (the watermark applied
    while processing batch k derives from max event-time over batches
    <= k-2) that streaming/watermark.py's oracles hard-code. It is an
    undocumented Spark implementation detail under Trigger.AvailableNow;
    if a Spark upgrade shifts it to lag-1, THIS probe fails and points
    at the assumption, instead of every q_stream_late_drop driver row
    failing at once."""
    import json
    import os
    import time

    H = 3_600_000_000  # one hour in microseconds
    # batch k: 0=anchor row in [10h,11h) window; 1=advance max event
    # time to 20h; 2=late candidate back in [10h,11h); 3,4=flush rows
    # so the final watermark passes 11h and append emits the window.
    rows = [10 * H + 30_000_000, 20 * H, 10 * H + 40_000_000, 40 * H, 50 * H]
    wire = tmp_path / "wire"
    wire.mkdir()
    now = time.time()
    for i, us in enumerate(rows):
        p = wire / f"chunk-{i:02d}.json"
        p.write_text(json.dumps({"e_us": us}) + "\n")
        os.utime(p, (now + 10 * i, now + 10 * i))
    counts = (
        spark.readStream.schema("e_us long")
        .option("maxFilesPerTrigger", "1")
        .json(str(wire))
        .select(F.timestamp_micros("e_us").alias("ts"))
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_lag_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "watermark probe stream did not drain"
    ten = [
        r["count"]
        for r in spark.table("wm_lag_probe").collect()
        if r["w"]["start"].hour == 10
    ]
    # Under lag-2 the batch carrying the late row still runs with the
    # 10:00:30 watermark (batches <= 0), so the row is KEPT: count 2.
    # Under lag-1 the watermark would already be 20:00 and the row
    # dropped: count 1 — the signature of the assumption breaking.
    assert ten == [2], (
        f"[10h,11h) window counts {ten}: AvailableNow watermark lag is no "
        "longer 2 batches - update streaming/watermark.py's oracle model"
    )
