"""Tests for the custom stateful operator and sink builders."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.schemas import EVENTS_SCHEMA, QUEUE_WIRE_SCHEMA
from kafka_clickhouse_implementation_spark.sources.sinks import jdbc_options, parquet_sink
from kafka_clickhouse_implementation_spark.sources.streams import write_wire_format
from kafka_clickhouse_implementation_spark.streaming.pipeline import decoded_events
from kafka_clickhouse_implementation_spark.streaming.stateful import running_level_counts


def test_jdbc_options_shape():
    opts = jdbc_options("jdbc:clickhouse://ch:8123/default", "email_events", user="u")
    assert opts["url"].startswith("jdbc:clickhouse://")
    assert opts["dbtable"] == "email_events"
    assert opts["driver"] == "com.clickhouse.jdbc.ClickHouseDriver"
    assert int(opts["batchsize"]) >= 10000  # never the reference's 1-row inserts


def test_running_level_counts_state(spark, tmp_path):
    """applyInPandasWithState keeps per-key counts across batches; the
    final state after draining all input equals the batch counts."""
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i % 3,
         ["click", "view"][i % 2], 1.0, None)
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    wire_dir = str(tmp_path / "wire")
    write_wire_format(ev, wire_dir)
    stream = spark.readStream.schema(QUEUE_WIRE_SCHEMA).option("maxFilesPerTrigger", "1").json(wire_dir)
    out = running_level_counts(decoded_events(stream))
    q = (
        out.writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    # last emitted running_total per level == total batch counts
    final = {
        r["level"]: r["running_total"]
        for r in spark.sql(
            """SELECT level, max(running_total) AS running_total
               FROM state_out GROUP BY level"""
        ).collect()
    }
    assert final == {"click": 30, "view": 30}


def test_event_wire_preserves_microseconds(spark):
    """The shared stateful-replay wire must round-trip event times at
    FULL microsecond precision (Spark's default JSON timestampFormat
    truncates to millis, which would desync the strict-> funnel state
    machine from the batch/DuckDB oracle for same-millisecond events)."""
    from kafka_clickhouse_implementation_spark.io import load
    from kafka_clickhouse_implementation_spark.streaming.funnel import (
        WIRE_SCHEMA,
        ordered_event_wire,
    )

    sf = "/root/testdata/sf0.001"
    wire_dir, _ = ordered_event_wire(spark, sf)
    back = spark.read.schema(WIRE_SCHEMA).json(wire_dir).select("event_id", "e_us")
    src = load(spark, sf, "events").select(
        "event_id", F.unix_micros("ts").alias("src_us")
    )
    joined = back.join(src, "event_id")
    assert joined.count() == src.count()
    assert joined.filter(F.col("e_us") != F.col("src_us")).count() == 0
    # the check is vacuous unless sub-millisecond precision actually occurs
    assert src.filter(F.col("src_us") % 1000 != 0).count() > 0


def test_parquet_sink_appends(spark, tmp_path):
    path = str(tmp_path / "sink")
    sink = parquet_sink(path)
    df = spark.range(10).withColumnRenamed("id", "x")
    sink(df, 0)
    sink(df, 1)
    assert spark.read.parquet(path).count() == 20
