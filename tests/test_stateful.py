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


def test_parquet_sink_appends(spark, tmp_path):
    path = str(tmp_path / "sink")
    sink = parquet_sink(path)
    df = spark.range(10).withColumnRenamed("id", "x")
    sink(df, 0)
    sink(df, 1)
    assert spark.read.parquet(path).count() == 20
