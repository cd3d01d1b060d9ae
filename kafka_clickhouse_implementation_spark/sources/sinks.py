"""Sinks — the reference's ClickHouse-insert boundary, Spark-side.

The reference lands rows two ways: per-message Python inserts
(kafka+clickhouse.md:146-153, its own docs call this path "Manual
aggregation, slower", :495) and Kafka-engine → MV inserts. Our engine
lands micro-batches:

- ``parquet_sink``    — the default lakehouse path (tested everywhere).
- ``jdbc_batch_sink`` — JDBC writes to a real ClickHouse/any-JDBC
  server (the BASELINE "Structured Streaming Kafka source + JDBC sink"
  shape). Gated: needs a reachable server + driver jar on the
  classpath, neither of which exists in the test container, so this is
  exercised only by its unit-testable option-building.

foreachBatch + batch-id idempotence gives exactly-once into both.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_JDBC_OPTIONS = {
    # ClickHouse's JDBC endpoint; numPartitions bounds parallel insert
    # connections, batchsize amortizes row-insert overhead — the exact
    # failure mode of the reference's one-row-per-insert consumer.
    "driver": "com.clickhouse.jdbc.ClickHouseDriver",
    "batchsize": "100000",
    "numPartitions": "8",
    "isolationLevel": "NONE",
}


def jdbc_options(url: str, table: str, user: str = "default", password: str = "", **extra) -> dict:
    opts = dict(DEFAULT_JDBC_OPTIONS)
    opts.update({"url": url, "dbtable": table, "user": user, "password": password})
    opts.update(extra)
    return opts


def jdbc_batch_sink(url: str, table: str, **extra) -> Callable[[DataFrame, int], None]:
    """A foreachBatch target writing each micro-batch via JDBC.

    Usage:
        events.writeStream.foreachBatch(jdbc_batch_sink(url, "email_events"))
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format("jdbc")
            .options(**jdbc_options(url, table, **extra))
            .mode("append")
            .save()
        )

    return write


def parquet_sink(path: str, partition_cols: tuple[str, ...] = ()) -> Callable[[DataFrame, int], None]:
    """foreachBatch target appending micro-batches to a parquet table."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        w = batch_df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)

    return write
