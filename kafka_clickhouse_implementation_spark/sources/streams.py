"""Pluggable streaming sources — the reference's ingest boundary.

The reference consumes the `campaign.event_tracking` topic two ways: a
Python poll loop (kafka+clickhouse.md:127-143) and a ClickHouse
Kafka-engine table (kafka+clickhouse.md:183-194). In Spark both are the
same thing: a streaming DataFrame from the Kafka source, decoded with
``from_json`` against the declared wire schema (JSONEachRow ≙ one JSON
object per message).

Because the test environment has no broker, the source is pluggable
(SURVEY §7 risk list): ``kafka`` (production), ``file`` (hermetic
replay of the same wire format), ``rate`` (synthetic load). The
downstream pipeline is identical for all three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.config import KAFKA_SETTINGS
from kafka_clickhouse_implementation_spark.schemas import QUEUE_WIRE_SCHEMA


def kafka_stream(spark: SparkSession, topic_key: str = "event_tracking") -> DataFrame:
    """The Kafka-engine-table analogue (kafka+clickhouse.md:183-194):
    subscribe to the registry topic, earliest offsets (matching
    'auto.offset.reset': 'earliest', kafka+clickhouse.md:130), decode
    JSONEachRow against the declared schema. Consumer-group offset
    tracking (kafka_group_name, :193) is replaced by the checkpoint
    location the caller passes to writeStream."""
    topic = KAFKA_SETTINGS["topics"][topic_key]
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_SETTINGS["bootstrap_servers"])
        .option("subscribe", topic)
        .option("startingOffsets", KAFKA_SETTINGS["starting_offsets"])
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), QUEUE_WIRE_SCHEMA).alias("j")
    ).select("j.*")


def file_stream(spark: SparkSession, json_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Hermetic replay source: JSON-lines files in the reference wire
    format (timestamp epoch-sec, level, message — FIXTURES.md §C),
    decoded against the same declared schema (never inferSchema on a
    streaming path)."""
    reader = spark.readStream.schema(QUEUE_WIRE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(json_dir)


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source shaped to the wire schema."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    levels = F.array(*[F.lit(x) for x in ("click", "error", "purchase", "signup", "view")])
    return raw.select(
        F.unix_timestamp("timestamp").alias("timestamp"),
        F.element_at(levels, (F.col("value") % 5 + 1).cast("int")).alias("level"),
        F.concat(F.lit('{"k": '), (F.col("value") % 100).cast("string"), F.lit("}")).alias("message"),
    )


def get_stream(spark: SparkSession, source: str | None = None, **kw) -> DataFrame:
    if source is None:
        from kafka_clickhouse_implementation_spark.config import STREAM_SOURCE

        source = STREAM_SOURCE
    if source == "kafka":
        return kafka_stream(spark, **kw)
    if source == "file":
        return file_stream(spark, **kw)
    if source == "rate":
        return rate_stream(spark, **kw)
    raise ValueError(f"unknown stream source {source!r}")


def write_wire_format(events: DataFrame, out_dir: str, partitions: int = 4) -> None:
    """S1 — the producer path (kafka+clickhouse.md:38-52) without a
    broker: serialize rows to the JSONEachRow wire format. With a
    broker this exact select writes to format('kafka') instead."""
    wire = events.select(
        F.to_json(
            F.struct(
                F.unix_timestamp("ts").alias("timestamp"),
                F.col("event_type").alias("level"),
                F.coalesce(F.col("props"), F.lit("")).alias("message"),
            )
        ).alias("value")
    )
    wire.coalesce(partitions).write.mode("overwrite").text(out_dir)


def write_to_kafka(events: DataFrame, topic_key: str = "event_tracking") -> None:
    """S1 with a live broker: DataFrame → to_json(struct(*)) → Kafka.
    (Gated: requires a reachable bootstrap server.)"""
    topic = KAFKA_SETTINGS["topics"][topic_key]
    (
        events.select(F.to_json(F.struct("*")).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_SETTINGS["bootstrap_servers"])
        .option("topic", topic)
        .save()
    )
