"""PySpark-native analytics engine with the capabilities of the reference
Kafka → ClickHouse campaign-analytics pipeline
(KashifTechie/kafka-clickhouse-implementation, surveyed in SURVEY.md).

Built Spark-first: DataFrame/SQL for the batch query surface, Structured
Streaming for the ingest/materialized-view path, Parquet day-partitioned
layout for the fact table, and read-time re-aggregation for the
SummingMergeTree-style rollup contract.

Nothing here is a port; the reference (a design doc with embedded
Python/SQL, /root/reference/kafka+clickhouse.md) defines WHAT is
computed, Spark idiom defines HOW.
"""

from kafka_clickhouse_implementation_spark.registry import (  # noqa: F401
    all_oracles,
    all_queries,
    query,
)

__version__ = "0.1.0"
