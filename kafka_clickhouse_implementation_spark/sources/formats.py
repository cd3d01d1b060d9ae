"""Batch source-format coverage beyond parquet — CSV and ORC
round-trips, differentially checked.

The reference's only batch surface is ClickHouse native tables fed by
JSONEachRow (kafka+clickhouse.md:183-194); a Spark user of the same
pipeline immediately gets every built-in DataSource. These queries
prove the two most common interchange formats preserve the events
table byte-faithfully: Spark WRITES the format, reads it back with an
EXPLICIT schema (no inference — the reference's fixed-DDL discipline,
SURVEY §1.2), aggregates, and DuckDB checks the same aggregates against
the ORIGINAL parquet — any loss, reorder, quoting, or type-mapping bug
in either direction breaks the equality.

Timestamps ride as epoch-micros longs in the interchange files (CSV
has no canonical timestamp syntax; micros round-trip exactly), and the
checked aggregates are order-free integer stats (count / min / max /
bigint sums), so the equality is exact regardless of file split and
row order.

Scale: both writers repartition(4) only to exercise multi-file reads;
production writes inherit the upstream partitioning. The aggregate is
one map-side-combined hash agg either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

_EVENTS_WIRE_SCHEMA = (
    "event_id long, e_us long, user_id long, event_type string"
)

_ROUNDTRIP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_us,
       CAST(sum(user_id) AS BIGINT) AS sum_uid,
       CAST(sum(event_id) AS BIGINT) AS sum_eid
FROM events GROUP BY event_type
"""


def _fmt_base(sf_dir: str, fmt: str) -> str:
    from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir

    return source_tagged_dir(f"fmt_{fmt}", sf_dir, "events")


def _events_wire_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("e_us"),
        "user_id",
        "event_type",
    )


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("e_us").alias("min_us"),
        F.max("e_us").alias("max_us"),
        F.sum("user_id").alias("sum_uid"),
        F.sum("event_id").alias("sum_eid"),
    )


@query("q_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-tier source coverage: events → multi-file CSV (header, Spark
    writer) → explicit-schema CSV read → per-type integer stats. The
    oracle aggregates the original parquet, so the whole write+read
    path is under the value hash."""
    out = _fmt_base(sf_dir, "csv")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            _events_wire_df(spark, sf_dir)
            .repartition(4)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(out)
        )
    back = (
        spark.read.schema(_EVENTS_WIRE_SCHEMA)
        .option("header", "true")
        .csv(out)
    )
    return _roundtrip_agg(back)


@query("q_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract over ORC (the other columnar interchange format a
    ClickHouse migration usually has lying around)."""
    out = _fmt_base(sf_dir, "orc")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            _events_wire_df(spark, sf_dir)
            .repartition(4)
            .write.mode("overwrite")
            .orc(out)
        )
    back = spark.read.schema(_EVENTS_WIRE_SCHEMA).orc(out)
    return _roundtrip_agg(back)
