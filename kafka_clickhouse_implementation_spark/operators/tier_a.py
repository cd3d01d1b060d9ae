"""Tier A — operators literally present in the reference (SURVEY §2.1-2.2).

Each query runs over the driver's `events` table (the stand-in for the
reference's `queue`/`email_events` stream, FIXTURES.md §B) and cites the
reference behavior it re-expresses.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.plans.layout import write_day_partitioned
from kafka_clickhouse_implementation_spark.registry import query
from kafka_clickhouse_implementation_spark.schemas import EVENT_TYPES


def daily_counts(events: DataFrame) -> DataFrame:
    """The materialized-view body (kafka+clickhouse.md:221-229):
    ``SELECT toDate(toDateTime(timestamp)) AS day, level, count() AS
    total ... GROUP BY day, level`` in Spark idiom. A4 (date bucketing)
    + A5 (count group-by) + A11 (timestamp handling).

    Scale note: a two-column group-by over the raw stream — Spark plans
    partial (map-side) aggregation before the shuffle, so the shuffle
    carries only days×levels rows per task, not the raw events.
    """
    return (
        events.select(F.to_date(F.col("ts")).alias("day"), F.col("event_type").alias("level"))
        .groupBy("day", "level")
        .agg(F.count(F.lit(1)).alias("total"))
    )


@query(
    "q_mv_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type AS level,
           count(*) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_mv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's MV `consumer` (kafka+clickhouse.md:221-229)."""
    return daily_counts(load(spark, sf_dir, "events"))


@query(
    "q_level_totals",
    oracle="""
    SELECT level, CAST(sum(total) AS BIGINT) AS total_count
    FROM (
      SELECT CAST(ts AS DATE) AS day, event_type AS level, count(*) AS total
      FROM events GROUP BY 1, 2
    ) GROUP BY level
    """,
)
def q_level_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — the dashboard read ``SELECT level, sum(total) AS total_count
    FROM daily GROUP BY level`` (kafka+clickhouse.md:240-243): read-time
    re-aggregation over the rollup."""
    daily = daily_counts(load(spark, sf_dir, "events"))
    return daily.groupBy("level").agg(F.sum("total").alias("total_count"))


@query(
    "q_summing_reaggregate",
    oracle="""
    SELECT event_type AS level, count(*) AS total FROM events GROUP BY 1
    """,
)
def q_summing_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/S6 — partial + final aggregation: per-(day,level) partial
    counts (the per-insert-block MV output) additively re-summed at read
    time must equal a one-shot global GROUP BY — the SummingMergeTree
    observable contract (kafka+clickhouse.md:229→211→243, 396-401)."""
    partials = daily_counts(load(spark, sf_dir, "events"))  # per-(day,level) partials
    return partials.groupBy("level").agg(F.sum("total").alias("total"))


@query(
    "q_opens_for_campaign",
    oracle="""
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value_r
    FROM events
    WHERE user_id = 7 AND event_type = 'click'
    ORDER BY ts DESC
    """,
)
def q_opens_for_campaign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 — the reference's raw-event dashboard read
    (kafka+clickhouse.md:161-166): project, conjunctive equality filter,
    ORDER BY event_time DESC. user_id=7 plays campaign_id, 'click'
    plays 'open'. Filter + projection push down to the parquet scan."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter((F.col("user_id") == 7) & (F.col("event_type") == "click"))
        .select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value_r"))
        .orderBy(F.col("ts").desc())
    )


@query(
    "q_ingest_roundtrip",
    oracle="""
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value_r,
           coalesce(props, '') AS props
    FROM events
    """,
)
def q_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — the consume-and-insert field mapping
    (kafka+clickhouse.md:146-153): every payload field projected through
    unchanged, metadata/props passed through as a JSON string with the
    DEFAULT '' contract (kafka+clickhouse.md:99)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value_r"),
        F.coalesce(F.col("props"), F.lit("")).alias("props"),
    )


@query(
    "q_partition_prune",
    oracle="""
    SELECT count(*) AS n_events
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — day-partitioned fact table (kafka+clickhouse.md:101-103):
    write the events through the MergeTree-analogue layout, then read
    back with a partition predicate. Catalyst prunes to the single
    matching day directory (PartitionFilters in the scan node), the
    parquet layout does the rest — same observable result as filtering
    raw, asymptotically cheaper at scale."""
    from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir

    ev = load(spark, sf_dir, "events")
    path = source_tagged_dir("fact", sf_dir, "events")
    # the layout write is idempotent per SOURCE PARQUET IDENTITY (the
    # cache tag digests size+mtime, so a testdata regeneration rebuilds
    # it): reuse an existing copy rather than rewriting per invocation
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_day_partitioned(ev, path, ts_col="ts", sort_keys=("user_id",))
    fact = spark.read.parquet(path)
    return fact.filter(F.col("event_date") == "20240115").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "q_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — JSON decode at the table boundary: the reference stringifies
    `metadata` into the table and queries into it later
    (kafka+clickhouse.md:143, 152). `get_json_object` stays JVM-side
    (no Python UDF in the hot path)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select((F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_enum_encode",
    oracle="""
    SELECT CASE event_type
             WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'purchase' THEN 3
             WHEN 'signup' THEN 4 WHEN 'view' THEN 5 ELSE 0
           END AS type_code,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_enum_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — Enum8 dictionary encoding (kafka+clickhouse.md:97): closed
    string domain → stable small-int code. Spark has no enum type; the
    contract is the code mapping + domain validation (unknown → 0)."""
    ev = load(spark, sf_dir, "events")
    code = F.lit(0)
    for name, c in sorted(EVENT_TYPES.items(), key=lambda kv: -kv[1]):
        code = F.when(F.col("event_type") == name, F.lit(c)).otherwise(code)
    return (
        ev.select(code.cast("int").alias("type_code"))
        .groupBy("type_code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_default_coalesce",
    oracle="""
    SELECT CASE WHEN coalesce(props, '{}') = '{}' THEN 'empty' ELSE 'present' END
             AS props_state,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_default_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — DEFAULT-on-missing-field: `metadata String DEFAULT ''` and
    the consumer's ``event.get('metadata', {})``
    (kafka+clickhouse.md:99, 152) become ``coalesce``."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.when(F.coalesce(F.col("props"), F.lit("{}")) == "{}", F.lit("empty"))
            .otherwise(F.lit("present"))
            .alias("props_state")
        )
        .groupBy("props_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_partition_detach",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-15'
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_detached_read,
           CAST(count(*) AS BIGINT) AS n_reattached
    FROM events
    """,
)
def q_partition_detach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-tier operations parity (round 11, C172): ClickHouse ``ALTER
    TABLE ... DETACH / ATTACH PARTITION`` over the day-partitioned fact
    layout — detach one day (an O(1) rename into ``_detached/``, which
    Spark readers skip, exactly ClickHouse's detached/ contract), prove
    reads exclude it, re-attach, prove reads are whole again. The three
    counts are materialized IN SEQUENCE around the renames (the
    mid-detach read must observe the detached state, so this result is
    assembled from three bounded scalars — model-sized by
    construction). A dedicated layout copy keeps q_partition_prune's
    shared fact cache untouched, and the attach runs in a finally so a
    failed run cannot leave the layout torn."""
    from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir
    from kafka_clickhouse_implementation_spark.plans.layout import (
        attach_partition,
        detach_partition,
        write_day_partitioned,
    )

    ev = load(spark, sf_dir, "events")
    path = source_tagged_dir("fact_ops", sf_dir, "events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_day_partitioned(ev, path, ts_col="ts", sort_keys=("user_id",))
    day = "20240115"
    # self-heal (r11 advisory): a hard kill between detach and the
    # finally-attach of a PREVIOUS run leaves the day parked in
    # _detached/ while _SUCCESS still exists, so the layout is never
    # rebuilt and detach_partition would fail forever — mirror
    # compact_versions' _recover_swap convention and re-attach first
    if os.path.isdir(os.path.join(path, "_detached", f"event_date={day}")):
        attach_partition(path, day)
    n_total = spark.read.parquet(path).count()
    detach_partition(path, day)
    try:
        n_detached_read = spark.read.parquet(path).count()
    finally:
        attach_partition(path, day)
    n_reattached = spark.read.parquet(path).count()
    return spark.createDataFrame(
        [(n_total, n_detached_read, n_reattached)],
        "n_total long, n_detached_read long, n_reattached long",
    )
