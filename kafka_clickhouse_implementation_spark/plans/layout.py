"""Physical table layouts — the MergeTree/SummingMergeTree analogues.

The reference declares its physical design in DDL
(kafka+clickhouse.md:101-103, 205-211); here it is a parquet lakehouse
layout:

- ``write_day_partitioned``: PARTITION BY toYYYYMMDD(event_time) +
  ORDER BY (key, event_time) becomes ``partitionBy(day)`` +
  ``sortWithinPartitions`` so (a) Catalyst prunes whole day directories
  for date predicates and (b) parquet row-group min/max stats skip
  granules for key-prefix predicates — the sparse-primary-index
  approximation from SURVEY §4.

- ``append_rollup_partials`` / ``read_rollup``: the SummingMergeTree
  contract (kafka+clickhouse.md:396-401). Partial per-batch counts are
  *appended*; readers must re-aggregate (sum over equal (day, level)),
  exactly like reading an unmerged SummingMergeTree
  (kafka+clickhouse.md:240-243). ``compact_rollup`` plays the role of
  the background merge.

At 100 TB: day-partitioning bounds every daily query to ~1/365 of the
data; sortWithinPartitions costs one in-partition sort at write time and
no shuffle; rollup partials are tiny (days × levels × batches) so the
read-time re-agg is O(rollup), never O(raw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_day_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_keys: tuple[str, ...] = ("user_id",),
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Write a day-partitioned, within-partition-sorted parquet fact table.

    Mirrors ``PARTITION BY toYYYYMMDD(event_time) ORDER BY (campaign_id,
    event_time)`` (kafka+clickhouse.md:101-103).
    """
    out = df.withColumn(partition_col, F.date_format(F.col(ts_col), "yyyyMMdd"))
    # repartition on the partition column first so each day is written by
    # few tasks (avoids the small-files explosion a 1000-executor write
    # would otherwise produce), then sort within partitions for row-group
    # stat locality on the sort keys.
    out = (
        out.repartition(partition_col)
        .sortWithinPartitions(*sort_keys, ts_col)
        .write.mode(mode)
        .partitionBy(partition_col)
    )
    out.parquet(path)


def read_day_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_rollup_partials(batch_df: DataFrame, path: str, day_col: str = "day", level_col: str = "level") -> None:
    """Append one micro-batch's partial counts (the MV body,
    kafka+clickhouse.md:221-229): per-(day, level) count of the *batch*,
    not a global aggregate — exactly ClickHouse's per-insert-block MV
    trigger semantics."""
    (
        batch_df.groupBy(day_col, level_col)
        .agg(F.count(F.lit(1)).alias("total"))
        .write.mode("append")
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Read-time re-aggregation — the SummingMergeTree reader contract
    (sum over possibly-unmerged partials, kafka+clickhouse.md:240-243,
    464-468)."""
    return (
        spark.read.parquet(path)
        .groupBy("day", "level")
        .agg(F.sum("total").alias("total"))
    )


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Background-merge analogue: rewrite the partials as fully-merged
    sums (kafka+clickhouse.md:396-401). Optional; readers are correct
    without it, it just bounds the partials file count."""
    merged = read_rollup(spark, path)
    # Materialize before overwrite — the plan reads the same path.
    merged.cache()
    merged.count()
    merged.write.mode("overwrite").parquet(path)
    merged.unpersist()
