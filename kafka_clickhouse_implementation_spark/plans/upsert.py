"""Keyed upsert into a parquet table — the ReplacingMergeTree analogue.

ClickHouse's ReplacingMergeTree keeps the latest row per sorting key
(deduplicating during background merges; readers may see unmerged
versions until then). Here the contract is made explicit, like
layout.py does for SummingMergeTree:

- ``append_versions``  — writers just append new row versions (cheap,
  no read-modify-write, safe under concurrent batches).
- ``read_latest``      — readers resolve latest-per-key with one window
  rank (the FINAL-read analogue).
- ``compact_versions`` — the background merge: rewrite keeping only the
  winners, bounding table growth.

At 100 TB: appends are blind writes; the read-time rank shuffles once
on the key; compaction runs off-peak. For heavy update rates you'd
partition by key-hash so compaction is per-partition incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def append_versions(updates: DataFrame, path: str) -> None:
    updates.write.mode("append").parquet(path)


def read_latest(
    spark: SparkSession, path: str, key_cols: tuple[str, ...], version_col: str
) -> DataFrame:
    """Latest row version per key (ties on version broken arbitrarily
    but deterministically by the remaining sort of the window — pass a
    unique version column for full determinism)."""
    df = spark.read.parquet(path)
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_versions(
    spark: SparkSession, path: str, key_cols: tuple[str, ...], version_col: str
) -> None:
    """Background-merge analogue: materialize the winners and rewrite.

    Writes to a temporary sibling and renames it over the old path —
    never overwrites the directory its own plan reads from (cache() is
    not fault-tolerant; an executor loss mid-overwrite would recompute
    from already-deleted files)."""
    from kafka_clickhouse_implementation_spark.plans.layout import _atomic_swap_dirs

    latest = read_latest(spark, path, key_cols, version_col)
    tmp = path.rstrip("/") + "__compact_tmp"
    latest.write.mode("overwrite").parquet(tmp)
    _atomic_swap_dirs(path, tmp)
