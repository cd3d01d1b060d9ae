"""Bucketed tables — co-located joins without a shuffle.

The 100 TB answer to repeated fact⋈fact joins on the same key: write
both sides bucketed (hash-partitioned on disk) on the join key with the
same bucket count; Spark's bucketed scan then feeds a sort-merge join
with NO Exchange on either side — the shuffle was paid once at write
time and amortizes over every subsequent join.

Uses the session catalog (in-memory + spark.sql.warehouse.dir parquet);
no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the Sort below a
    sort-merge join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    physical plan contains no Exchange under the join."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
