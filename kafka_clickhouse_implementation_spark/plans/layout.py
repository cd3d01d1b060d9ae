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

import os

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
    """Append one insert-block's partial counts (the MV body,
    kafka+clickhouse.md:221-229): per-(day, level) count of the *batch*,
    not a global aggregate — exactly ClickHouse's per-insert-block MV
    trigger semantics. For the streaming foreachBatch sink use
    ``write_rollup_batch`` instead — blind appends are not retry-safe."""
    (
        batch_df.groupBy(day_col, level_col)
        .agg(F.count(F.lit(1)).alias("total"))
        .write.mode("append")
        .parquet(path)
    )


def write_rollup_batch(
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    day_col: str = "day",
    level_col: str = "level",
) -> None:
    """Idempotent per-batch MV sink — the standard foreachBatch
    exactly-once pattern: each batch's partials land in a
    batch_id-keyed subdirectory with overwrite mode, so a batch retried
    after a crash between the write and the checkpoint commit REPLACES
    its previous (possibly partial) output instead of double-appending
    it. ``read_rollup`` picks the subdirectories up recursively."""
    (
        batch_df.groupBy(day_col, level_col)
        .agg(F.count(F.lit(1)).alias("total"))
        # partials are days x levels rows per batch regardless of input
        # volume — one output file beats 32 near-empty ones (the small-
        # files problem is the reader's bottleneck, not the writer's)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path.rstrip('/')}/batch-{batch_id:010d}")
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Read-time re-aggregation — the SummingMergeTree reader contract
    (sum over possibly-unmerged partials, kafka+clickhouse.md:240-243,
    464-468). recursiveFileLookup tolerates any mix of flat partial
    files, per-batch subdirectories, and compacted output."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(path)
        .groupBy("day", "level")
        .agg(F.sum("total").alias("total"))
    )


def _swap_names(path: str) -> tuple[str, str, str]:
    p = path.rstrip("/")
    return p + "__compact_old", p + "__compact_tmp", p + "__swap_started"


def _parked_dirs(path: str) -> list[str]:
    """Parked-remnant directories: committed rows that may not be in
    `path` yet. Invariant: a parked dir is deleted ONLY after a swap
    that folded its rows into the new `path` has fully completed."""
    import glob

    return sorted(glob.glob(path.rstrip("/") + "__compact_parked_*"))


def _next_parked(path: str) -> str:
    parked = _parked_dirs(path)
    n = 1 + max((int(p.rsplit("_", 1)[1]) for p in parked), default=-1)
    return path.rstrip("/") + f"__compact_parked_{n:03d}"


def _recover_swap(path: str) -> None:
    """Repair any crash state a previous `_swap_in` left behind. Run
    before reading `path` for a new compaction.

    The marker file is the commit record: it is touched only AFTER the
    merged `tmp` is fully written AND `path` has been renamed aside —
    so marker-present means tmp is complete and is a superset of the
    old dir and of every parked dir on disk. Marker-absent means every
    committed row is still reachable at `path`/`old`/parked, and `tmp`
    (possibly half-written) is discardable."""
    import shutil

    old, tmp, marker = _swap_names(path)
    if os.path.exists(marker):
        # Every parked dir on disk predates the tmp write (parking
        # happens only here, which runs before the merge), so each was
        # folded into tmp — their rows are duplicates of tmp's and MUST
        # be dropped once tmp's content is durable, or the additive
        # rollup would double-count them at the next merge.
        stale = _parked_dirs(path)
        if os.path.exists(tmp):
            if not os.path.exists(path):
                os.rename(tmp, path)  # crash between the two renames: finish
            else:
                # the writer recreated `path` with NEW rows meanwhile;
                # tmp still holds the only fold of old+parked — park it
                # (it will be folded by the merge below, deleted after
                # the next successful swap)
                os.rename(tmp, _next_parked(path))
        # tmp missing → the swap-in completed; `path` ⊇ everything.
        shutil.rmtree(old, ignore_errors=True)
        for p in stale:
            shutil.rmtree(p, ignore_errors=True)
        os.remove(marker)
    else:
        # un-committed merge output: all of its rows are still on disk
        # at path/old/parked, so it is safe to discard
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(old):
            if not os.path.exists(path):
                os.rename(old, path)  # crash right after path was moved
            else:
                # defensive (legacy crash shape): park for folding
                os.rename(old, _next_parked(path))


def _swap_in(path: str, tmp: str, folded: list[str]) -> None:
    """Replace `path` with the fully-written `tmp` via two renames plus
    a marker commit record — never deleting any directory before its
    rows are durably inside the new `path`. Local-fs rename is atomic;
    on HDFS this maps to FileSystem.rename, on object stores to a
    manifest commit (e.g. a table format's atomic metadata swap).

    `folded` lists the parked dirs whose rows the caller merged into
    `tmp`; they are removed only after the swap-in rename succeeds.
    Crash at ANY point here is repaired by `_recover_swap` — the parked
    rows' durable copy is `old`/parked before the marker is touched and
    `tmp` after. A concurrent reader can still observe the brief
    missing-path gap; single-writer semantics (see compact_rollup) are
    the contract."""
    import shutil

    old, _tmp_name, marker = _swap_names(path)
    os.rename(path, old)
    with open(marker, "w"):
        pass  # commit point: tmp is complete and path is parked at old
    try:
        os.rename(tmp, path)
    except BaseException as swap_err:
        try:
            os.rename(old, path)  # roll back so the table never disappears
            os.remove(marker)
        except OSError as rollback_err:
            # marker stays: the next _recover_swap completes the swap
            # from tmp, which holds every committed row
            raise RuntimeError(
                f"compaction swap failed AND rollback failed; data parked at {old}"
            ) from rollback_err
        raise swap_err
    shutil.rmtree(old, ignore_errors=True)
    for p in folded:
        shutil.rmtree(p, ignore_errors=True)
    os.remove(marker)


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Background-merge analogue: rewrite the partials as fully-merged
    sums (kafka+clickhouse.md:396-401). Optional; readers are correct
    without it, it just bounds the partials file count.

    The merged output is written to a temporary sibling directory and
    swapped in via rename — overwriting the path the plan reads from
    (the previous design) relied on cache(), and cached blocks are not
    fault-tolerant: an executor loss mid-overwrite would recompute from
    already-deleted files.

    Concurrency contract: compaction must NOT run while a streaming
    batch that may still be RETRIED is writing — folding a batch subdir
    whose checkpoint has not committed would break write_rollup_batch's
    idempotence (the retried batch would re-add already-compacted
    partials). Run it from the single writer between committed batches
    (e.g. in foreachBatch after the sink write), never from a second
    process.

    Crash recovery: `_recover_swap` repairs any interrupted previous
    swap (restoring or parking remnants), then every parked dir is
    folded into this merge and deleted only after the new path is
    durably in place — no committed row is ever lost, and no row is
    ever double-counted (parked dirs and `path` are always disjoint row
    sets: a dir is parked precisely when its rows are NOT in the
    recreated `path`)."""
    _recover_swap(path)
    parked = _parked_dirs(path)
    src = spark.read.option("recursiveFileLookup", "true").parquet(path)
    for p in parked:
        src = src.unionByName(
            spark.read.option("recursiveFileLookup", "true").parquet(p)
        )
    merged = src.groupBy("day", "level").agg(F.sum("total").alias("total"))
    _, tmp, _ = _swap_names(path)
    merged.write.mode("overwrite").parquet(tmp)
    _swap_in(path, tmp, folded=parked)


def expire_partitions(path: str, keep_from, partition_col: str = "event_date") -> list[str]:
    """TTL retention for the day-partitioned fact table (ClickHouse
    ``TTL event_time + INTERVAL n DAY DELETE`` analogue): drop whole
    partition directories with ``<partition_col>`` lexicographically
    below ``keep_from`` (yyyyMMdd strings order correctly).

    This is the reason the fact table is day-partitioned at 100 TB:
    retention is an O(#expired-partitions) directory delete — no scan,
    no rewrite, no tombstone compaction. Returns the dropped partition
    values (for the audit log a production system would write).
    """
    import shutil

    keep_from = str(keep_from)  # Spark reads yyyyMMdd partition values back as ints
    dropped = []
    prefix = partition_col + "="
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        if name[len(prefix):] < keep_from:
            shutil.rmtree(os.path.join(path, name))
            dropped.append(name[len(prefix):])
    return dropped


def detach_partition(path: str, value, partition_col: str = "event_date") -> str:
    """ClickHouse ``ALTER TABLE ... DETACH PARTITION`` analogue: move
    the partition directory into the table's ``_detached/`` subdir —
    Spark readers skip underscore-prefixed directories, so the
    partition disappears from every read WITHOUT a scan or rewrite
    (exactly ClickHouse's detached/ semantics: an O(1) rename). Returns
    the detached directory name. Raises FileNotFoundError if the
    partition does not exist."""
    name = f"{partition_col}={value}"
    src = os.path.join(path, name)
    if not os.path.isdir(src):
        raise FileNotFoundError(src)
    dst_root = os.path.join(path, "_detached")
    os.makedirs(dst_root, exist_ok=True)
    os.rename(src, os.path.join(dst_root, name))
    return name


def attach_partition(path: str, value, partition_col: str = "event_date") -> str:
    """``ALTER TABLE ... ATTACH PARTITION``: move a previously detached
    partition back into the table — again one rename, no data
    movement."""
    name = f"{partition_col}={value}"
    src = os.path.join(path, "_detached", name)
    if not os.path.isdir(src):
        raise FileNotFoundError(src)
    os.rename(src, os.path.join(path, name))
    return name
