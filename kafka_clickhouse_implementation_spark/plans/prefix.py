"""Distributed prefix aggregation — global running sums / row numbers
without a single-partition window.

``sum(x) OVER (ORDER BY k)`` with no PARTITION BY is the classic Spark
scale cliff: WindowExec logs "No Partition Defined" and funnels every
row through ONE task. The standard fix (Spark core uses the same shape
inside ``RDD.zipWithIndex``) is:

1. range-shuffle the rows on the total-order key (P ordered partitions),
2. compute each partition's local running aggregate with a window
   PARTITIONED by the physical partition id,
3. collect one (count, sum) row PER PARTITION to the driver — P rows of
   metadata, never data — prefix-sum those, and broadcast-join the base
   offsets back.

Exactness requires the order key to be a total order (unique overall);
both call sites here use unique keys (doc_id; (n DESC, token)). The
ranged intermediate is localCheckpoint-ed so the offset pass and the
output pass see the identical partition assignment even under AQE
replanning.

Fault model at cluster scale: localCheckpoint blocks are not
fault-tolerant — losing an executor after materialization fails the
job (lineage is truncated, recompute is impossible), which is
FAIL-STOP, never silently inconsistent offsets; the retry recomputes
both passes from the source. A long-running production pipeline would
swap in `spark.sparkContext.setCheckpointDir` + `checkpoint()` for
replicated blocks at the cost of a persisted copy.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"


def ranged_prefix(
    df: DataFrame,
    order_exprs: Sequence[Column],
    sum_cols: Mapping[str, str] | None = None,
    rn_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add exact GLOBAL running aggregates over a total order.

    order_exprs
        Sort expressions defining the total order; must be unique
        overall (ties that straddle a range boundary would make the
        per-partition decomposition ambiguous).
    sum_cols
        ``{out_col: value_col}`` — each out_col gets the inclusive
        global running sum of value_col in the given order (BIGINT).
    rn_col
        Optional output column for the global 1-based row number.

    Plan shape: one range Exchange, one partitioned window, one
    broadcast join against a P-row offset table. The only driver
    traffic is P (count, sum) rows — #partitions, not #rows.
    """
    sum_cols = dict(sum_cols or {})
    spark = df.sparkSession
    if num_partitions:
        p = num_partitions
    else:
        try:
            # non-numeric on some platforms (e.g. "auto" under advanced
            # adaptive shuffle) — fall back to the cluster's parallelism
            p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            p = spark.sparkContext.defaultParallelism
    # lazy: the offsets collect below is the first action and
    # materializes the checkpoint — one job instead of two; the output
    # pass then reuses the frozen blocks (and the frozen pid values)
    ranged = (
        df.repartitionByRange(p, *order_exprs)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    value_cols = sorted(set(sum_cols.values()))
    per_part = {
        r[_PID]: r
        for r in ranged.groupBy(_PID)
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).cast("long").alias(f"__s_{c}") for c in value_cols],
        )
        .collect()  # ≤ P rows — partition metadata, the zipWithIndex pattern
    }
    offsets = []
    rn_acc = 0
    sum_acc = dict.fromkeys(value_cols, 0)
    for pid in sorted(per_part):
        offsets.append((pid, rn_acc, *[sum_acc[c] for c in value_cols]))
        rn_acc += per_part[pid]["__n"]
        for c in value_cols:
            sum_acc[c] += per_part[pid][f"__s_{c}"] or 0
    schema = f"{_PID} int, __base_rn long" + "".join(
        f", __base_{c} long" for c in value_cols
    )
    base = spark.createDataFrame(offsets or [(0, 0, *[0] * len(value_cols))], schema)

    w = Window.partitionBy(_PID).orderBy(*order_exprs)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = ranged.join(F.broadcast(base), _PID)
    for out_col, val_col in sum_cols.items():
        out = out.withColumn(
            out_col,
            (F.sum(val_col).over(wf).cast("long") + F.col(f"__base_{val_col}")),
        )
    if rn_col is not None:
        out = out.withColumn(
            rn_col, F.row_number().over(w).cast("long") + F.col("__base_rn")
        )
    drop = [_PID, "__base_rn"] + [f"__base_{c}" for c in value_cols]
    return out.drop(*drop)
