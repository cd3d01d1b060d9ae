"""Streaming twin of the statistical aggregates (round 5, late batch):
``q_stream_entropy`` — Shannon entropy maintained incrementally.

Like the Bloom twin (bloom_stream.py), no custom state machine is
needed: the sufficient statistic for entropy is the (cohort,
event_type) count table, which a PLAIN streaming aggregation in
complete mode keeps in the state store and folds every micro-batch
into. The quantized-ln finish (analytics_ext.q_entropy) then runs as a
tiny batch computation over the drained counts — the classic
two-phase ``-State`` (streaming counts) / ``-Merge`` (closed-form
finish) split, with the batch oracle reused VERBATIM because counts
are order-independent sums.

State size: #cohorts x #event_types counters (50 rows here; bounded by
the key-domain product, not the stream length).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
    _ENTROPY_ORACLE,
)
from kafka_clickhouse_implementation_spark.registry import query
from kafka_clickhouse_implementation_spark.streaming.funnel import (
    _drain,
    ordered_event_wire,
    wire_stream,
)


@query("q_stream_entropy", oracle=_ENTROPY_ORACLE)
def q_stream_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type distribution per user cohort,
    computed from STREAMED counts: the events wire replays over 4
    micro-batches (maxFilesPerTrigger=1) and a complete-mode streaming
    aggregation accumulates the (cohort, event_type) counts in the
    state store; the nano-quantized ln finish runs over the drained
    table and must hash-match the batch q_entropy oracle exactly —
    counts are order-independent, so batch boundaries cannot change
    the answer, only lost state could."""
    wire, base = ordered_event_wire(spark, sf_dir)
    ckpt = os.path.join(base, "ckpt_entropy")
    counts_stream = (
        wire_stream(spark, wire, max_files_per_trigger=1)
        .groupBy((F.col("user_id") % 10).alias("cohort"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    name = "stream_entropy_counts"
    _drain(spark, counts_stream, name, ckpt, mode="complete")

    # localCheckpoint: the totals join is a self-join of the memory
    # sink's view, whose MemoryPlan leaves can't be deduplicated by the
    # analyzer (INTERNAL_ERROR: conflicting references); checkpointing
    # cuts the lineage. 50 rows — cost is nil.
    counts = spark.table(name).localCheckpoint()
    tot = counts.groupBy("cohort").agg(F.sum("c").cast("long").alias("total"))
    terms = counts.join(F.broadcast(tot), "cohort").select(
        "cohort",
        "total",
        (
            F.col("c")
            * F.floor(
                F.log(F.col("c").cast("double") / F.col("total").cast("double"))
                * F.lit(1e9)
            ).cast("long")
        ).alias("term"),
    )
    return terms.groupBy("cohort").agg(
        F.max("total").cast("long").alias("n_events"),
        (
            -F.sum("term").cast("double")
            / (F.max("total").cast("double") * F.lit(1e9))
        ).alias("entropy_nats"),
    )
