"""C151 — streaming SemDeDup: the dedup-necessity proof and the
streaming==batch membership identity.

The oracle pins max_arrivals to literal 1, so the hash check itself
certifies the dedup state collapsed the wire's injected duplicates.
These tests prove the CONVERSE half (the wire really injects
duplicates that REACH the state when dedup is removed — without this,
a broken wire would make the literal-1 pin vacuous) and that the
streaming membership equals the batch Lloyd assignment row for row."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kafka_clickhouse_implementation_spark.operators.clustering import (
    ITERS,
    _eq_arrays,
    _lloyd_arrays,
    semdedup_k,
)
from kafka_clickhouse_implementation_spark.streaming.vector_stream import (
    _stream_coded_members,
    q_stream_semantic_dedup,
)


def test_wire_duplicates_reach_state_without_dedup(spark):
    """Remove the dropDuplicates stage: every vector arrives twice
    (the dup-*.json copies), so every (cid, vec_id) group must count
    2 arrivals — proving the duplicate injection works end to end and
    the dedup state in the real query is load-bearing, not decorative."""
    nodedup = _stream_coded_members(spark, SF_DIR, dedup=False)
    arrivals = {r.n_arrivals for r in nodedup.select("n_arrivals").distinct().collect()}
    assert arrivals == {2}


def test_streaming_membership_equals_batch_assignment(spark):
    """The drained (cid, vec_id) state must equal the batch Lloyd
    final assignment exactly (same codebook, same coding rule, same
    tie-break) — with every n_arrivals == 1 under dedup."""
    members = _stream_coded_members(spark, SF_DIR, dedup=True)
    assert {r.n_arrivals for r in members.select("n_arrivals").distinct().collect()} == {1}

    eq = _eq_arrays(spark, SF_DIR).localCheckpoint()
    k = semdedup_k(eq.count())
    asg, _, _ = _lloyd_arrays(spark, eq, k, ITERS)
    got = sorted((r.cid, r.vec_id) for r in members.collect())
    want = sorted((r.cid, r.vec_id) for r in asg.collect())
    assert got == want


def test_stream_semantic_dedup_drop_set_matches_batch(spark):
    """The streaming query's per-cluster pair/drop accounting must
    equal batch q_semantic_dedup's on the clusters that have pairs
    (the streaming output additionally lists pairless clusters with
    NULL pair stats)."""
    from kafka_clickhouse_implementation_spark.operators.clustering import (
        q_semantic_dedup,
    )

    got = {
        r.cluster_id: (r.n_pairs, r.n_close, r.n_drop, r.min_dist2)
        for r in q_stream_semantic_dedup(spark, SF_DIR).collect()
        if r.n_pairs is not None
    }
    want = {
        r.cluster_id: (r.n_pairs, r.n_close, r.n_drop, r.min_dist2)
        for r in q_semantic_dedup(spark, SF_DIR).collect()
    }
    assert got == want
