"""Streaming vector ingest into a static IVF index (round 6, C119):
the index-BUILD half of the vector-store story, next to the batch
IVF query path (operators/clustering.q_ann_ivf_exact).

Production vector stores train a coarse quantizer offline and then
stream new vectors through it: each arriving vector is coded by its
nearest centroid (a pure projection against the broadcast codebook)
and appended to that inverted list. Here the codebook is the
deterministic Lloyd run's FINAL centroids, embedded as a literal
array-of-arrays expression, so the per-row coding is a stateless
whole-stage-codegen projection — argmin over k int distances with the
first-match tie rule (array_position returns the first index, and the
literal is ordered by ascending cid, reproducing min(dist, cid)).
The only streaming STATE is the per-list aggregate (k rows), folded
across micro-batches by a plain complete-mode aggregation.

The DuckDB oracle replays the Lloyd trajectory (shared CTE builder)
and assigns every vector to the FINAL centroid set — so the hash
match certifies codebook, coding rule, and cross-batch accumulation
together.

Scale: coding is O(k·d) per vector with zero shuffle; state is k
rows regardless of stream length — the sketch-tier property again.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.clustering import (
    ITERS,
    K,
    _lloyd,
    _lloyd_ctes,
    _QUANT,
)
from kafka_clickhouse_implementation_spark.registry import query
from kafka_clickhouse_implementation_spark.streaming.funnel import _drain

_IVF_INGEST_ORACLE = f"""
WITH {_lloyd_ctes()},
dF AS (
  SELECT p.vec_id, c.cid, CAST(sum((p.x - c.x) * (p.x - c.x)) AS BIGINT) AS dist
  FROM pts p JOIN cent{ITERS} c ON p.dim = c.dim
  GROUP BY p.vec_id, c.cid
),
mdF AS (SELECT vec_id, min(dist) AS md FROM dF GROUP BY vec_id),
asgF AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM dF d JOIN mdF m ON d.vec_id = m.vec_id AND d.dist = m.md
  GROUP BY d.vec_id
)
SELECT cid AS list_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec_ids,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM asgF GROUP BY cid
"""


def embedding_wire(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """JSON replay of `embeddings` with the micro-quantized vector as
    an array of longs (JSON round-trips longs losslessly; the floats
    never cross the wire). 4 files → 4 micro-batches."""
    from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir

    base = source_tagged_dir("vecwire", sf_dir, "embeddings")
    wire_dir = os.path.join(base, "wire")
    if not os.path.exists(os.path.join(wire_dir, "_SUCCESS")):
        emb = load(spark, sf_dir, "embeddings")
        (
            emb.select(
                "vec_id", F.expr(f"transform(embedding, x -> {_QUANT})").alias("eq")
            )
            .repartitionByRange(4, "vec_id")
            .write.mode("overwrite")
            .json(wire_dir)
        )
    return wire_dir, base


@query("q_stream_ivf_ingest", oracle=_IVF_INGEST_ORACLE)
def q_stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the embeddings table through the static IVF coarse
    quantizer (the batch Lloyd run's final centroids as a literal
    codebook): per arriving vector, one stateless projection computes
    all k integer distances and picks the first argmin; a complete-
    mode streaming aggregation folds per-list populations and
    membership checksums across 4 micro-batches. Must hash-match the
    oracle's batch assignment of every vector to the final centroid
    set — certifying that streaming ingest builds exactly the index
    the batch build would."""
    _, _, cents = _lloyd(spark, sf_dir)
    # cents rows are (cid, dim, x); order the literal by ascending cid
    # so array_position's first-match tie rule == min(dist, cid)
    by_cid: dict[int, dict[int, int]] = {}
    for cid, dim, x in cents:
        by_cid.setdefault(cid, {})[dim] = x
    cids = sorted(by_cid)
    arrs = ", ".join(
        "array(" + ", ".join(f"{by_cid[c][d]}L" for d in sorted(by_cid[c])) + ")"
        for c in cids
    )
    cid_arr = "array(" + ", ".join(str(c) for c in cids) + ")"
    # single-pass argmin: zip_with pairs each centroid's distance with
    # its cid as a struct and array_min orders (d, c) lexicographically
    # — min dist, tie → smallest cid — with every distance evaluated
    # exactly once (HOFs are CodegenFallback: the previous form, which
    # repeated the transform inside array_position AND array_min, ran
    # the k·64 distance work twice per row — r6 ADVICE fix)
    code_expr = (
        f"array_min(zip_with(array({arrs}), {cid_arr}, (ca, c) -> "
        "named_struct('d', aggregate(zip_with(eq, ca, "
        "(p, q) -> (p - q) * (p - q)), 0L, (s, v) -> s + v), 'c', c))).c"
    )
    wire, base = embedding_wire(spark, sf_dir)
    ckpt = os.path.join(base, "ckpt_ivf_ingest")
    vecs = (
        spark.readStream.schema("vec_id long, eq array<long>")
        .option("maxFilesPerTrigger", "1")
        .json(wire)
        .select("vec_id", F.expr(code_expr).cast("long").alias("list_id"))
    )
    lists = vecs.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("vec_id").cast("long").alias("sum_vec_ids"),
        F.min("vec_id").alias("min_vec_id"),
    )
    name = "stream_ivf_lists"
    _drain(spark, lists, name, ckpt, mode="complete")
    return spark.table(name).select(
        "list_id", "n_vecs", "sum_vec_ids", F.col("min_vec_id").cast("long").alias("min_vec_id")
    )
