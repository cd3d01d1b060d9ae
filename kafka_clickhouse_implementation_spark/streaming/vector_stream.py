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


# ---------------------------------------------------------------------
# Streaming SemDeDup — round 10 (C151): the -State twin of C111,
# composing C119's static-codebook coding with the within-cluster pair
# frame. Vectors arrive over a DUPLICATE-INJECTING wire (each part
# file copied with a later mtime, the C138/C147 pattern — under
# maxFilesPerTrigger=1 every vector's duplicate lands in a LATER
# micro-batch), pass stateful vec_id dedup, are coded against the
# batch Lloyd run's final codebook (a stateless projection / numpy
# matmul — streaming-safe because it is stateless), and a
# complete-mode groupBy(cid, vec_id) maintains the per-cluster
# candidate MEMBERSHIP across micro-batches, counting arrivals.
#
# Certification (the adversarial-oracle stance of the CC convergence
# probe): the drained state drives the SAME within-cluster pair frame
# as batch q_semantic_dedup, and the output ALSO emits
# max(n_arrivals) per cluster, which the oracle pins to LITERAL 1 —
# remove the dedup state and the injected duplicates make it 2, a
# loud hash FAIL rather than a silently-correct membership (identical
# payloads collapse under groupBy(cid, vec_id), so membership alone
# could not prove the dedup state is load-bearing).
#
# State: dedup = one vec_id per distinct vector; membership = one
# (cid, vec_id) row per vector — linear, the C9 dedup-state class;
# the pair frame is computed POST-drain on the bounded drained table.
# ---------------------------------------------------------------------

from kafka_clickhouse_implementation_spark.operators.clustering import (  # noqa: E402
    _EQ_CTE,
    _LAST,
    _PAIR_DIST,
    _PTS_CTE,
    DUP_THRESH,
    LIT_MAX,
    SEM_BLOCK,
    _assign_np,
    _code_points,
    _dist2_arrays,
    _eq_arrays,
    _lloyd_arrays,
    _lloyd_rounds,
    semdedup_k,
)

_STREAM_SEMDEDUP_ORACLE = f"""
WITH {_PTS_CTE},
kval AS (
  SELECT greatest({K}, CAST(count(*) AS BIGINT) // {SEM_BLOCK}) AS k
  FROM embeddings
),
{_lloyd_rounds("(SELECT k FROM kval)", ITERS, "ss", "pts")},
{_EQ_CTE},
pairs AS (
  SELECT ga.cid, ga.vec_id AS va, gb.vec_id AS vb,
         CAST({_PAIR_DIST} AS BIGINT) AS dist2
  FROM asgss{_LAST} ga
  JOIN asgss{_LAST} gb ON ga.cid = gb.cid AND ga.vec_id < gb.vec_id
  JOIN eq a ON a.vec_id = ga.vec_id
  JOIN eq b ON b.vec_id = gb.vec_id
),
pagg AS (
  SELECT cid,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN dist2 < {DUP_THRESH} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_close,
         CAST(count(DISTINCT CASE WHEN dist2 < {DUP_THRESH} THEN vb END) AS BIGINT)
           AS n_drop,
         CAST(min(dist2) AS BIGINT) AS min_dist2
  FROM pairs GROUP BY cid
),
mem AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(vec_id) AS BIGINT) AS sum_vec_ids
  FROM asgss{_LAST} GROUP BY cid
)
SELECT m.cid AS cluster_id, m.n_members, m.sum_vec_ids,
       CAST(1 AS BIGINT) AS max_arrivals,
       p.n_pairs, p.n_close, p.n_drop, p.min_dist2
FROM mem m LEFT JOIN pagg p ON p.cid = m.cid
"""


def embedding_wire_dup(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The C119 embedding wire PLUS duplicate injection: every part
    file copied as a later-mtime ``dup-*.json`` (the document_wire
    mechanics — the file source processes oldest-mtime-first, so each
    vector's duplicate arrives in a LATER micro-batch and only
    cross-batch dedup state can collapse it). ``_DUP_READY`` gates
    reuse so a crash mid-injection never leaves a half-built wire."""
    import shutil

    from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir

    base = source_tagged_dir("vecwiredup", sf_dir, "embeddings")
    wire_dir = os.path.join(base, "wire")
    ready = os.path.join(wire_dir, "_DUP_READY")
    if not os.path.exists(ready):
        shutil.rmtree(wire_dir, ignore_errors=True)
        emb = load(spark, sf_dir, "embeddings")
        (
            emb.select(
                "vec_id", F.expr(f"transform(embedding, x -> {_QUANT})").alias("eq")
            )
            .repartitionByRange(4, "vec_id")
            .write.mode("overwrite")
            .json(wire_dir)
        )
        parts = sorted(
            f for f in os.listdir(wire_dir)
            if f.startswith("part-") and f.endswith(".json")
        )
        latest = max(os.path.getmtime(os.path.join(wire_dir, p)) for p in parts)
        for i, p in enumerate(parts):
            dup = os.path.join(wire_dir, f"dup-{i:05d}.json")
            shutil.copyfile(os.path.join(wire_dir, p), dup)
            stamp = latest + 60.0 + i
            os.utime(dup, (stamp, stamp))
        with open(ready, "w"):
            pass
    return wire_dir, base


def _stream_coded_members(
    spark: SparkSession, sf_dir: str, dedup: bool = True
) -> DataFrame:
    """Drain the duplicate-injecting wire through (optional) stateful
    vec_id dedup → static-codebook coding → complete-mode
    groupBy(cid, vec_id) arrival counts; returns the drained table.
    ``dedup=False`` exists ONLY for the necessity pytest, which proves
    the wire's duplicates reach the state when the dedup is removed."""
    eq = _eq_arrays(spark, sf_dir).localCheckpoint()
    k = semdedup_k(eq.count())
    _, asg_carr, _ = _lloyd_arrays(spark, eq, k, ITERS)

    wire, base = embedding_wire_dup(spark, sf_dir)
    suffix = "" if dedup else "_nodedup"
    ckpt = os.path.join(base, f"ckpt_semdedup{suffix}")
    vecs = (
        spark.readStream.schema("vec_id long, eq array<long>")
        .option("maxFilesPerTrigger", "1")
        .json(wire)
    )
    if dedup:
        vecs = vecs.dropDuplicates(["vec_id"])
    # the same guarded coder as the batch Lloyd: literal projection
    # below LIT_MAX centroids, stateless numpy matmul above — both
    # streaming-safe (no state, no shuffle)
    if len(asg_carr) <= LIT_MAX:
        coded = _code_points(vecs, asg_carr).select("cid", "vec_id")
    else:
        coded = _assign_np(vecs, asg_carr).select("cid", "vec_id")
    members = coded.groupBy("cid", "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals")
    )
    name = f"stream_semdedup_members{suffix}"
    _drain(spark, members, name, ckpt, mode="complete")
    return spark.table(name)


@query("q_stream_semantic_dedup", oracle=_STREAM_SEMDEDUP_ORACLE)
def q_stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C151: SemDeDup with the per-cluster candidate membership
    maintained INCREMENTALLY by the streaming engine (see the section
    comment above for the full design and the max_arrivals
    certification trick). The drained membership drives the identical
    within-cluster pair frame as batch q_semantic_dedup — one hash
    certifies streaming-maintained membership == batch assignment ==
    independent DuckDB Lloyd replay, plus the dedup state's
    load-bearing role via the oracle's literal-1 max_arrivals."""
    members = _stream_coded_members(spark, sf_dir).localCheckpoint()
    eq = _eq_arrays(spark, sf_dir).localCheckpoint()
    a = members.select(F.col("cid"), F.col("vec_id").alias("va")).join(
        eq.select(F.col("vec_id").alias("va"), F.col("eq").alias("ea")), "va"
    )
    b = members.select(F.col("cid"), F.col("vec_id").alias("vb")).join(
        eq.select(F.col("vec_id").alias("vb"), F.col("eq").alias("eb")), "vb"
    )
    pairs = a.join(b, ["cid"]).filter(F.col("va") < F.col("vb")).select(
        "cid", "va", "vb", _dist2_arrays("ea", "eb").alias("dist2")
    )
    pagg = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("dist2") < DUP_THRESH, 1).otherwise(0))
        .cast("long")
        .alias("n_close"),
        F.countDistinct(F.when(F.col("dist2") < DUP_THRESH, F.col("vb"))).alias(
            "n_drop"
        ),
        F.min("dist2").alias("min_dist2"),
    )
    mem = members.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("vec_id").cast("long").alias("sum_vec_ids"),
        F.max("n_arrivals").cast("long").alias("max_arrivals"),
    )
    return mem.join(pagg, "cid", "left").select(
        F.col("cid").alias("cluster_id"),
        "n_members",
        "sum_vec_ids",
        "max_arrivals",
        "n_pairs",
        "n_close",
        "n_drop",
        "min_dist2",
    )
