"""Corpus-engineering round 3: benchmark decontamination and data-mix
weighting — the two pretraining-pipeline steps not already covered by
the dedup/text tiers.

Decontamination: before training, any document sharing a long-enough
n-gram with an evaluation benchmark must be dropped (else the model
memorizes test answers). The scalable shape is exactly near-dup
candidate generation: shingle both sides, equi-join on the shingle,
semi-join the hits back — never a quadratic document comparison, and
the shuffle carries (shingle-hash, doc_id) pairs, not text.

Mixture weights: given per-source document counts and target shares,
the per-source resampling weight is target_share / actual_share. Kept
as one IEEE division of exact integer ratios (weight = target_permille
* total / (1000 * n_source)) so both engines emit identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.minhash_portable import _shingles
from kafka_clickhouse_implementation_spark.registry import query

# docs with doc_id % 10 == 9 play the held-out benchmark set — a modulo
# split so the slice is non-empty at every scale factor


@query(
    "q_decontaminate",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ), corpus AS (
      SELECT * FROM sh WHERE doc_id % 10 <> 9
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 9
    ), hits AS (
      SELECT DISTINCT c.doc_id
      FROM corpus c JOIN bench b ON c.s = b.s
    )
    SELECT (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
            FROM documents WHERE doc_id % 10 <> 9) AS n_corpus,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_contaminated
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination audit: corpus docs sharing ANY 3-token
    shingle with the benchmark slice (doc_id % 10 == 9) are
    contaminated. Plan: shared shingle subtree from the
    MinHash pipeline, distinct benchmark shingles (dedup before the
    join bounds its fan-out), one equi-join + distinct — the real
    pipeline would anti-join the flagged ids against the corpus, same
    shapes."""
    sh = _shingles(load(spark, sf_dir, "documents"))
    corpus = sh.filter(F.col("doc_id") % 10 != 9)
    bench = sh.filter(F.col("doc_id") % 10 == 9).select("s").distinct()
    hits = corpus.join(bench, "s").select("doc_id").distinct()
    n_corpus = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 != 9)
        .agg(F.count_distinct("doc_id").alias("n_corpus"))
    )
    return n_corpus.crossJoin(
        F.broadcast(hits.agg(F.count("*").alias("n_contaminated")))
    )


# Upsample src0-src2, keep src3-src5, drop the long tail to a floor —
# the testdata's sources are src0..src19, uniformly distributed
_TARGET_PERMILLE = {
    "src0": 300, "src1": 200, "src2": 100,
    "src3": 50, "src4": 50, "src5": 50,
}


@query(
    "q_mixture_weights",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ), total AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
    ), targets(source, permille) AS (
      VALUES {", ".join(f"('{s}', {p})" for s, p in sorted(_TARGET_PERMILLE.items()))}
    )
    SELECT c.source, c.n,
           CAST(COALESCE(tg.permille, 0) AS BIGINT) AS target_permille,
           CAST(COALESCE(tg.permille, 0) * t.total AS DOUBLE)
             / CAST(1000 * c.n AS DOUBLE) AS weight
    FROM counts c
    LEFT JOIN targets tg ON tg.source = c.source
    CROSS JOIN total t
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix weighting: per-source resampling weight to hit a target
    mixture (weight > 1 → upsample, < 1 → downsample). The weight is a
    single IEEE division of exact int64 products — bit-identical across
    engines; unknown sources get target 0. At 100 TB this is a
    vocab-sized aggregate + broadcast of a constant table."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    targets = spark.createDataFrame(
        sorted(_TARGET_PERMILLE.items()), "source string, permille long"
    )
    return (
        counts.join(F.broadcast(targets), "source", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n",
            F.coalesce("permille", F.lit(0)).alias("target_permille"),
            (
                (F.coalesce("permille", F.lit(0)) * F.col("total")).cast("double")
                / (F.lit(1000) * F.col("n")).cast("double")
            ).alias("weight"),
        )
    )
