"""Embedding feature-engineering ops a training-data pipeline runs at
corpus scale: per-vector L2 stats and int8 max-abs quantization (the
storage/ANN-memory reduction step — 4× smaller than float32, 8× smaller
than float64).

Everything is JVM-side higher-order array arithmetic (`transform` /
`aggregate`) — no UDFs, no shuffle beyond the final aggregate.

Engine-portability notes: both queries avoid rounding doubles. Norms
are emitted as raw IEEE doubles (identical inputs → identical folds →
identical bits in Spark and DuckDB). Quantization uses the
floor(x + 0.5) convention instead of round(): floor of a double is a
function of the binary value in BOTH engines, so it cannot hit the
shortest-repr-vs-binary divergence that round() has at .5 boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


@query(
    "q_embedding_norms",
    oracle="""
    SELECT vec_id,
           sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'))
             AS l2_norm,
           list_aggregate(CAST(embedding AS DOUBLE[]), 'min') AS min_val,
           list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS max_val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and value range — the sanity stats computed
    before normalization/quantization. Pure higher-order fold."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("l2_norm"),
        F.array_min(e).alias("min_val"),
        F.array_max(e).alias("max_val"),
    )


@query(
    "q_embedding_quantize",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max')
               AS max_abs,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 20
    )
    SELECT vec_id,
           CAST(list_aggregate(
             list_transform(e, x -> CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT)),
             'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(
             list_transform(e, x -> CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT)),
             'min') AS BIGINT) AS q_min,
           CAST(list_aggregate(
             list_transform(e, x -> CAST(floor(x * 127.0 / max_abs + 0.5) AS BIGINT)),
             'max') AS BIGINT) AS q_max
    FROM scaled
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 max-abs quantization, checksummed per vector (sum/min/max of
    the quantized codes — hashable evidence that every lane quantized
    identically). floor(x+0.5) keeps the integer mapping engine-exact;
    codes land in [-127, 127] by construction of max-abs scaling."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(e, F.abs))
    quant = F.transform(
        e, lambda x: F.floor(x * F.lit(127.0) / max_abs + F.lit(0.5)).cast("long")
    )
    return emb.select(
        "vec_id",
        F.aggregate(quant, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(quant).alias("q_min"),
        F.array_max(quant).alias("q_max"),
    )


_TRUNC_DIM = 8


@query(
    "q_embedding_truncate",
    oracle=f"""
    WITH sliced AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS e,
             list_slice(CAST(embedding AS DOUBLE[]), 1, {_TRUNC_DIM}) AS t
      FROM embeddings WHERE vec_id < 20
    )
    SELECT vec_id,
           sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS full_norm,
           sqrt(list_aggregate(list_transform(t, x -> x * x), 'sum')) AS trunc_norm,
           list_aggregate(list_transform(t, x -> x * x), 'sum')
             / list_aggregate(list_transform(e, x -> x * x), 'sum') AS energy_kept
    FROM sliced
    """,
)
def q_embedding_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit: keep the first
    8 lanes and report how much L2 energy survives — the
    retrieval-vs-storage tradeoff check run before truncating a corpus
    of embeddings. Per-row higher-order folds are order-deterministic
    (same left-to-right sum in both engines), so norms and the energy
    ratio are bit-identical; a narrow map, no shuffle at all."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    t = F.slice(e, 1, _TRUNC_DIM)
    sq = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)  # noqa: E731
    return emb.select(
        "vec_id",
        F.sqrt(sq(e)).alias("full_norm"),
        F.sqrt(sq(t)).alias("trunc_norm"),
        (sq(t) / sq(e)).alias("energy_kept"),
    )
