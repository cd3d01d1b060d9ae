"""Tier C — multimodal column plumbing: image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``NotImplementedError``) plus a deterministic fake
feature extractor; the Spark-side plumbing — binary schema, batch
iteration, UDF signatures, partitioning — is real and oracle/pytest
tested. Swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so one batch of media fits
executor memory, and always project metadata-only when the task allows
(column pruning drops the blob at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

# Typed metadata schema for a multimodal asset column (binary payload +
# declared media metadata) — the "opaque blob + typed sidecar" contract.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decode would be PIL.Image.open(io.BytesIO(payload)).
    STUB: codec libraries are not available in this environment."""
    raise NotImplementedError("image decode requires PIL/opencv — not available; see module docstring")


def decode_audio(payload: bytes) -> "object":
    raise NotImplementedError("audio decode requires soundfile/ffmpeg — not available")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    raise NotImplementedError("video frame sampling requires ffmpeg — not available")


def fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in for a feature extractor: n floats derived
    from the sha256 of the payload. Keeps the full pipeline testable."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def extract_features(assets: DataFrame, n_features: int = 4) -> DataFrame:
    """The mapInPandas feature-extraction pipeline over binary payloads.
    Batch shape: iterator of pandas DataFrames with `payload` as bytes
    objects; output adds a fixed-width feature array. This is the
    production plumbing — only `fake_features` is a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda b: fake_features(b, n_features))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return assets.mapInPandas(
        run,
        schema="asset_id long, media_type string, n_bytes long, features array<double>",
    )


@query(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS fp
    FROM documents WHERE doc_id < 20
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, oracle-checked: treat document text bytes
    as an opaque blob and run it through the mapInPandas byte pipeline
    (length + content hash). Proves binary Arrow transfer end-to-end."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fp": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return docs.mapInPandas(run, schema="doc_id long, n_bytes long, fp string")


@query("q_multimodal_features")  # no-oracle: sha256-derived fake features aren't SQL-expressible
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal feature pipeline on synthesized assets (text
    bytes standing in for media payloads): binary column + typed
    metadata → mapInPandas feature extraction → per-type feature stats."""
    docs = load(spark, sf_dir, "documents").limit(100)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    feats = extract_features(assets)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("avg_f0"),
    )
