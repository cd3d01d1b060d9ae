"""Parquet table loaders for the driver testdata layout (TESTDATA.md).

All loads are plain ``spark.read.parquet`` so Catalyst gets full
predicate-pushdown / column-pruning freedom; never collect here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events.ts is written as parquet TIMESTAMP(NANOS), which Spark's reader
# rejects by default. With nanosAsLong it arrives as a nanosecond long;
# we truncate to microseconds (integer div — matches DuckDB's own
# ns→us truncation) and restore TimestampType.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
