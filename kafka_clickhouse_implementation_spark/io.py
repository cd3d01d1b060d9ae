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

# Timestamp-encoding normalization. Testdata generations have shipped
# timestamps two ways; both must land as plain TimestampType with the
# same raw microseconds (session tz UTC == DuckDB's naive reading):
#  - TIMESTAMP(NANOS) (rounds 1-3): Spark rejects by default; with
#    nanosAsLong it arrives as a nanosecond long which we truncate to
#    micros (integer div — matches DuckDB's own ns→us truncation).
#  - timestamp[us] isAdjustedToUTC=false (round 4+): Spark 4 infers
#    TIMESTAMP_NTZ by default, which unix_micros()/window() reject.
#    Disabling inferTimestampNTZ reads the same raw micros as
#    TimestampType AT THE SCAN (no Cast node → ts predicate pushdown
#    is preserved).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Runtime-set (not only in our session builder) because the driver
    # passes its own SparkSession into queries().
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    # Belt-and-braces: if NTZ inference couldn't be disabled (conf
    # locked by a foreign session), cast — wall-clock-identical under
    # a UTC session tz.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
