"""Vector math over ``array<float>`` columns — all JVM-side higher-order
functions (zip_with / aggregate), no Python in the hot path.

Used by the similarity-search and embedding-dedup operators. Everything
computes in double regardless of the storage element type so results are
engine-portable (the DuckDB oracle casts to DOUBLE[] likewise).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sequential sum, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
