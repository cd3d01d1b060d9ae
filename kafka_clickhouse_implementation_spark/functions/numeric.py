"""Order-independent numeric aggregation helpers.

Floating-point sums depend on accumulation order, which depends on
partitioning — so `round(sum(double), 2)` can flip at a .xx5 boundary
between two correct runs (observed: 378060.51 vs .52 for the same
data). For money-style measures we therefore sum in DECIMAL — exact,
associative, order-independent — and only then cast back to double.
The DuckDB oracles apply the identical transformation
(`round(CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE), n)`).

At scale this is also the right call: decimal partial aggregation is
codegen'd JVM arithmetic, and exactness survives any AQE re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Deterministic sum of a double expression: decimal-accumulate,
    cast back, round."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), scale)


def davg(col: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum / count, then round."""
    return F.round(
        (F.sum(col.cast(DEC)).cast("double") / F.count(col.cast(DEC))), scale
    )


def oracle_dsum(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of dsum for building oracle SQL."""
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE), {scale})"


def oracle_davg(expr: str, scale: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / count(CAST({expr} AS DECIMAL(18,4))), {scale})"
    )
