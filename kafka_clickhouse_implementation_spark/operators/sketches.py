"""Portable distinct-count sketch — KMV / bottom-k, the mergeable
sketch family behind ClickHouse ``uniqCombined`` and DataSketches theta,
built here from engine-portable primitives (md5 order statistics) so
the WHOLE sketch — the retained hashes themselves, not just a row count
— is differentially checked against DuckDB. Complements the rows-only
HLL twin (relational_ext.q_hll_sketch_union) whose hash family is
engine-private.

KMV recap: hash every distinct item uniformly into [0,1); keep the k
smallest hashes; the k-th smallest value v estimates the distinct count
as (k-1)/v. Bottom-k sets are trivially mergeable (union, re-truncate),
which is what makes the sketch a partial aggregate at 100 TB: each
partition ships its k smallest digests, never the items.

Portability: md5 hex strings of fixed length compare lexicographically
exactly like their numeric value, in both engines; the numeric value of
the first 13 nibbles (52 bits — exactly a double mantissa) is decoded
with the same instr/substr integer arithmetic on both sides, so the
estimate's single IEEE division is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

K = 64
_HEX = "0123456789abcdef"
_TWO_52 = 1 << 52


def _nibble_value_sql(col: str, n_nibbles: int = 13) -> str:
    """Integer value of the first `n_nibbles` hex chars of `col` —
    identical SQL in Spark and DuckDB (instr/substr/integer math)."""
    # CAST to BIGINT: Spark's instr returns INT and small power-of-16
    # literals are INT too, so the raw product overflows 32 bits under
    # ANSI mode; DuckDB is BIGINT-native and unaffected by the cast.
    return " + ".join(
        f"CAST(instr('{_HEX}', substr({col}, {j + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (n_nibbles - 1 - j)}"
        for j in range(n_nibbles)
    )


_EST_SQL = (
    f"CAST({(K - 1) * _TWO_52} AS DOUBLE) / CAST({_nibble_value_sql('kth_hash')} AS DOUBLE)"
)

# Shared DuckDB prelude: distinct corpus bigrams -> md5 digests ->
# bottom-k. One constant so the sketch and its merge-law twin can never
# silently diverge in tokenization.
_BOTTOM_K_CTE = f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT DISTINCT unnest(list_transform(range(1, len(t)),
                                            i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks WHERE len(t) >= 2
    ), bottom AS (
      SELECT md5(bg) AS h FROM grams ORDER BY h LIMIT {K}
    )"""


def _bigrams(docs: DataFrame) -> DataFrame:
    """Distinct corpus bigrams — the Spark twin of _BOTTOM_K_CTE's
    `grams`, shared by the sketch and the merge-law query so they
    always tokenize identically."""
    return (
        docs.select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat_ws(' ', t[i], t[i + 1]))"
                )
            ).alias("bg")
        )
        .distinct()
    )


@query(
    "q_kmv_sketch",
    oracle=f"""{_BOTTOM_K_CTE}, kth AS (
      SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS k_kept FROM bottom
    ), exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM grams
    )
    SELECT kth_hash, k_kept, {_EST_SQL} AS est_distinct, exact_distinct
    FROM kth CROSS JOIN exact
    """,
)
def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch over corpus bigrams, value-checked
    end-to-end: the k-th retained digest AND the derived estimate must
    match DuckDB bit-for-bit, alongside the exact distinct count the
    estimate approximates. Plan: distinct bigrams (map-side combined),
    md5, TakeOrdered k (never a global sort), one-row finish."""
    docs = load(spark, sf_dir, "documents")
    grams = _bigrams(docs)
    bottom = (
        grams.select(F.md5(F.col("bg").cast("binary")).alias("h"))
        .orderBy("h")
        .limit(K)
    )
    kth = bottom.agg(
        F.max("h").alias("kth_hash"), F.count("*").cast("long").alias("k_kept")
    )
    exact = grams.agg(F.count("*").alias("exact_distinct"))
    return kth.crossJoin(F.broadcast(exact)).selectExpr(
        "kth_hash", "k_kept", f"{_EST_SQL} AS est_distinct", "exact_distinct"
    )


@query(
    "q_kmv_union",
    # The oracle is the WHOLE-corpus bottom-k: bottom_k(bottom_k(A) ∪
    # bottom_k(B)) == bottom_k(A ∪ B) exactly (any digest in the global
    # bottom-k is necessarily in its own slice's bottom-k), so the
    # merge-of-partials path must reproduce the direct sketch
    # bit-for-bit — the driver hash proves the mergeability law, not
    # just a row count.
    oracle=f"""{_BOTTOM_K_CTE}
    SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS k_kept
    FROM bottom
    """,
)
def q_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV MERGE law, value-checked: sketch two disjoint corpus slices
    independently (doc_id parity), union the two bottom-k digest sets,
    re-truncate — the result must equal the direct whole-corpus sketch
    exactly. This is the property that makes the sketch a partial
    aggregate at 100 TB: per-partition bottom-k sets merge without
    ever revisiting the data."""
    docs = load(spark, sf_dir, "documents")
    parts = []
    for parity in (0, 1):
        slice_grams = _bigrams(docs.filter(F.col("doc_id") % 2 == parity))
        parts.append(
            slice_grams.select(F.md5(F.col("bg").cast("binary")).alias("h"))
            .orderBy("h")
            .limit(K)
        )
    merged = parts[0].union(parts[1]).distinct().orderBy("h").limit(K)
    return merged.agg(
        F.max("h").alias("kth_hash"), F.count("*").cast("long").alias("k_kept")
    )
