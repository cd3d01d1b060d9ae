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


def _nibble_value_sql(col: str, n_nibbles: int = 13, start: int = 1) -> str:
    """Integer value of `n_nibbles` hex chars of `col` beginning at
    1-based position `start` — identical SQL in Spark and DuckDB
    (instr/substr/integer math)."""
    # CAST to BIGINT: Spark's instr returns INT and small power-of-16
    # literals are INT too, so the raw product overflows 32 bits under
    # ANSI mode; DuckDB is BIGINT-native and unaffected by the cast.
    return " + ".join(
        f"CAST(instr('{_HEX}', substr({col}, {start + j}, 1)) - 1 AS BIGINT)"
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


def hash_slice_sql(j: int, mod: int, col: str = "h") -> str:
    """Integer value of the j-th disjoint 8-nibble (32-bit) slice of a
    32-hex md5 digest column, mod ``mod`` — identical SQL text runs on
    Spark and DuckDB. md5 bits are uniform, so the four disjoint slices
    act as four independent-enough hash functions from ONE digest (the
    standard trick; used by the streaming Count-Min bucketer and the
    Bloom filter below)."""
    expr = " + ".join(
        f"CAST(instr('{_HEX}', substr({col}, {8 * j + i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST(({expr}) % {mod} AS BIGINT)"


# Bloom geometry: M bits as 32-bit words (a 1<<63 bit literal overflows
# DuckDB's BIGINT shift, so words stay 32-bit), K hash slices per item.
BLOOM_M = 1024
BLOOM_K = 3
_ABSENT_PROBES = 10


def _bloom_words_build(toks: DataFrame) -> DataFrame:
    """(word, v) pairs of the Bloom bitmap: every distinct token sets
    BLOOM_K bit positions; words aggregate with bit_or — a mergeable,
    order-independent partial aggregate (each partition ships at most
    M/32 words, the whole filter is 4 KiB)."""
    hashed = toks.distinct().withColumn("h", F.md5(F.col("tok").cast("binary")))
    pos = hashed.select(
        F.explode(
            F.array(
                *[F.expr(hash_slice_sql(j, BLOOM_M)).alias("p") for j in range(BLOOM_K)]
            )
        ).alias("p")
    )
    return pos.groupBy(F.expr("p div 32").alias("w")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))").alias("v")
    )


_BLOOM_ORACLE = f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
      SELECT tok, md5(tok) AS h FROM (SELECT DISTINCT tok FROM toks)
    ), pos AS (
      {" UNION ALL ".join(
        f"SELECT {hash_slice_sql(j, BLOOM_M)} AS p FROM hashed"
        for j in range(BLOOM_K)
      )}
    ), words AS (
      SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS v
      FROM pos GROUP BY 1
    ), probes AS (
      SELECT tok AS probe FROM toks GROUP BY tok
      ORDER BY count(*) DESC, tok LIMIT 10
    ), all_probes AS (
      SELECT probe FROM probes
      UNION ALL
      SELECT 'absent_' || CAST(i AS VARCHAR) FROM range({_ABSENT_PROBES}) t(i)
    ), probe_pos AS (
      {" UNION ALL ".join(
        f"SELECT probe, {hash_slice_sql(j, BLOOM_M)} AS p"
        f" FROM (SELECT probe, md5(probe) AS h FROM all_probes)"
        for j in range(BLOOM_K)
      )}
    ), checked AS (
      SELECT pp.probe,
             coalesce((wd.v >> CAST(pp.p % 32 AS INT)) & 1, 0) AS bit_set
      FROM probe_pos pp LEFT JOIN words wd ON pp.p // 32 = wd.w
    )
    SELECT c.probe,
           min(c.bit_set) = 1 AS predicted_member,
           max(CASE WHEN t.tok IS NOT NULL THEN 1 ELSE 0 END) = 1 AS actual_member
    FROM checked c
    LEFT JOIN (SELECT DISTINCT tok FROM toks) t ON c.probe = t.tok
    GROUP BY c.probe
    """


@query("q_bloom_filter", oracle=_BLOOM_ORACLE)
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership (ClickHouse ``bloom_filter``
    skip-index analogue, and the structure Spark itself injects for
    runtime join pruning — here built as a first-class, value-checked
    operator): the corpus vocabulary sets K=3 md5-slice positions in an
    M=1024-bit bitmap aggregated with bit_or (mergeable and
    order-independent, hence exactly driver-checkable — the whole
    bitmap, not a sample, is pinned through the probe answers). Probes:
    the 10 most frequent tokens (all must hit) plus 10 synthetic
    absentees (may false-positive, deterministically — both engines
    compute the same FP set). At 100 TB the filter is a 4 KiB partial
    aggregate per partition; membership tests broadcast it."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    words = _bloom_words_build(toks)
    return bloom_probe_answers(spark, toks, words)


def bloom_probe_answers(spark: SparkSession, toks: DataFrame, words: DataFrame) -> DataFrame:
    """Answer the standard probe set (top-10 tokens of ``toks`` + 10
    synthetic absentees) against a built Bloom bitmap ``words`` —
    shared by the batch operator above and the streaming twin
    (streaming/bloom_stream.py), so their membership semantics can
    never drift. The bitmap is broadcast (4 KiB); ground truth
    semi-joins the vocabulary against the tiny probe set."""
    present = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(10)
        .select(F.col("tok").alias("probe"))
    )
    absent = spark.range(_ABSENT_PROBES).select(
        F.concat(F.lit("absent_"), F.col("id").cast("string")).alias("probe")
    )
    all_probes = present.unionAll(absent).withColumn(
        "h", F.md5(F.col("probe").cast("binary"))
    )
    probe_pos = all_probes.select(
        "probe",
        F.explode(
            F.array(
                *[F.expr(hash_slice_sql(j, BLOOM_M)).alias("p") for j in range(BLOOM_K)]
            )
        ).alias("p"),
    )
    checked = (
        probe_pos.join(
            F.broadcast(words), F.expr("p div 32") == F.col("w"), "left"
        )
        .select(
            "probe",
            F.expr("coalesce((v >> CAST(p % 32 AS INT)) & 1, 0)").alias("bit_set"),
        )
    )
    # Ground truth: semi-join the (huge) vocabulary against the TINY
    # broadcast probe set — never broadcast the vocabulary itself; the
    # surviving rows are the <= 20 probes actually present.
    present_probes = (
        toks.distinct()
        .join(
            F.broadcast(all_probes.select("probe")),
            F.col("tok") == F.col("probe"),
            "left_semi",
        )
        .withColumnRenamed("tok", "vtok")
    )
    return (
        checked.join(
            F.broadcast(present_probes), F.col("probe") == F.col("vtok"), "left"
        )
        .groupBy("probe")
        .agg(
            (F.min("bit_set") == 1).alias("predicted_member"),
            (F.max(F.when(F.col("vtok").isNotNull(), 1).otherwise(0)) == 1).alias(
                "actual_member"
            ),
        )
    )
