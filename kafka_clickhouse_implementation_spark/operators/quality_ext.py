"""Corpus quality signals, round 4 — the remaining Gopher/C4-style
per-document filters a training-data pipeline applies before the dedup
tier, each with an exact DuckDB oracle:

- ``q_doc_signals``: repetition ratio (duplicate 3-gram fraction — the
  Gopher repetition gate) and type-token ratio, as pure integer counts
  plus one IEEE division each.
- ``q_unigram_surprisal``: mean per-token surprisal under the corpus's
  own unigram LM — the classic cheap "quality/perplexity" score. Floats
  are made engine-stable by controlling SUMMATION ORDER: each doc folds
  its per-token ln terms in sorted token order (Spark ``aggregate`` over
  a sorted collect_list == DuckDB ``list_reduce`` over ``list(... ORDER
  BY token)``; IEEE addition is deterministic given order). ln itself
  (Java Math.log vs libm log) is NOT guaranteed correctly rounded and
  may differ in the last ulp between engines, so a weighted sum landing
  within ~1 ulp of a 0.5e-6 rounding boundary could in principle flip
  round(...,6); if a driver row ever flaps, quantize each ln term (e.g.
  floor(term*1e9)) before folding, as the LSH projections do.

Scale notes (100 TB): both are one explode + hash aggregations; the
surprisal join broadcasts nothing bigger than the corpus vocabulary
(token, count) table, and the per-doc fold buffers only the doc's
DISTINCT tokens. The bounded doc_id < 300 slice exists to keep oracle
outputs reviewable; the plan shape is corpus-size independent.

Reference behavior anchor: the reference ingests raw text unfiltered
(kafka+clickhouse.md:92-103); these are the gates a corpus layer adds
above it, same tier as pipelines/corpus.quality_filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


@query(
    "q_doc_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 300
    ), grams AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g
      FROM t WHERE len(toks) >= 3
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t.toks)) AS BIGINT) AS n_types,
           round(CAST(len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks), 6) AS ttr,
           CAST(len(g.g) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(g.g)) AS BIGINT) AS n_distinct_grams,
           round(1.0 - CAST(len(list_distinct(g.g)) AS DOUBLE) / len(g.g), 6)
             AS rep_ratio
    FROM t JOIN grams g USING (doc_id)
    """,
)
def q_doc_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition ratio (1 - distinct/total 3-grams) and
    type-token ratio — the two cheapest quality gates after raw length.
    Exact integer counts; one IEEE division per signal (identical in
    both engines), rounded JVM-side."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    grams = toks.withColumn(
        "g",
        F.expr(
            "transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
        ),
    )
    return grams.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.round(
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 6
        ).alias("ttr"),
        F.size("g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("g")).cast("long").alias("n_distinct_grams"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("g")).cast("double") / F.size("g"), 6
        ).alias("rep_ratio"),
    )


@query(
    "q_unigram_surprisal",
    # Summation-order-controlled float oracle: per-doc ln terms are
    # folded in sorted token order on BOTH engines (list_reduce over an
    # ORDER BY token list == Spark aggregate over a sorted collect_list;
    # 0.0 + x1 == x1 exactly, so the differing fold seeds agree).
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), corpus AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM toks
    ), dt AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
      FROM toks WHERE doc_id < 300 GROUP BY doc_id, token
    ), terms AS (
      SELECT dt.doc_id, dt.token,
             CAST(dt.cnt AS DOUBLE)
               * ln(CAST(corpus.c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS term,
             dt.cnt
      FROM dt JOIN corpus USING (token), n
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           round(-list_reduce(list(term ORDER BY token), (a, b) -> a + b)
                   / sum(cnt), 6) AS mean_surprisal
    FROM terms GROUP BY doc_id
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token surprisal -1/n * sum ln(p(token)) under the
    corpus's own unigram distribution — the cheap LM-quality score used
    to rank documents before an expensive model-based filter. The
    corpus LM derives from ALL docs; scores are reported for the
    reviewable doc_id < 300 slice."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    corpus = toks.groupBy("token").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("n"))
    dt = (
        toks.filter(F.col("doc_id") < 300)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    terms = (
        dt.join(corpus, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "cnt",
            (
                F.col("cnt").cast("double")
                * F.log(F.col("c").cast("double") / F.col("n").cast("double"))
            ).alias("term"),
        )
    )
    folded = terms.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("token", "term"))),
                lambda x: x["term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("logp"),
    )
    return folded.select(
        "doc_id",
        "n_tokens",
        F.round(-F.col("logp") / F.col("n_tokens"), 6).alias("mean_surprisal"),
    )
