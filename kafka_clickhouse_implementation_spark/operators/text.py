"""Tier C — text analysis for training-data pipelines over `documents`
(doc_id, text, lang, source, n_chars): term statistics, token counting,
quality scoring, and heuristic language ID.

Everything is built-in Spark SQL (split / explode / higher-order
filter) — no Python in the hot path — so the plans are narrow maps plus
one aggregation shuffle each, which is exactly what you want sweeping
100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

STOPWORDS = ("the", "a", "of", "and")


@query(
    "q_term_stats",
    oracle="""
    SELECT token, count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY 1 ORDER BY doc_freq DESC, token LIMIT 20
    """,
)
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — document frequency of the top-20 tokens (tiebreak token asc)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("token"))
        .limit(20)
    )


@query(
    "q_docs_by_lang",
    oracle="""
    SELECT lang, source, count(*) AS n,
           (CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*)) AS avg_chars
    FROM documents GROUP BY 1, 2
    """,
)
def q_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — corpus slice stats per (lang, source) — the partition-level
    bookkeeping every multilingual corpus pipeline starts with."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        # exact integer sum -> ONE IEEE division: round(avg(double))
        # flipped at a .xx5 boundary on the sf1-equivalent data (the
        # only differential failure at 100x the gate scale, round 5)
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           (CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)
            / count(*)) AS avg_tokens,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — corpus-size accounting.
    `size(split(...))` never materializes the token rows."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    return docs.agg(
        F.sum(ntok).cast("long").alias("total_tokens"),
        (F.sum(ntok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.max(ntok).cast("long").alias("max_tokens"),
    )


@query(
    "q_quality_score",
    oracle="""
    SELECT lang,
           (CAST(round(sum(CAST(CAST(len(list_filter(string_split(text, ' '),
                                               x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
                                / len(string_split(text, ' ')) AS DECIMAL(28,8))), 4) AS DOUBLE)
            / count(*)) AS avg_stop_ratio,
           (CAST(round(sum(CAST(CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
                                AS DECIMAL(28,8))), 4) AS DOUBLE)
            / count(*)) AS avg_chars_per_tok,
           CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_long_docs
    FROM documents GROUP BY 1
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring — stopword ratio, chars-per-token, and a
    min-length gate, the standard cheap heuristics for corpus filtering.
    Higher-order `filter` keeps the stopword count inside codegen."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ntok = F.size(toks)
    nstop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.groupBy("lang").agg(
        # decimal-accumulated ratio sums (order-free), one division -
        # round(avg(double)) is partition-order dependent AND boundary-
        # fragile (see q_docs_by_lang's sf1 failure)
        (F.round(F.sum((nstop.cast("double") / ntok).cast("decimal(28,8)")), 4).cast("double")
         / F.count(F.lit(1))).alias("avg_stop_ratio"),
        (F.round(F.sum((F.col("n_chars").cast("double") / ntok).cast("decimal(28,8)")), 4)
         .cast("double") / F.count(F.lit(1))).alias("avg_chars_per_tok"),
        F.sum(F.when(ntok >= 20, 1).otherwise(0)).alias("n_long_docs"),
    )


@query(
    "q_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 10)
      GROUP BY 1, 2
    ),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, tok, round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
    ORDER BY tfidf DESC, doc_id, tok LIMIT 25
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring: per-(doc, term) frequency × ln(N/df), top-25
    terms corpus-wide (tiebroken). The df table is tiny (vocabulary-
    sized) and broadcast onto the tf relation — at 100 TB the join
    moves vocabulary, never the corpus."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = (
        toks.filter(F.col("doc_id") < 10)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    return (
        tf.join(F.broadcast(df), "tok")
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), "doc_id", "tok")
        .limit(25)
    )


@query(
    "q_token_count_bpe",
    oracle="""
    SELECT CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
             AS total_subtokens,
           (CAST(CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
                 AS DOUBLE) / count(*)) AS avg_subtokens
    FROM documents
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting: split into letter-runs, digit-runs,
    and single punctuation marks — the pre-tokenization pass a BPE
    tokenizer applies before merges. regexp stays JVM-side."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))
    return docs.agg(
        F.sum(ntok).cast("long").alias("total_subtokens"),
        (F.sum(ntok).cast("double") / F.count(F.lit(1))).alias("avg_subtokens"),
    )


@query(
    "q_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(length(t) * 7 + ascii(t) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000007
           ) AS roll_hash
    FROM documents WHERE doc_id < 25
    """,
)
def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (base 131, modulo a
    prime) over the token stream — order-sensitive, unlike the md5
    fingerprint, so reordered documents hash differently. Pure
    higher-order `aggregate`, no UDF."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    tok_vals = F.transform(
        F.split("text", " "), lambda t: (F.length(t) * 7 + F.ascii(t)).cast("long")
    )
    roll = F.aggregate(
        tok_vals, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % 1000000007
    )
    return docs.select("doc_id", roll.alias("roll_hash"))


@query(
    "q_lang_id",
    oracle="""
    SELECT lang,
           CASE WHEN contains(text, ' der ') OR contains(text, ' und ') THEN 'de'
                WHEN contains(text, ' el ') OR contains(text, ' la ') THEN 'es'
                WHEN contains(text, ' le ') OR contains(text, ' et ') THEN 'fr'
                WHEN contains(text, ' the ') OR contains(text, ' a ') THEN 'en'
                ELSE 'unknown' END AS pred_lang,
           count(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID — marker-word cascade (the n-gram-
    heuristic family, deliberately SQL-replicable for the oracle).
    Output is the (actual, predicted) confusion table."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    pred = (
        F.when(t.contains(" der ") | t.contains(" und "), "de")
        .when(t.contains(" el ") | t.contains(" la "), "es")
        .when(t.contains(" le ") | t.contains(" et "), "fr")
        .when(t.contains(" the ") | t.contains(" a "), "en")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
