"""BM25 retrieval ranking — round 10 (C150): scoring ON TOP of the
C20 inverted-index machinery, the standard next step a corpus user
takes after building postings (the dashboard-query story of the
reference's analytics tables — kafka+clickhouse.md:240-243 — applied
to text retrieval).

Okapi BM25 (Robertson et al., TREC-3): for document D and query term q

    score(D, q) = idf(q) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))
    idf(q)      = ln((N - df + 0.5) / (df + 0.5))

Portability design (the repo's exact-integer + shared-kernel recipe):

- k1 = 1.2 and b = 0.75 as EXACT RATIONALS: multiplying the tf-norm
  fraction through by 10 * sum_dl (avgdl = sum_dl / N) gives
      frac = 22 * tf * sum_dl
           / (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * N)
  — numerator and denominator are exact BIGINTs (< 2^53 at every
  bench scale; the 100 TB deployment would move them to DECIMAL(38,0)
  and portable_math.dcast, the C99 path), so their DOUBLE casts are
  exact and the one IEEE division is correctly rounded on both
  engines.
- idf via the pln kernel (C145's ln): with a = 2N - 2df + 1 and
  b2 = 2df + 1 (the 0.5s cleared), idf = sgn * pln(min/max) where
  sgn = -1 when a >= b2 (ln(x) = -ln(1/x)) — the ratio of exact
  integers is an exact-double division into pln's [2^-64, 1] domain,
  and the branch compares exact integers, so the chosen branch and
  every downstream double are engine-identical BY CONSTRUCTION.
  (High-df terms get a NEGATIVE idf — kept, as Robertson defines it;
  it exercises the sign branch.)
- per-(query, term, doc) contributions are floor-quantized to integer
  NANO units BEFORE summing (the C63 recipe), so the per-doc score is
  an exact BIGINT sum — partitioning-order independent.
- query terms are DERIVED from the corpus (top-QT_TOTAL tokens by
  document frequency, stopwords excluded, (df DESC, token) total
  order), grouped into QT_TOTAL/QT_PER queries of QT_PER consecutive
  ranks — no literal vocabulary that a testdata regeneration could
  invalidate.

Scale shape: tf / df / dl are one-scan token aggregations (the same
shuffle family as the C20 index build); the query-term table is
QT_TOTAL rows (broadcast); scoring touches only the candidate set
(union of the query terms' posting lists — document-at-a-time over
postings, never the corpus); the final top-k is a per-query window
over candidates. At 1000 executors this is scatter-gather ranking with
mergeable per-partition partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.portable_math import (
    ln_exp_case,
    ln_scale_case,
    pln,
)
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

QT_TOTAL = 12  # query terms drawn from the corpus
QT_PER = 3  # terms per query -> QT_TOTAL / QT_PER queries
TOP_K = 5  # documents returned per query
_STOP = ("the", "a", "of", "and")  # the corpus-wide stopword set

# ---------------------------------------------------------------------
# Shared double-math templates — Spark and the oracle interpolate
# IDENTICAL text (the pln portability contract), over bound columns:
#   a  = 2N - 2df + 1          b2 = 2df + 1         (exact BIGINT)
#   num = 22*tf*sum_dl         den = 10*tf*sum_dl + 3*sum_dl + 9*dl*N
# ---------------------------------------------------------------------

_P_SQL = "CAST(least(a, b2) AS DOUBLE) / CAST(greatest(a, b2) AS DOUBLE)"
_SGN_SQL = "CASE WHEN a >= b2 THEN -1.0e0 ELSE 1.0e0 END"
_FR_SQL = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
_T_SQL = "(m - 1.0) / (m + 1.0)"
_NANO_SQL = (
    f"CAST(floor((sgn * {pln('e', 't', 't2')}) * fr * 1.0e9) AS BIGINT)"
)

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.w AS token
  FROM documents, unnest(string_split(text, ' ')) AS u(w)
  WHERE u.w <> ''
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), consts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS sum_dl
), df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT token, doc_id FROM toks) GROUP BY token
), qterms AS (
  SELECT token, df,
         CAST((rnk - 1) // {QT_PER} AS BIGINT) AS qid
  FROM (
    SELECT token, df,
           row_number() OVER (ORDER BY df DESC, token) AS rnk
    FROM df WHERE token NOT IN {_STOP!r}
  ) WHERE rnk <= {QT_TOTAL}
), joined AS (
  SELECT q.qid, q.df, t.doc_id, t.tf, d.dl, c.n_docs, c.sum_dl
  FROM qterms q JOIN tf t USING (token) JOIN dl d USING (doc_id), consts c
), ints AS (
  SELECT qid, doc_id,
         2 * n_docs - 2 * df + 1 AS a,
         2 * df + 1 AS b2,
         22 * tf * sum_dl AS num,
         10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs AS den
  FROM joined
), s1 AS (
  SELECT qid, doc_id, {_SGN_SQL} AS sgn, {_FR_SQL} AS fr, {_P_SQL} AS p
  FROM ints
), s2 AS (
  SELECT qid, doc_id, sgn, fr,
         {ln_exp_case('p')} AS e, p * {ln_scale_case('p')} AS m
  FROM s1
), s3 AS (
  SELECT qid, doc_id, sgn, fr, e, {_T_SQL} AS t FROM s2
), s4 AS (
  SELECT qid, doc_id, sgn, fr, e, t, t * t AS t2 FROM s3
), contrib AS (
  SELECT qid, doc_id, {_NANO_SQL} AS nano FROM s4
), perdoc AS (
  SELECT qid, doc_id,
         CAST(sum(nano) AS BIGINT) AS score_nano,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM contrib GROUP BY qid, doc_id
)
SELECT qid, doc_id, CAST(rnk AS BIGINT) AS rnk, score_nano, n_terms_hit
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY score_nano DESC, doc_id) AS rnk
  FROM perdoc
) WHERE rnk <= {TOP_K}
"""


def bm25_rank(docs: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """(qid, doc_id, rnk, score_nano, n_terms_hit) for the corpus-derived
    query set — see module docstring for the portability design."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    n_docs_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return bm25_from_tf(tf, n_docs_df, top_k)


def bm25_from_tf(tf: DataFrame, n_docs_df: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """BM25 from a (doc_id, token, tf) term-frequency table — the ONE
    scoring core shared by the batch query (which derives tf from a
    corpus scan) and the streaming twin (which drains an incrementally
    maintained tf state), so the two can never drift. dl, sum_dl and
    df all derive from tf itself (each (doc_id, token) row is distinct
    by construction, so df = rows per token and dl = sum of tf per
    doc); only the document COUNT arrives separately because a
    zero-token document exists in `documents` but not in tf."""
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    consts = n_docs_df.crossJoin(
        tf.agg(F.sum("tf").cast("long").alias("sum_dl"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    from pyspark.sql import Window as W

    # TakeOrdered first (distributed top-QT_TOTAL — no global sort or
    # single-partition window over the vocabulary), THEN rank the tiny
    # result; the unpartitioned window sees QT_TOTAL rows only.
    top = (
        df.filter(~F.col("token").isin(*_STOP))
        .orderBy(F.desc("df"), "token")
        .limit(QT_TOTAL)
    )
    qterms = top.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("df"), "token"))
    ).selectExpr("token", "df", f"CAST((rnk - 1) div {QT_PER} AS BIGINT) AS qid")
    joined = (
        F.broadcast(qterms)
        .join(tf, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
    )
    contrib = (
        joined.selectExpr(
            "qid",
            "doc_id",
            "2 * n_docs - 2 * df + 1 AS a",
            "2 * df + 1 AS b2",
            "22 * tf * sum_dl AS num",
            "10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs AS den",
        )
        .selectExpr("qid", "doc_id", f"{_SGN_SQL} AS sgn", f"{_FR_SQL} AS fr", f"{_P_SQL} AS p")
        .selectExpr(
            "qid", "doc_id", "sgn", "fr",
            f"{ln_exp_case('p')} AS e", f"p * {ln_scale_case('p')} AS m",
        )
        .selectExpr("qid", "doc_id", "sgn", "fr", "e", f"{_T_SQL} AS t")
        .selectExpr("qid", "doc_id", "sgn", "fr", "e", "t", "t * t AS t2")
        .selectExpr("qid", "doc_id", f"{_NANO_SQL} AS nano")
    )
    perdoc = contrib.groupBy("qid", "doc_id").agg(
        F.sum("nano").cast("long").alias("score_nano"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("score_nano"), "doc_id")
    return (
        perdoc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_k)
        .select("qid", "doc_id", "rnk", "score_nano", "n_terms_hit")
    )


@query("q_bm25_rank", oracle=_BM25_ORACLE)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C150: BM25 top-k (k = TOP_K) ranking over `documents` for the
    corpus-derived query set — value-hashed end to end: the hash
    certifies every tf/df/dl count, both exact-integer BM25 fractions,
    the pln-kernel idf (sign branch included), the nano quantization,
    and the (score DESC, doc_id) ranking cut."""
    return bm25_rank(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------
# Streaming-maintained inverted index feeding BM25 — round 10 (C152):
# the C138/C147/C151 -State certification pattern applied to
# retrieval. Documents arrive over the duplicate-injecting corpus wire
# (each part file copied with a later mtime), pass stateful doc_id
# dedup, explode into tokens, and a complete-mode
# groupBy(doc_id, token) count maintains the term-frequency state —
# which IS the inverted index, maintained incrementally (state linear
# in index size; at 100 TB the complete-mode memory sink becomes an
# update-mode idempotent upsert keyed by (doc_id, token), same
# semantics). The drained table enters bm25_from_tf — the identical
# scoring core as batch C150 — and the result is checked against the
# batch BM25 oracle VERBATIM: without the dedup state the wire's
# duplicate files DOUBLE every tf and dl (unlike C151's membership,
# tf is count-valued, so duplicate corruption is intrinsic, not
# probe-injected), shifting every score — a loud hash FAIL.
# ---------------------------------------------------------------------


@query("q_stream_bm25", oracle=_BM25_ORACLE)
def q_stream_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C152: BM25 over the STREAMING-MAINTAINED inverted index — the
    tf state accumulated across micro-batches from the duplicate-
    injecting document wire (stateful dedup -> explode -> complete-mode
    counts), drained, and scored by the same bm25_from_tf core as the
    batch C150. One hash certifies incrementally-built index == batch
    index == independent DuckDB replay. The document count enters from
    the drained DEDUP state (distinct doc ids seen), which equals
    count(documents) whenever every document has at least one token —
    any divergence (or a dedup-state failure) hash-fails loudly."""
    import os

    from kafka_clickhouse_implementation_spark.streaming.corpus_stream import (
        _DOC_WIRE_SCHEMA,
        document_wire,
    )
    from kafka_clickhouse_implementation_spark.streaming.funnel import _drain

    wire, base = document_wire(spark, sf_dir)
    tf_state = (
        spark.readStream.schema(_DOC_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .json(wire)
        .dropDuplicates(["doc_id"])
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    _drain(
        spark, tf_state, "stream_bm25_tf",
        os.path.join(base, "ckpt_bm25_tf"), mode="complete",
    )
    # localCheckpoint: the drained state feeds FOUR plan branches (dl,
    # sum_dl, df->qterms, and the scoring join) — pin it once; it also
    # gives the self-join (qterms derives from tf) fresh attribute ids,
    # which the memory-sink view otherwise shares across both sides
    # (Spark "conflicting references in Join" internal error).
    tf = spark.table("stream_bm25_tf").localCheckpoint()
    n_docs_df = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return bm25_from_tf(tf, n_docs_df)
