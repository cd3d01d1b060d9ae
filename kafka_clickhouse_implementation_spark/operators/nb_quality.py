"""Portable multinomial Naive-Bayes quality classifier — round 11
(C166): the SUPERVISED rung of the quality family (heuristic C62 →
LM-fluency C142 → unsupervised domain-match C155 → this), the
CCNet/fastText-style trained gate every production pipeline adds once
it has labels. The portable, oracle-expressible form of that
classifier is counts-based multinomial NB (public method — McCallum &
Nigam 1998; CCNet, Wenzek et al. 2020 trains a linear fastText model
the same way a pipeline would train this one).

Protocol (all corpus-derived, no literal labels):
- LABELS: positive class = documents whose ``source`` equals
  min(source) over the corpus (the C155 target-slice rule — a testdata
  regeneration cannot invalidate it); everything else negative.
- SPLIT: train on even doc_ids, score held-out odd doc_ids (the C142
  even/odd recipe — a real train/test separation, which is what makes
  this rung *supervised* rather than a rescoring of its own input).
- FEATURES: the C155 hashed unigram+bigram bucket space VERBATIM
  (dsir.doc_features / FEATS_CTE_BODY — B = 4096 md5-nibble buckets),
  so the supervised and unsupervised domain rungs share one certified
  feature extraction.
- MODEL: per-bucket add-1-smoothed class multinomials over the train
  split + add-1-smoothed class priors; per-bucket log-odds
      llr(b) = ln (cpos_b+1)/(tpos+B) - ln (cneg_b+1)/(tneg+B)
  and the prior log-odds ln (npos+1)/(ntrain+2) - ln (nneg+1)/(ntrain+2)
  both via the pln kernel, floor-quantized to NANO units BEFORE any
  sum (the C63/C155 recipe) — so each held-out document's score
      score_nano(d) = prior_nano + sum_b cnt_db * llr_nano(b)
  is an exact BIGINT sum, partitioning-order independent, and the
  classification (score_nano > 0) is an exact integer compare.
- Held-out docs with ZERO features (empty text) never enter dfc and
  are not scored — documented, same convention as C155.

Overflow headroom: |llr_nano| <= ~2.5e10 and per-doc feature mass
<= 2 * doc length, so scores stay far below 2^53 at any bench sf (the
100 TB path widens to DECIMAL(38,0), the C99 dcast class).

Scale shape: ONE feature explode (shared with C155 — shuffles
(doc_id, bucket) ints, never text); both class models are
4096-row aggregates with map-side partials; the llr table and the
1-row prior BROADCAST to the scoring join; the confusion rollup
groups by source (source-cardinality rows). At 1000 executors nothing
exceeds one shuffle of hashed-feature counts.

Reference anchor: the reference pipeline's consumer tags and filters
events before insert (kafka+clickhouse.md:127-153); this is that
gatekeeping learned from labels over a text corpus.
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
from kafka_clickhouse_implementation_spark.operators.dsir import (
    FEATS_CTE_BODY,
    N_BUCKETS,
    doc_features,
)
from kafka_clickhouse_implementation_spark.registry import query

# per-bucket smoothed class probabilities over the TRAIN split —
# identical +1/+B smoothing (and the same pln → nano dag) as C155's
# target/source models, over bound columns (cpos, cneg, tpos, tneg)
_PPOS_SQL = f"CAST(cpos + 1 AS DOUBLE) / CAST(tpos + {N_BUCKETS} AS DOUBLE)"
_PNEG_SQL = f"CAST(cneg + 1 AS DOUBLE) / CAST(tneg + {N_BUCKETS} AS DOUBLE)"
# add-1-smoothed class priors over train DOC counts (npos, nneg, ntr)
_PRPOS_SQL = "CAST(npos + 1 AS DOUBLE) / CAST(ntr + 2 AS DOUBLE)"
_PRNEG_SQL = "CAST(nneg + 1 AS DOUBLE) / CAST(ntr + 2 AS DOUBLE)"
# ln(pt) - ln(ps), nano-floored — the exact C155 dag over the staged
# (et, tt, tt2, es, ts, ts2) columns
_LLR_NANO_SQL = (
    f"CAST(floor(({pln('et', 'tt', 'tt2')} - {pln('es', 'ts', 'ts2')})"
    " * 1.0e9) AS BIGINT)"
)

# the pt/ps → nano staging CTEs, parametrized on the input CTE name
# (reused for the bucket llr table AND the 1-row prior)
def _nano_stages(src: str, out: str, keys: str) -> str:
    k = f"{keys}, " if keys else ""
    return f"""{out}_m2 AS (
  SELECT {k}{ln_exp_case('pt')} AS et, pt * {ln_scale_case('pt')} AS mt,
         {ln_exp_case('ps')} AS es, ps * {ln_scale_case('ps')} AS ms
  FROM {src}
), {out}_m3 AS (
  SELECT {k}et, (mt - 1.0) / (mt + 1.0) AS tt,
         es, (ms - 1.0) / (ms + 1.0) AS ts
  FROM {out}_m2
), {out}_m4 AS (
  SELECT {k}et, tt, tt * tt AS tt2, es, ts, ts * ts AS ts2 FROM {out}_m3
), {out} AS (
  SELECT {k}{_LLR_NANO_SQL} AS nano FROM {out}_m4
)"""


_NB_ORACLE = f"""
WITH {FEATS_CTE_BODY}, lbl AS (
  SELECT doc_id, source,
         CASE WHEN source = (SELECT min(source) FROM documents)
              THEN 1 ELSE 0 END AS is_target
  FROM documents
), trn AS (
  SELECT d.doc_id, d.b, d.cnt, l.is_target
  FROM dfc d JOIN lbl l USING (doc_id) WHERE d.doc_id % 2 = 0
), cls AS (
  SELECT b,
         CAST(sum(CASE WHEN is_target = 1 THEN cnt ELSE 0 END) AS BIGINT) AS cpos,
         CAST(sum(CASE WHEN is_target = 0 THEN cnt ELSE 0 END) AS BIGINT) AS cneg
  FROM trn GROUP BY b
), ctot AS (
  SELECT CAST(coalesce(sum(cpos), 0) AS BIGINT) AS tpos,
         CAST(coalesce(sum(cneg), 0) AS BIGINT) AS tneg
  FROM cls
), prct AS (
  SELECT CAST(count(CASE WHEN l.is_target = 1 THEN 1 END) AS BIGINT) AS npos,
         CAST(count(CASE WHEN l.is_target = 0 THEN 1 END) AS BIGINT) AS nneg,
         CAST(count(*) AS BIGINT) AS ntr
  FROM (SELECT DISTINCT doc_id FROM trn) t JOIN lbl l USING (doc_id)
), m1 AS (
  SELECT c.b, {_PPOS_SQL} AS pt, {_PNEG_SQL} AS ps FROM cls c, ctot
), {_nano_stages('m1', 'llr', 'b')}, pr1 AS (
  SELECT {_PRPOS_SQL} AS pt, {_PRNEG_SQL} AS ps FROM prct
), {_nano_stages('pr1', 'prior', '')}, scored AS (
  SELECT d.doc_id,
         CAST((SELECT nano FROM prior)
              + sum(d.cnt * l.nano) AS BIGINT) AS score_nano,
         CAST(sum(d.cnt) AS BIGINT) AS n_feats
  FROM dfc d JOIN llr l USING (b)
  WHERE d.doc_id % 2 = 1
  GROUP BY d.doc_id
)
SELECT l.source,
       CAST(max(l.is_target) AS BIGINT) AS is_target,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.score_nano > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_target,
       CAST(sum(s.score_nano) AS BIGINT) AS sum_score_nano,
       CAST(min(s.score_nano) AS BIGINT) AS min_score,
       CAST(max(s.score_nano) AS BIGINT) AS max_score,
       CAST(sum(s.n_feats) AS BIGINT) AS sum_feats
FROM scored s JOIN lbl l USING (doc_id)
GROUP BY l.source
"""


def _nano_stage_cols(df: DataFrame, keys: list[str]) -> DataFrame:
    """(pt, ps) → nano via the staged pln dag — Spark twin of
    _nano_stages (the SQL text of each stage is the interpolated
    constant shared with the oracle)."""
    k = list(keys)
    return (
        df.selectExpr(
            *k,
            f"{ln_exp_case('pt')} AS et",
            f"pt * {ln_scale_case('pt')} AS mt",
            f"{ln_exp_case('ps')} AS es",
            f"ps * {ln_scale_case('ps')} AS ms",
        )
        .selectExpr(
            *k, "et", "(mt - 1.0) / (mt + 1.0) AS tt",
            "es", "(ms - 1.0) / (ms + 1.0) AS ts",
        )
        .selectExpr(*k, "et", "tt", "tt * tt AS tt2", "es", "ts", "ts * ts AS ts2")
        .selectExpr(*k, f"{_LLR_NANO_SQL} AS nano")
    )


def nb_label(docs: DataFrame) -> DataFrame:
    """(doc_id, source, is_target) — positive class = the min(source)
    slice (no collect; the 1-row min broadcasts into the compare)."""
    msrc = docs.agg(F.min("source").alias("msrc"))
    return (
        docs.crossJoin(F.broadcast(msrc))
        .select(
            "doc_id",
            "source",
            F.when(F.col("source") == F.col("msrc"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_target"),
        )
    )


def nb_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, score_nano, n_feats) — exact-BIGINT NB log-odds for
    every HELD-OUT (odd doc_id) document with >= 1 feature, under the
    model trained on the even half."""
    dfc = doc_features(docs)
    lbl = nb_label(docs)
    trn = dfc.join(lbl.select("doc_id", "is_target"), "doc_id").filter(
        F.col("doc_id") % 2 == 0
    )
    cls = trn.groupBy("b").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cpos"),
        F.sum(F.when(F.col("is_target") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cneg"),
    )
    ctot = cls.agg(
        F.coalesce(F.sum("cpos"), F.lit(0)).cast("long").alias("tpos"),
        F.coalesce(F.sum("cneg"), F.lit(0)).cast("long").alias("tneg"),
    )
    prct = (
        trn.select("doc_id").distinct()
        .join(lbl, "doc_id")
        .agg(
            F.count(F.when(F.col("is_target") == 1, 1)).cast("long").alias("npos"),
            F.count(F.when(F.col("is_target") == 0, 1)).cast("long").alias("nneg"),
            F.count(F.lit(1)).cast("long").alias("ntr"),
        )
    )
    llr = _nano_stage_cols(
        cls.crossJoin(F.broadcast(ctot)).selectExpr(
            "b", f"{_PPOS_SQL} AS pt", f"{_PNEG_SQL} AS ps"
        ),
        ["b"],
    )
    prior = _nano_stage_cols(
        prct.selectExpr(f"{_PRPOS_SQL} AS pt", f"{_PRNEG_SQL} AS ps"), []
    ).withColumnRenamed("nano", "prior_nano")
    return (
        dfc.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("nano")).cast("long").alias("s"),
            F.sum("cnt").cast("long").alias("n_feats"),
        )
        .crossJoin(F.broadcast(prior))
        .selectExpr(
            "doc_id",
            "CAST(prior_nano + s AS BIGINT) AS score_nano",
            "n_feats",
        )
    )


@query("q_nb_quality", oracle=_NB_ORACLE)
def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C166: supervised NB quality classification — per-source
    confusion rollup of the held-out split (doc count, predicted-
    target count, exact score sums and extremes). The hash certifies
    the shared C155 feature extraction, the even/odd split, both
    add-1-smoothed class multinomials, the smoothed priors, every
    pln-kernel log-odds (sign included), the nano quantization, the
    exact per-doc sums, and the integer decision threshold."""
    docs = load(spark, sf_dir, "documents")
    lbl = nb_label(docs)
    return (
        nb_scores(docs)
        .join(lbl, "doc_id")
        .groupBy("source")
        .agg(
            F.max("is_target").cast("long").alias("is_target"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("score_nano") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pred_target"),
            F.sum("score_nano").cast("long").alias("sum_score_nano"),
            F.min("score_nano").cast("long").alias("min_score"),
            F.max("score_nano").cast("long").alias("max_score"),
            F.sum("n_feats").cast("long").alias("sum_feats"),
        )
    )
