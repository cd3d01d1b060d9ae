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


@query(
    "q_bigram_surprisal",
    # Interpolated bigram LM, engine-exact by construction: every count
    # is an exact integer, p folds them through an IDENTICAL IEEE
    # expression tree (two divisions, two halvings, one add — all
    # correctly rounded, and 0.5 is an exact binary fraction), and
    # ln(p) — the one non-correctly-rounded op — quantizes to integer
    # nano-units BEFORE the weighted sum (the avg_ln recipe), so the
    # final mean is one bigint divided by one exact double.
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), pos AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM t WHERE len(toks) >= 2
    ), bgc AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c_bg FROM pos GROUP BY bg
    ), hdc AS (
      SELECT split_part(bg, ' ', 1) AS head, CAST(sum(c_bg) AS BIGINT) AS c_hd
      FROM bgc GROUP BY 1
    ), ugc AS (
      SELECT unnest(toks) AS token FROM t
    ), ug AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c_ug FROM ugc GROUP BY token
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM ugc
    ), dbg AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS cnt
      FROM pos WHERE doc_id < 300 GROUP BY doc_id, bg
    ), terms AS (
      SELECT dbg.doc_id, dbg.cnt,
             dbg.cnt * CAST(floor(ln(
               0.5 * (CAST(bgc.c_bg AS DOUBLE) / CAST(hdc.c_hd AS DOUBLE))
               + 0.5 * (CAST(ug.c_ug AS DOUBLE) / CAST(n.n AS DOUBLE))
             ) * 1e9) AS BIGINT) AS term
      FROM dbg
      JOIN bgc USING (bg)
      JOIN hdc ON hdc.head = split_part(dbg.bg, ' ', 1)
      JOIN ug ON ug.token = split_part(dbg.bg, ' ', 2)
      CROSS JOIN n
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           -CAST(sum(term) AS DOUBLE) / (CAST(sum(cnt) AS DOUBLE) * 1e9)
             AS mean_interp_surprisal
    FROM terms GROUP BY doc_id
    """,
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-position surprisal under an INTERPOLATED bigram LM —
    p(w|prev) = ½·c(prev,w)/c(prev,·) + ½·c(w)/N — the next quality
    rung above q_unigram_surprisal (context-aware, catches shuffled-
    token gibberish a unigram model scores as fluent). The LM derives
    from the whole corpus; scores report for the reviewable doc_id <
    300 slice. Plan: one explode into bigram positions, three hash
    aggregations for the count tables, equi-joins on bigram/head/token
    keys (never broadcast the vocabulary — it scales with the corpus),
    nano-quantized ln terms, one final division."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    pos = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i], toks[i + 1]))"
            )
        ).alias("bg"),
    )
    bgc = pos.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    hdc = bgc.groupBy(F.expr("split_part(bg, ' ', 1)").alias("head")).agg(
        F.sum("c_bg").cast("long").alias("c_hd")
    )
    ugc = docs.select(F.explode(F.split("text", " ")).alias("token"))
    ug = ugc.groupBy("token").agg(F.count(F.lit(1)).alias("c_ug"))
    n = ugc.agg(F.count(F.lit(1)).alias("n"))
    dbg = (
        pos.filter(F.col("doc_id") < 300)
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    terms = (
        dbg.join(bgc, "bg")
        .join(hdc, F.expr("split_part(bg, ' ', 1)") == F.col("head"))
        .join(ug, F.expr("split_part(bg, ' ', 2)") == F.col("token"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * F.floor(
                    F.log(
                        F.lit(0.5)
                        * (F.col("c_bg").cast("double") / F.col("c_hd").cast("double"))
                        + F.lit(0.5)
                        * (F.col("c_ug").cast("double") / F.col("n").cast("double"))
                    )
                    * F.lit(1e9)
                ).cast("long")
            ).alias("term"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        (
            -F.sum("term").cast("double")
            / (F.sum("cnt").cast("double") * F.lit(1e9))
        ).alias("mean_interp_surprisal"),
    )


# ---------------------------------------------------------------------------
# C142 — Kneser-Ney smoothed bigram LM scoring on a train/held-out
# split (the CCNet-style corpus-quality filter; Kneser & Ney 1995,
# Chen & Goodman 1998). EXACT-RATIONAL portability: with discount
# d = 3/4, interpolated KN is
#     P(w2|w1) = max(c12 - 3/4, 0)/c1 + (3/4 · N1+(w1·)/c1) · Pcont(w2)
#              = [ max(4·c12 - 3, 0)·Ntot + 3·N1·Ncont ] / (4·c1·Ntot)
# — one integer numerator over one integer denominator, micro-
# quantized by INTEGER division on both engines. The products are
# accumulated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): c1·Ntot
# alone exceeds int64 once distinct-bigram-type mass passes ~2.3e12,
# which a 100 TB corpus reaches. No float exists anywhere in the
# pipeline, so there is no summation-order or quantization-boundary
# risk at all (a step beyond the nano-quantized-ln recipe of C82).
# ---------------------------------------------------------------------------

# The model + scoring CTE chains are GENERATED so the C142 query and
# the KN-gated corpus clean (pipelines/corpus.py q_corpus_clean_scored)
# share ONE template and cannot drift (the r8-verdict requirement; same
# policy as the C56/C86 _clean_oracle template).

KN_MODEL_CTES = """t AS (
  SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), train AS (
  SELECT unnest(l[1:len(l) - 1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM t WHERE doc_id % 2 = 0
), bgc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM train GROUP BY w1, w2
), ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1
  FROM bgc GROUP BY w1
), cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM bgc GROUP BY w2
), ntot AS (
  SELECT CAST(count(*) AS BIGINT) AS nt FROM bgc
)"""


def kn_scored_ctes(keys: str, held_where: str, src: str = "t") -> str:
    """held/db/scored CTE chain scoring bigrams grouped by ``keys``
    (C142: 'source' over the odd held-out half; the corpus-clean gate:
    'doc_id' over the whole corpus, held_where=''). ``src`` swaps the
    HELD relation — any (doc_id, source, l) frame, e.g. the clipped
    slice for the corpus-export provenance score — while the model
    stays trained on the raw even half (KN_MODEL_CTES' t)."""
    return f"""held AS (
  SELECT source, doc_id,
         unnest(l[1:len(l) - 1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM {src} {held_where}
), db AS (
  SELECT {keys}, w1, w2, CAST(count(*) AS BIGINT) AS cnt
  FROM held GROUP BY {keys}, w1, w2
), scored AS (
  SELECT db.{keys}, db.cnt,
         CAST(CASE WHEN ctx.c1 IS NULL
                   THEN CAST(coalesce(cont.ncont, 0) AS HUGEINT)
                        * 1000000 // nt
              ELSE (CAST(greatest(4 * coalesce(bgc.c12, 0) - 3, 0)
                         AS HUGEINT) * nt
                    + CAST(3 AS HUGEINT) * ctx.n1
                      * coalesce(cont.ncont, 0)) * 1000000
                   // (CAST(4 AS HUGEINT) * ctx.c1 * nt)
         END AS BIGINT) AS p_micro,
         CASE WHEN bgc.c12 IS NULL THEN 1 ELSE 0 END AS unseen_pair,
         CASE WHEN ctx.c1 IS NULL THEN 1 ELSE 0 END AS unseen_ctx
  FROM db
  LEFT JOIN bgc USING (w1, w2)
  LEFT JOIN ctx USING (w1)
  LEFT JOIN cont USING (w2)
  CROSS JOIN ntot
)"""


_KN_ORACLE = f"""
WITH {KN_MODEL_CTES}, {kn_scored_ctes("source", "WHERE doc_id % 2 = 1")}, docs_n AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM held GROUP BY source
)
SELECT s.source,
       d.n_docs,
       CAST(sum(s.cnt) AS BIGINT) AS n_bigrams,
       CAST(sum(s.cnt * s.p_micro) AS BIGINT) AS sum_p_micro,
       CAST(CAST(sum(s.cnt * s.p_micro) AS BIGINT)
            // CAST(sum(s.cnt) AS BIGINT) AS BIGINT) AS mean_p_micro,
       CAST(sum(s.cnt * s.unseen_pair) AS BIGINT) AS n_unseen_pairs,
       CAST(sum(s.cnt * s.unseen_ctx) AS BIGINT) AS n_unseen_ctx
FROM scored s JOIN docs_n d USING (source)
GROUP BY s.source, d.n_docs
ORDER BY s.source
"""


# Spark-side twin of kn_scored_ctes' p_micro CASE — shared verbatim by
# C142 and the corpus-clean KN gate (pipelines/corpus.py).
KN_P_MICRO_SPARK = (
    # Products widened to DECIMAL(38,0) (DuckDB: HUGEINT) —
    # c1*nt alone exceeds int64 once the corpus passes ~2.3e12
    # distinct-bigram-type x context-count mass, well inside
    # the 100 TB design point; `div` on DECIMAL still returns
    # BIGINT and the quotient is <= 1e6 by construction.
    "CASE WHEN c1 IS NULL THEN"
    " (CAST(coalesce(ncont, CAST(0 AS BIGINT)) AS DECIMAL(38,0))"
    " * 1000000) div nt"
    " ELSE (CAST(greatest(4 * coalesce(c12, CAST(0 AS BIGINT)) - 3,"
    " CAST(0 AS BIGINT)) AS DECIMAL(38,0)) * nt"
    " + CAST(3 AS DECIMAL(38,0)) * n1"
    " * coalesce(ncont, CAST(0 AS BIGINT))) * 1000000"
    " div (CAST(4 AS DECIMAL(38,0)) * c1 * nt) END AS p_micro"
)

_KN_PAIRS_EXPR = (
    "explode(zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
    " (x, y) -> struct(x AS w1, y AS w2))) AS p"
)


def kn_split_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, source, l) with the <2-token docs dropped — the shared
    `t` CTE."""
    return docs.select(
        "doc_id", "source", F.split("text", " ").alias("l")
    ).filter(F.size("l") >= 2)


def kn_model_tables(docs_l: DataFrame):
    """Train the d=3/4 interpolated-KN bigram model on the even-doc_id
    half: returns (bgc, ctx, cont, ntot) — the exact Spark twin of
    KN_MODEL_CTES."""
    train = (
        docs_l.filter("doc_id % 2 = 0")
        .selectExpr(_KN_PAIRS_EXPR)
        .select("p.w1", "p.w2")
    )
    bgc = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    ctx = bgc.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1"),
    )
    cont = bgc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("ncont"))
    ntot = bgc.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    return bgc, ctx, cont, ntot


def kn_score_bigrams(
    docs_l: DataFrame,
    keys: list[str],
    held_filter: str | None,
    held_l: DataFrame | None = None,
):
    """Per-``keys`` scored bigram table (keys + cnt, p_micro,
    unseen_pair, unseen_ctx) — the exact Spark twin of kn_scored_ctes.
    ``held_l`` swaps the held relation (kn_scored_ctes' src twin) while
    the model stays trained on docs_l's even half."""
    bgc, ctx, cont, ntot = kn_model_tables(docs_l)
    held = held_l if held_l is not None else docs_l
    held = held.filter(held_filter) if held_filter else held
    db = (
        held.selectExpr("source", "doc_id", _KN_PAIRS_EXPR)
        .select("source", "doc_id", "p.w1", "p.w2")
        .groupBy(*keys, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        db.join(bgc, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(ntot))
        .selectExpr(
            *keys,
            "cnt",
            KN_P_MICRO_SPARK,
            "CASE WHEN c12 IS NULL THEN 1 ELSE 0 END AS unseen_pair",
            "CASE WHEN c1 IS NULL THEN 1 ELSE 0 END AS unseen_ctx",
        )
    )


@query("q_kn_quality", oracle=_KN_ORACLE)
def q_kn_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C142: interpolated Kneser-Ney bigram LM, trained on the
    even-doc_id half of the corpus and scoring the HELD-OUT odd half —
    the proper split that makes unseen bigram pairs and unseen
    contexts actually occur, exercising the continuation-probability
    backoff KN exists for (an LM scored on its own training data never
    backs off). Per source: held-out doc/bigram totals, the
    micro-quantized mean KN probability (the quality signal — higher
    = more fluent under the train LM), and unseen pair/context rates.

    All arithmetic is exact integer (see module comment): the d = 3/4
    discount makes every P an exact integer ratio, the numerator and
    denominator products are widened to DECIMAL(38,0)/HUGEINT so
    c1*Ntot cannot overflow int64 at corpus scale, and quantization is
    integer division — Spark `div` == DuckDB `//` on nonnegative
    values. Plan shape: one explode per split, three hash-agg model
    tables keyed on words (equi-joined, never broadcast by hand — the
    vocabulary scales with the corpus), the 1-row Ntot attached via
    broadcast cross join, map-side-combined final rollup per source.

    Model + scoring are the shared kn_model_tables / kn_score_bigrams
    helpers, reused verbatim by the KN-gated corpus clean
    (pipelines/corpus.py q_corpus_clean_scored) — one template on both
    engines, per the r8 verdict."""
    docs = kn_split_docs(load(spark, sf_dir, "documents"))
    scored = kn_score_bigrams(docs, ["source"], "doc_id % 2 = 1")
    docs_n = (
        docs.filter("doc_id % 2 = 1")
        .groupBy("source")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("p_micro")).cast("long").alias("sum_p_micro"),
            F.sum(F.col("cnt") * F.col("unseen_pair")).cast("long").alias("n_unseen_pairs"),
            F.sum(F.col("cnt") * F.col("unseen_ctx")).cast("long").alias("n_unseen_ctx"),
        )
        .join(docs_n, "source")
        .selectExpr(
            "source", "n_docs", "n_bigrams", "sum_p_micro",
            "sum_p_micro div n_bigrams AS mean_p_micro",
            "n_unseen_pairs", "n_unseen_ctx",
        )
        .orderBy("source")
    )
