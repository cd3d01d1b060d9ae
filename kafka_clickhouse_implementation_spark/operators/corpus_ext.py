"""Corpus-engineering round 3: benchmark decontamination and data-mix
weighting — the two pretraining-pipeline steps not already covered by
the dedup/text tiers.

Decontamination: before training, any document sharing a long-enough
n-gram with an evaluation benchmark must be dropped (else the model
memorizes test answers). The scalable shape is exactly near-dup
candidate generation: shingle both sides, equi-join on the shingle,
semi-join the hits back — never a quadratic document comparison, and
the shuffle carries (shingle-hash, doc_id) pairs, not text.

Mixture weights: given per-source document counts and target shares,
the per-source resampling weight is target_share / actual_share. Kept
as one IEEE division of exact integer ratios (weight = target_permille
* total / (1000 * n_source)) so both engines emit identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.minhash_portable import _shingles
from kafka_clickhouse_implementation_spark.registry import query

# docs with doc_id % 10 == 9 play the held-out benchmark set — a modulo
# split so the slice is non-empty at every scale factor


@query(
    "q_decontaminate",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ), corpus AS (
      SELECT * FROM sh WHERE doc_id % 10 <> 9
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 9
    ), hits AS (
      SELECT DISTINCT c.doc_id
      FROM corpus c JOIN bench b ON c.s = b.s
    )
    SELECT (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
            FROM documents WHERE doc_id % 10 <> 9) AS n_corpus,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_contaminated
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination audit: corpus docs sharing ANY 3-token
    shingle with the benchmark slice (doc_id % 10 == 9) are
    contaminated. Plan: shared shingle subtree from the
    MinHash pipeline, distinct benchmark shingles (dedup before the
    join bounds its fan-out), one equi-join + distinct — the real
    pipeline would anti-join the flagged ids against the corpus, same
    shapes."""
    sh = _shingles(load(spark, sf_dir, "documents"))
    corpus = sh.filter(F.col("doc_id") % 10 != 9)
    bench = sh.filter(F.col("doc_id") % 10 == 9).select("s").distinct()
    hits = corpus.join(bench, "s").select("doc_id").distinct()
    n_corpus = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 != 9)
        .agg(F.count_distinct("doc_id").alias("n_corpus"))
    )
    return n_corpus.crossJoin(
        F.broadcast(hits.agg(F.count("*").alias("n_contaminated")))
    )


# Upsample src0-src2, keep src3-src5, drop the long tail to a floor —
# the testdata's sources are src0..src19, uniformly distributed
_TARGET_PERMILLE = {
    "src0": 300, "src1": 200, "src2": 100,
    "src3": 50, "src4": 50, "src5": 50,
}


@query(
    "q_mixture_weights",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ), total AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
    ), targets(source, permille) AS (
      VALUES {", ".join(f"('{s}', {p})" for s, p in sorted(_TARGET_PERMILLE.items()))}
    )
    SELECT c.source, c.n,
           CAST(COALESCE(tg.permille, 0) AS BIGINT) AS target_permille,
           CAST(COALESCE(tg.permille, 0) * t.total AS DOUBLE)
             / CAST(1000 * c.n AS DOUBLE) AS weight
    FROM counts c
    LEFT JOIN targets tg ON tg.source = c.source
    CROSS JOIN total t
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix weighting: per-source resampling weight to hit a target
    mixture (weight > 1 → upsample, < 1 → downsample). The weight is a
    single IEEE division of exact int64 products — bit-identical across
    engines; unknown sources get target 0. At 100 TB this is a
    vocab-sized aggregate + broadcast of a constant table."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    targets = spark.createDataFrame(
        sorted(_TARGET_PERMILLE.items()), "source string, permille long"
    )
    return (
        counts.join(F.broadcast(targets), "source", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n",
            F.coalesce("permille", F.lit(0)).alias("target_permille"),
            (
                (F.coalesce("permille", F.lit(0)) * F.col("total")).cast("double")
                / (F.lit(1000) * F.col("n")).cast("double")
            ).alias("weight"),
        )
    )


# ---------------------------------------------------------------------
# Chunk-level (paragraph/line) exact dedup — round 6 (C113).
# ---------------------------------------------------------------------

CHUNK_W = 12  # words per chunk (the corpus is flat word streams; on
# real text the split is '\n' — the operator is the same either way)

_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
ch AS (
  SELECT doc_id, source, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(w.w[u.i * {CHUNK_W} + 1 : u.i * {CHUNK_W} + {CHUNK_W}],
                             ' ')) AS h,
         len(w.w[u.i * {CHUNK_W} + 1 : u.i * {CHUNK_W} + {CHUNK_W}]) AS n_words
  FROM w, unnest(range((len(w.w) - 1) // {CHUNK_W} + 1)) AS u(i)
),
first_doc AS (SELECT h, min(doc_id) AS fd FROM ch GROUP BY h),
first_pos AS (
  SELECT c.h, c.doc_id AS fd, min(c.pos) AS fp
  FROM ch c JOIN first_doc f ON c.h = f.h AND c.doc_id = f.fd
  GROUP BY c.h, c.doc_id
),
marked AS (
  SELECT c.source, c.n_words,
         CASE WHEN c.doc_id = f.fd AND c.pos = f.fp THEN 1 ELSE 0 END AS kept
  FROM ch c JOIN first_pos f ON c.h = f.h
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(kept) AS BIGINT) AS n_dup,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(CASE WHEN kept = 1 THEN n_words ELSE 0 END) AS BIGINT) AS kept_words,
       CAST(sum(kept) AS DOUBLE) / count(*) AS keep_ratio
FROM marked GROUP BY source
"""


@query("q_chunk_dedup", oracle=_CHUNK_ORACLE)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (RefinedWeb/CCNet line-dedup shape):
    split every document into fixed 12-word chunks, keep only the
    GLOBAL first occurrence of each chunk (ordered by (doc_id, pos) —
    the keep-lowest rule near-dup CC also uses), and account the
    removal per source. The global first-occurrence shuffle is keyed
    by the chunk's md5 DIGEST, never the chunk text (the repo-wide
    dedup discipline — at 100 TB the shuffle carries 16-byte keys);
    the two-step min (first doc, then first pos within it) keeps the
    lexicographic-min portable without struct-ordering assumptions.
    Everything else is one posexplode + two digest-keyed hash aggs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    ch = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(w) - 1) div {CHUNK_W}), "
                f"i -> slice(w, i * {CHUNK_W} + 1, {CHUNK_W}))"
            )
        ).alias("pos", "cw"),
    ).select(
        "doc_id",
        "source",
        F.col("pos").cast("long").alias("pos"),
        F.md5(F.concat_ws(" ", F.col("cw"))).alias("h"),
        F.size("cw").cast("long").alias("n_words"),
    )
    first_doc = ch.groupBy("h").agg(F.min("doc_id").alias("fd"))
    first_pos = (
        ch.join(first_doc, "h")
        .filter(F.col("doc_id") == F.col("fd"))
        .groupBy("h", "fd")
        .agg(F.min("pos").alias("fp"))
    )
    marked = ch.join(first_pos, "h").select(
        "source",
        "n_words",
        F.when(
            (F.col("doc_id") == F.col("fd")) & (F.col("pos") == F.col("fp")), 1
        )
        .otherwise(0)
        .alias("kept"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("kept").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("long").alias("n_dup"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("kept_words"),
        (F.sum("kept").cast("double") / F.count(F.lit(1))).alias("keep_ratio"),
    )


# ---------------------------------------------------------------------
# Character-gram substring-duplication accounting — round 6 (C115).
# ---------------------------------------------------------------------

GRAM_LEN = 20  # characters per gram (ExactSubstr uses 50-token spans;
# 20 chars ~ 3-4 words of this corpus)
GRAM_STRIDE = 4  # sampling stride — bounds gram volume at 1/4 of chars

_SUBSTR_ORACLE = f"""
WITH g AS (
  SELECT doc_id, source,
         md5(unnest(list_transform(range((length(text) - {GRAM_LEN}) // {GRAM_STRIDE} + 1),
                                   i -> substr(text, i * {GRAM_STRIDE} + 1, {GRAM_LEN}))))
           AS h
  FROM documents
  WHERE length(text) >= {GRAM_LEN}
),
cnt AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY h
)
SELECT g.source,
       CAST(count(*) AS BIGINT) AS n_positions,
       CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_positions,
       CAST(count(DISTINCT g.h) AS BIGINT) AS n_distinct_grams,
       CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS dup_ratio
FROM g JOIN cnt c ON g.h = c.h
GROUP BY g.source
"""


@query("q_substring_dup", oracle=_SUBSTR_ORACLE)
def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring duplication accounting — the
    measurement half of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"),
    approximated with strided fixed-length character grams instead of
    a suffix array: every 20-char gram sampled at stride 4 is hashed,
    grams occurring in MORE THAN ONE distinct document mark their
    positions as duplicated span, and the per-source duplication ratio
    is reported. The shuffle carries (md5, doc_id) pairs — never text;
    a suffix-array build is a single-machine algorithm, while this
    strided-gram form is two digest-keyed hash aggregations that scale
    like word-shingle decontamination (C46). Stride and gram length
    trade recall for volume; both are declared constants."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= GRAM_LEN)
    g = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, (length(text) - {GRAM_LEN}) div {GRAM_STRIDE}), "
                f"i -> md5(substr(text, i * {GRAM_STRIDE} + 1, {GRAM_LEN})))"
            )
        ).alias("h"),
    )
    # r16 restructure (guide §2.4, §1.2): the r15 plan evaluated the
    # md5-gram explode TWICE (once for the per-gram doc count, once as
    # the join probe side) and shuffled the full position table into a
    # gram-keyed join. Instead: ONE gram pass, pre-aggregated to
    # distinct (h, doc) rows with the per-doc position count riding
    # along, n_docs as a plain count over a WINDOW on h (no distinct
    # needed — rows are per (h, doc) by construction; doc_id determines
    # source, so grouping by (h, doc_id, source) is grouping by
    # (h, doc_id)), and the same per-source totals reconstructed from
    # the np weights: n_positions = sum(np), dup positions =
    # sum(np where n_docs > 1), distinct grams unchanged. The explicit
    # repartition("h") establishes the partitioning ONCE — the groupBy
    # (clustering-subset rule) and the window both reuse it, so the
    # gram rows cross exactly one exchange.
    gd = (
        g.repartition("h")
        .groupBy("h", "doc_id", "source")
        .agg(F.count(F.lit(1)).alias("np"))
    )
    gd = gd.withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("h")))
    return gd.groupBy("source").agg(
        F.sum("np").cast("long").alias("n_positions"),
        F.sum(F.when(F.col("n_docs") > 1, F.col("np")).otherwise(0))
        .cast("long")
        .alias("n_dup_positions"),
        F.countDistinct("h").alias("n_distinct_grams"),
        (
            F.sum(F.when(F.col("n_docs") > 1, F.col("np")).otherwise(0)).cast(
                "double"
            )
            / F.sum("np")
        ).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------
# Deterministic curriculum interleave — round 6 (C121).
# ---------------------------------------------------------------------

_SCHED_N = 64

_SCHED_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS n_s
  FROM documents
)
SELECT source, doc_id, CAST(r AS BIGINT) AS r, CAST(n_s AS BIGINT) AS n_s,
       CAST(2 * r - 1 AS DOUBLE) / CAST(2 * n_s AS DOUBLE) AS sched_key
FROM r
ORDER BY sched_key, source, doc_id
LIMIT {_SCHED_N}
"""


@query("q_curriculum_schedule", oracle=_SCHED_ORACLE)
def q_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order interleave (the data-ordering step
    of a pretraining pipeline): each source's documents take evenly
    spaced positions key = (2r−1)/(2·n_s) on [0, 1) — the stratified
    low-discrepancy interleave, so a batch prefix of the schedule
    contains every source in proportion without any RNG. The first 64
    scheduled docs are emitted (TakeOrdered — no global window, no
    full sort materialization; the per-source rank is a PARTITIONED
    window). The key is one IEEE division over exact integers —
    engine-portable bit-for-bit. At 100 TB the schedule is never
    materialized: the key is a generated column that any consumer
    sorts or range-partitions by."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy("doc_id")
    r = d.select(
        "source",
        "doc_id",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("source")).cast("long").alias("n_s"),
    )
    keyed = r.select(
        "source",
        "doc_id",
        "r",
        "n_s",
        (
            (F.lit(2) * F.col("r") - F.lit(1)).cast("double")
            / (F.lit(2) * F.col("n_s")).cast("double")
        ).alias("sched_key"),
    )
    return keyed.orderBy("sched_key", "source", "doc_id").limit(_SCHED_N)


# ---------------------------------------------------------------------
# ExactSubstr clipping — round 9 (C143): the TRANSFORMATION half of
# C115 (Lee et al. 2022, "Deduplicating Training Data Makes Language
# Models Better"). C115 measures cross-document substring duplication;
# this operator REMOVES it: every occurrence of a duplicated gram
# except the global first (first-occurrence-wins by (doc_id, pos), the
# same keep rule as chunk dedup C113) marks its character range
# [pos, pos + GRAM_LEN) for clipping; per-document the ranges are
# union-merged (classic running-max interval islands) and the kept
# complement spans are reassembled into the clipped text.
#
# Scale shape: the shuffles carry (md5, doc_id, pos) — never text; the
# interval merge is a PER-DOCUMENT window (partitioned by doc_id, no
# global sort); span arrays and the reassembly fold are bounded by
# doc-length/GRAM_STRIDE, and a document is single-machine-sized by
# definition. Reference analogue: none (the kafka+clickhouse tutorial
# has no dedup tier); this is Tier-C closure per the round-8 verdict.
# ---------------------------------------------------------------------

def _clip_spans_sql(src: str = "documents") -> str:
    """The interval-arithmetic CTE chain (gram → dup → first-occurrence
    → clip ranges → merged islands → per-doc span stats), parametrized
    on the input relation so the sampled composition (C149) can clip a
    doc_id slice instead of the whole corpus — ONE template, no
    drift."""
    return f"""
WITH g AS (
  SELECT doc_id, CAST(u.i * {GRAM_STRIDE} + 1 AS BIGINT) AS pos,
         md5(substr(text, CAST(u.i * {GRAM_STRIDE} + 1 AS INTEGER), {GRAM_LEN})) AS h
  FROM {src}, unnest(range((length(text) - {GRAM_LEN}) // {GRAM_STRIDE} + 1)) AS u(i)
  WHERE length(text) >= {GRAM_LEN}
), fagg AS (
  -- pre-aggregated duplicated grams (r12 verdict item 4): one pass
  -- collapses the old dupg/gd/fd chain — digest -> first-occurrence
  -- doc, duplicated only — so the replay never materializes the
  -- g-sized all-occurrences intermediate that blew DuckDB's temp
  -- disk at sf1; the pair join below restricts g to duplicated
  -- digests implicitly (fp holds only fagg's digests).
  SELECT h, min(doc_id) AS fdoc
  FROM g GROUP BY h HAVING count(DISTINCT doc_id) > 1
), fp AS (
  SELECT g.h, g.doc_id AS fdoc, min(g.pos) AS fpos
  FROM g JOIN fagg ON g.h = fagg.h AND g.doc_id = fagg.fdoc
  GROUP BY g.h, g.doc_id
), clip AS (
  SELECT g.doc_id, g.pos, g.pos + {GRAM_LEN} AS end_
  FROM g JOIN fp ON g.h = fp.h
  WHERE NOT (g.doc_id = fp.fdoc AND g.pos = fp.fpos)
), isl AS (
  SELECT doc_id, pos, end_,
         CASE WHEN coalesce(max(end_) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) < pos
              THEN 1 ELSE 0 END AS new_island
  FROM clip
), isl2 AS (
  SELECT doc_id, pos, end_,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, island, min(pos) AS s, max(end_) AS e
  FROM isl2 GROUP BY doc_id, island
), doc_clip AS (
  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS clipped_chars,
         CAST(count(*) AS BIGINT) AS n_clip_spans
  FROM spans GROUP BY doc_id
)
"""


_CLIP_SPANS_SQL = _clip_spans_sql()

_CLIP_ORACLE = f"""
{_CLIP_SPANS_SQL}
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
       CAST(sum(length(d.text)) - sum(coalesce(c.clipped_chars, 0)) AS BIGINT)
         AS kept_chars,
       CAST(sum(coalesce(c.clipped_chars, 0)) AS BIGINT) AS clipped_chars,
       CAST(sum(coalesce(c.n_clip_spans, 0)) AS BIGINT) AS n_clip_spans,
       CAST(sum(coalesce(c.clipped_chars, 0)) AS DOUBLE)
         / CAST(sum(length(d.text)) AS DOUBLE) AS clip_ratio
FROM documents d LEFT JOIN doc_clip c USING (doc_id)
GROUP BY d.source
"""


def substring_clip(docs: DataFrame) -> DataFrame:
    """The clipped corpus: one row per input document with the
    duplicated character ranges removed.

    Returns (doc_id, source, text, kept_text, clipped_chars,
    n_clip_spans); kept_text is the concatenation of the complement
    spans, assembled by ONE fold over the per-doc merged-span array —
    so downstream consumers (and q_substring_clip's aggregate) measure
    the actual transformed string, not a promise about it."""
    d = docs.select("doc_id", "source", "text")
    g = (
        d.filter(F.length("text") >= GRAM_LEN)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (length(text) - {GRAM_LEN}) div {GRAM_STRIDE}),"
                    f" i -> struct(CAST(i * {GRAM_STRIDE} + 1 AS BIGINT) AS pos,"
                    f" md5(substr(text, i * {GRAM_STRIDE} + 1, {GRAM_LEN})) AS h))"
                )
            ).alias("o"),
        )
        .select("doc_id", "o.pos", "o.h")
    )
    # r16 (guide §2.4): the duplicated-gram gate as WINDOW functions
    # over ONE gram-keyed exchange. The r15 shape evaluated the md5
    # explode TWICE (the per-hash aggregate and the join probe side —
    # md5 over every strided position is the clip stage's dominant
    # CPU) and shuffled both sides into a sort-merge join on h (the
    # hint that fixed the r12 auto-broadcast blowup: 322.8 s / driver
    # OOM at sf10-30). The window form has NO join at all, so neither
    # failure mode exists: nd = max(dense_rank by doc_id) over the h
    # partition ≡ countDistinct(doc_id), first = the same
    # min(struct(doc_id, pos)) lexicographic minimum, and the gram
    # rows cross exactly one exchange, sorted once by (h, doc_id) —
    # the unordered whole-partition max/min windows reuse it. The
    # duplicated-gram gate and first-occurrence rule are byte-
    # identical: keep a position iff its gram occurs in >1 distinct
    # doc and it is not the (smallest doc_id, smallest pos) holder.
    wh = Window.partitionBy("h")
    who = Window.partitionBy("h").orderBy("doc_id")
    ge = (
        g.withColumn("dr", F.dense_rank().over(who))
        .withColumn("nd", F.max("dr").over(wh))
        .withColumn("first", F.min(F.struct("doc_id", "pos")).over(wh))
    )
    clip = (
        ge.filter(
            (F.col("nd") > 1)
            & ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .select("doc_id", "pos", (F.col("pos") + F.lit(GRAM_LEN)).alias("end_"))
    )
    # island merge IN-ROW: collect each doc's clip intervals once and
    # fold the sorted array into merged spans — replaces two windows
    # over (doc_id, pos) plus two groupBys (island labels, span
    # bounds) with ONE groupBy + a bounded fold. Same-island rule is
    # unchanged: an interval joins the current island iff its pos <=
    # the running max end (the old "new island iff max(prev end_) <
    # pos"), and the island's e is the running max end.
    iv = clip.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "end_"))).alias("ivs")
    )
    doc_clip = iv.select(
        "doc_id",
        F.expr(
            "aggregate(ivs,"
            " struct(CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>) AS sp,"
            "        CAST(-1 AS BIGINT) AS cs, CAST(-1 AS BIGINT) AS ce),"
            " (st, iv) -> CASE"
            "   WHEN st.cs < 0 THEN struct(st.sp AS sp, iv.pos AS cs, iv.end_ AS ce)"
            "   WHEN iv.pos <= st.ce THEN"
            "     struct(st.sp AS sp, st.cs AS cs, greatest(st.ce, iv.end_) AS ce)"
            "   ELSE struct(concat(st.sp, array(struct(st.cs AS s, st.ce AS e))) AS sp,"
            "               iv.pos AS cs, iv.end_ AS ce) END,"
            " st -> concat(st.sp, array(struct(st.cs AS s, st.ce AS e)))) AS spans"
        ),
    ).select(
        "doc_id",
        "spans",
        F.expr(
            "aggregate(spans, 0L, (a, x) -> a + (x.e - x.s))"
        ).alias("clipped_chars"),
        F.size("spans").cast("long").alias("n_clip_spans"),
    )
    return d.join(doc_clip, "doc_id", "left").select(
        "doc_id",
        "source",
        "text",
        F.expr(
            # fold over the sorted merged spans: emit [cur, span.s),
            # jump cur to span.e; finish with the tail [cur, len].
            # Empty/missing span arrays return the text unchanged.
            "CASE WHEN spans IS NULL THEN text ELSE aggregate(spans,"
            " struct(CAST(1 AS BIGINT) AS cur, CAST('' AS STRING) AS acc),"
            " (st, iv) -> struct(iv.e AS cur,"
            "   concat(st.acc, substring(text, CAST(st.cur AS INT),"
            "     CAST(iv.s - st.cur AS INT))) AS acc),"
            " st -> concat(st.acc, substring(text, CAST(st.cur AS INT),"
            "   CAST(length(text) - st.cur + 1 AS INT)))) END"
        ).alias("kept_text"),
        F.coalesce("clipped_chars", F.lit(0)).cast("long").alias("clipped_chars"),
        F.coalesce("n_clip_spans", F.lit(0)).cast("long").alias("n_clip_spans"),
    )


@query("q_substring_clip", oracle=_CLIP_ORACLE)
def q_substring_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C143: ExactSubstr REMOVAL accounting over the clipped corpus —
    per source: docs, total/kept/clipped character counts and merged
    clip-span counts, plus the clip ratio (one IEEE division of exact
    integer sums). kept_chars is measured as sum(length(kept_text)) of
    the ACTUALLY ASSEMBLED strings while the oracle derives it as
    total - clipped from pure interval arithmetic — a span-assembly
    bug on the Spark side therefore hash-FAILS instead of passing on
    bookkeeping alone (same adversarial-oracle stance as the CC
    convergence probe in q_corpus_clean_portable). Reads the persisted
    clip product (round 14 — built once per testdata identity; lazy
    import to keep the operators -> pipelines edge out of module
    import time)."""
    from kafka_clickhouse_implementation_spark.pipelines.corpus import (
        clipped_corpus,
    )

    out = clipped_corpus(spark, sf_dir, mod=1)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.length("kept_text")).cast("long").alias("kept_chars"),
        F.sum("clipped_chars").cast("long").alias("clipped_chars"),
        F.sum("n_clip_spans").cast("long").alias("n_clip_spans"),
        (
            F.sum("clipped_chars").cast("double")
            / F.sum(F.length("text")).cast("double")
        ).alias("clip_ratio"),
    )


# The clip chain re-expressed as a PRELUDE for composition into the
# corpus-clean oracle template (q_corpus_clean_clipped, C148): the
# span arithmetic is _CLIP_SPANS_SQL verbatim; the kept-text
# REASSEMBLY is fully relational — per-span gap pieces via lag() plus
# the tail piece, stitched by an ordered string_agg (no list fold: the
# clean template's oracle must stay clear of DuckDB's list_reduce
# list-output corruption, and string_agg ... ORDER BY is
# deterministic by construction).
def clip_prelude_sql(src: str = "documents") -> str:
    """The clip chain as a PRELUDE over an arbitrary input relation —
    `src` narrows the corpus for the sampled composition (C149: the
    slice must be taken BEFORE clipping, which is exactly what bounds
    the oracle's gram/pair volume at sf1)."""
    return (
        _clip_spans_sql(src).split("WITH ", 1)[1]
        + f""", gapped AS (
  SELECT doc_id, s, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s),
                  CAST(1 AS BIGINT)) AS cur
  FROM spans
), piecesk AS (
  SELECT g.doc_id, g.s AS ord,
         substring(d2.text, CAST(g.cur AS INT), CAST(g.s - g.cur AS INT))
           AS piece
  FROM gapped g JOIN {src} d2 USING (doc_id)
  UNION ALL
  SELECT mx.doc_id, CAST(1000000000000000 AS BIGINT) AS ord,
         substring(d2.text, CAST(mx.e AS INT),
                   CAST(len(d2.text) - mx.e + 1 AS INT))
  FROM (SELECT doc_id, max(e) AS e FROM spans GROUP BY doc_id) mx
  JOIN {src} d2 USING (doc_id)
), kt AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS kept_text
  FROM piecesk GROUP BY doc_id
), clipped AS MATERIALIZED (
  -- MATERIALIZED is load-bearing (r13, measured at sf1): the clean
  -- template's final SELECT holds five scalar subqueries over
  -- base/ok/kept/losers, and DuckDB's default inlining re-expands
  -- the ENTIRE clip chain (g included) into each — the composed
  -- replay blew 80+ GB of temp disk that way, while the whole
  -- prelude materializes in ~3 s / ~1 M chars at sf1.
  SELECT d.doc_id, coalesce(k.kept_text, d.text) AS text
  FROM {src} d LEFT JOIN kt k USING (doc_id)
), """
    )


CLIP_PRELUDE_SQL = clip_prelude_sql()
