"""Packed training shards — round 12 (C177): the LLM pipeline's TRUE
deliverable. Every clean so far ships text (C165/C176) or audit counts;
a training job reads TOKENS: fixed-length token-id sequences, packed
GPT-style (documents concatenated in a deterministic order, an
end-of-sequence token after each document, the stream chopped into
SEQ_LEN-token rows), written as parquet shards next to the tokenizer
vocabulary that decodes them.

Composition (every stage individually certified in earlier rounds):
  C149 sampled clip→clean   — the kept set (doc_id % 10 slice →
                              ExactSubstr clip → quality gate → exact
                              dedup → MinHash-LSH → CC → keep-one);
  C135/C140 BPE             — merges trained on the FULL raw corpus
                              (train once, encode everything — the
                              production split), final per-WORD
                              segmentation joined to the kept words
                              (vocabulary factorization);
  C36 ranged prefix         — BOTH global total orders (vocabulary →
                              token ids, token stream → positions)
                              via the range-shuffle + P-row-offset
                              pattern — no single-partition window
                              anywhere;
  C165 write/read-back      — shards written partitioned by
                              shard = seq_id % N_SHARDS, the certified
                              result READ BACK from the files with
                              n_tokens and the content fingerprint
                              re-derived from the on-disk arrays, so a
                              lossy or corrupt write hash-FAILS.

Token-id contract (what the read-back certifies):
  - vocabulary = the DISTINCT pieces of the final BPE segmentation of
    the raw corpus, tok_id = 1-based rank in piece order (engine-
    portable: no hash, no nondeterminism); EOS = '</s>' = tok_id 0,
    disjoint from the [a-z_] piece alphabet;
  - stream order = (doc_id, word index, piece index), EOS at each
    document end (widx = 2^31-1 > any real word index);
  - seq_id = global_pos div SEQ_LEN; the tail sequence is kept short
    (n_tokens < SEQ_LEN) rather than padded — provenance records it.

Provenance per sequence: token count, distinct-doc count, first/last
doc_id (the doc span), and the sorted distinct source mix.

Detokenization is EXACT by construction — pieces concatenate to
words ending in the '_' end-of-word marker, EOS cuts documents — and
pinned by tests/test_token_shards.py, which rebuilds every kept
document's text from the written shards + vocab and compares it to the
kept corpus verbatim.

Scale shape: the clean is the certified C149 plan; segmentation is one
equi-join on the word (broadcast under BROADCAST_VOCAB_MAX, shuffle
above — the C140 guard); both global orders are ranged_prefix (one
range Exchange + P metadata rows each); the per-sequence assembly
shuffles (seq_id, pos, tok_id) ints — never text — and the write is
one partitioned parquet append. At 1000 executors nothing exceeds the
token-stream shuffle, which is the job's output size.

Reference anchor: the reference's whole point is a queryable product
table fed by a pipeline (kafka+clickhouse.md:92-103); this is that
product for LLM training data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.cachedirs import source_tagged_dir
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.bpe import (
    BPE_ROUNDS,
    BROADCAST_VOCAB_MAX,
    _oracle_sql,
    _symbolized_vocab,
    _train_full,
)
from kafka_clickhouse_implementation_spark.operators.components import (
    connected_components,
)
from kafka_clickhouse_implementation_spark.operators.corpus_ext import (
    clip_prelude_sql,
    substring_clip,
)
from kafka_clickhouse_implementation_spark.operators.minhash_portable import (
    verified_pairs,
)
from kafka_clickhouse_implementation_spark.plans.prefix import ranged_prefix
from kafka_clickhouse_implementation_spark.registry import query

SEQ_LEN = 128  # tokens per packed training sequence
N_SHARDS = 8  # shard = seq_id % N_SHARDS (the write's partition key)
EOS = "</s>"  # document separator, tok_id 0 (outside the [a-z_] alphabet)
_EOS_WIDX = 2**31 - 1  # sorts after any real word index within a doc
SHARD_SLICE_MOD = 10  # the C149 oracle-bounding doc_id slice


_DEFAULT_SHARD_FINAL = f""", seqsrc AS (
  SELECT seq_id, string_agg(source, ',' ORDER BY source) AS sources
  FROM (SELECT DISTINCT pos // {SEQ_LEN} AS seq_id, source FROM stream)
  GROUP BY seq_id
), seqs AS (
  SELECT pos // {SEQ_LEN} AS seq_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(min(doc_id) AS BIGINT) AS first_doc,
         CAST(max(doc_id) AS BIGINT) AS last_doc,
         md5(string_agg(CAST(tok_id AS VARCHAR), ',' ORDER BY pos)) AS fp
  FROM stream GROUP BY pos // {SEQ_LEN}
)
SELECT CAST(s.seq_id AS BIGINT) AS seq_id, s.n_tokens, s.n_docs,
       s.first_doc, s.last_doc, x.sources, s.fp
FROM seqs s JOIN seqsrc x USING (seq_id)
"""


def _shards_oracle(final_sql: str | None = None) -> str:
    """Independent DuckDB replay: the BPE chain (verbatim C135/C140
    CTEs over the raw corpus) + the C149 clean CTEs + tokenize + the
    global packing order, ending in ``final_sql`` (default: the
    per-sequence shard rows — C180 swaps in the per-source mixture
    rollup over the SAME stream CTE). Continues the BPE WITH-chain via
    final_select (w{BPE_ROUNDS} is the final segmented vocab)."""
    from kafka_clickhouse_implementation_spark.pipelines.corpus import (
        _clean_ctes,
    )

    prelude = (
        "docs10 AS MATERIALIZED"
        f" (SELECT * FROM documents WHERE doc_id % {SHARD_SLICE_MOD} = 0), "
        + clip_prelude_sql("docs10")
    )
    final = f"w{BPE_ROUNDS}"
    return _oracle_sql(
        final_select=f""",
{_clean_ctes(prelude=prelude, src="clipped")},
keptdocs AS MATERIALIZED (
  SELECT k.doc_id, c.text, d.source
  FROM kept k
  JOIN clipped c USING (doc_id)
  JOIN docs10 d USING (doc_id)
  LEFT JOIN losers lo ON lo.id = k.doc_id
  WHERE lo.id IS NULL
), words AS (
  SELECT doc_id, source, CAST(u.i + 1 AS BIGINT) AS widx,
         l[CAST(u.i + 1 AS INTEGER)] AS w
  FROM (SELECT doc_id, source, string_split(text, ' ') AS l
        FROM keptdocs),
       unnest(range(len(l))) AS u(i)
), wpieces AS MATERIALIZED (
  SELECT w, CAST(u.i + 1 AS BIGINT) AS pidx,
         ps[CAST(u.i + 1 AS INTEGER)] AS piece
  FROM (SELECT w, string_split(trim(s), ' ') AS ps FROM {final}),
       unnest(range(len(ps))) AS u(i)
), vocab AS MATERIALIZED (
  SELECT piece, CAST(row_number() OVER (ORDER BY piece) AS BIGINT) AS tok_id
  FROM (SELECT DISTINCT piece FROM wpieces)
  UNION ALL
  SELECT '{EOS}' AS piece, CAST(0 AS BIGINT) AS tok_id
), stream AS MATERIALIZED (
  SELECT t.doc_id, t.source, v.tok_id,
         row_number() OVER (ORDER BY t.doc_id, t.widx, t.pidx) - 1 AS pos
  FROM (
    SELECT wo.doc_id, wo.source, wo.widx, wp.pidx, wp.piece
    FROM (SELECT * FROM words WHERE w <> '') wo
    JOIN wpieces wp USING (w)
    UNION ALL
    SELECT doc_id, source, CAST({_EOS_WIDX} AS BIGINT) AS widx,
           CAST(1 AS BIGINT) AS pidx, '{EOS}' AS piece
    FROM keptdocs
  ) t JOIN vocab v USING (piece)
){final_sql or _DEFAULT_SHARD_FINAL}"""
    )


def clean_kept(docs: DataFrame) -> DataFrame:
    """The C149 kept set WITH TEXT over a (doc_id, text, source) frame:
    clip → heuristic gate → exact dedup → LSH near-dup → CC →
    keep-one. Gate and dedup outputs pinned (the C148 funnel
    convention). Shared by the batch slice (C177) and the drained
    document wire (C179)."""
    from kafka_clickhouse_implementation_spark.pipelines.corpus import (
        exact_dedup,
        quality_filter,
    )

    clipped = (
        substring_clip(docs)
        .select("doc_id", "source", F.col("kept_text").alias("text"))
        .localCheckpoint()
    )
    gated = quality_filter(clipped).localCheckpoint()
    exact = exact_dedup(gated).localCheckpoint()
    pairs = verified_pairs(exact.select("doc_id", "text"))
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    return exact.join(losers, "doc_id", "left_anti").select(
        "doc_id", "text", "source"
    )


def clean_kept_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_kept over the doc_id % SHARD_SLICE_MOD slice of the
    corpus — the C149 oracle-bounding scope."""
    return clean_kept(
        load(spark, sf_dir, "documents").filter(
            F.col("doc_id") % SHARD_SLICE_MOD == 0
        )
    )


def bpe_piece_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, pidx, piece): the final BPE segmentation of every raw-corpus
    word, exploded with 1-based piece positions — trained by the C135
    loop on the FULL corpus (the C140 train-once recipe)."""
    raw = load(spark, sf_dir, "documents")
    vocab_words = _symbolized_vocab(
        raw.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    _traj, final = _train_full(spark, vocab_words)
    return final.select(
        "w", F.posexplode(F.split(F.trim("s"), " ")).alias("pidx0", "piece")
    ).select("w", (F.col("pidx0") + 1).cast("long").alias("pidx"), "piece")


def token_vocab(wpieces: DataFrame) -> DataFrame:
    """(piece, tok_id): 1-based rank of the distinct pieces in piece
    order via ranged_prefix (C36 — a bare row_number here would be the
    single-partition cliff on a corpus-scale vocabulary), plus EOS at
    tok_id 0."""
    spark = wpieces.sparkSession
    ids = ranged_prefix(
        wpieces.select("piece").distinct(), [F.col("piece")], rn_col="tok_id"
    )
    return ids.unionByName(
        spark.createDataFrame([(EOS, 0)], "piece string, tok_id long")
    )


def positioned_stream(
    kept: DataFrame, wpieces: DataFrame, vocab: DataFrame
) -> DataFrame:
    """The packed token stream with exact global positions: tokenize
    kept docs with the segmentation table, append EOS per doc, assign
    positions via ranged_prefix over the unique total order (doc_id,
    widx, pidx). Returns (doc_id, source, tok_id, pos); shared by the
    sequence assembly (C177/C179) and the mixture rollup (C180)."""
    # vocabulary-factorized segmentation join — broadcast below the
    # C140 guard, shuffle above (a 100 TB vocabulary doesn't fit an
    # executor)
    small = vocab.count() <= BROADCAST_VOCAB_MAX
    wp = F.broadcast(wpieces) if small else wpieces
    vb = F.broadcast(vocab) if small else vocab
    words = (
        kept.select(
            "doc_id",
            "source",
            F.posexplode(F.split("text", " ")).alias("widx0", "w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id", "source", (F.col("widx0") + 1).cast("long").alias("widx"), "w"
        )
    )
    toks = words.join(wp, "w").select("doc_id", "source", "widx", "pidx", "piece")
    eos = kept.select(
        "doc_id",
        "source",
        F.lit(_EOS_WIDX).cast("long").alias("widx"),
        F.lit(1).cast("long").alias("pidx"),
        F.lit(EOS).alias("piece"),
    )
    stream = toks.unionByName(eos).join(vb, "piece")
    return ranged_prefix(
        stream,
        [F.col("doc_id"), F.col("widx"), F.col("pidx")],
        rn_col="rn",
    ).withColumn("pos", F.col("rn") - 1)


def pack_sequences(
    kept: DataFrame, wpieces: DataFrame, vocab: DataFrame
) -> DataFrame:
    """Assemble the positioned token stream into SEQ_LEN-token rows:
    (seq_id, shard, tok_ids, n_tokens, n_docs, first_doc, last_doc,
    sources)."""
    return (
        positioned_stream(kept, wpieces, vocab)
        .withColumn("seq_id", F.expr(f"pos div {SEQ_LEN}"))
        .groupBy("seq_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, tok_id))),"
                   " x -> x.tok_id)").alias("tok_ids"),
            F.count_distinct(F.col("doc_id")).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
                "sources"
            ),
        )
        .select(
            "seq_id",
            (F.col("seq_id") % N_SHARDS).cast("int").alias("shard"),
            "tok_ids",
            F.size("tok_ids").cast("long").alias("n_tokens"),
            "n_docs",
            "first_doc",
            "last_doc",
            "sources",
        )
    )


def write_token_shards(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize the product: shards/ (parquet partitioned by shard)
    and vocab/ (piece, tok_id) under one source-tagged cache root.
    Idempotent per testdata identity (each write gated on its own
    _SUCCESS). Returns (shards_dir, vocab_dir)."""
    root = source_tagged_dir("token_shards", sf_dir, "documents")
    shards_dir = os.path.join(root, "shards")
    vocab_dir = os.path.join(root, "vocab")
    if not (
        os.path.exists(os.path.join(shards_dir, "_SUCCESS"))
        and os.path.exists(os.path.join(vocab_dir, "_SUCCESS"))
    ):
        kept = clean_kept_slice(spark, sf_dir).localCheckpoint()
        wpieces = bpe_piece_table(spark, sf_dir).localCheckpoint()
        vocab = token_vocab(wpieces).localCheckpoint()
        vocab.write.mode("overwrite").parquet(vocab_dir)
        (
            pack_sequences(kept, wpieces, vocab)
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(shards_dir)
        )
    return shards_dir, vocab_dir


@query("q_token_shards", oracle=_shards_oracle())
def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C177: packed training shards, certified FROM THE FILES — write
    the product (if absent for this testdata identity), read the
    shards back, and re-derive n_tokens and the per-sequence token
    fingerprint from the on-disk arrays. One driver hash certifies the
    clean's kept set, the BPE segmentation, the token-id assignment,
    the global packing order, every sequence's exact token content as
    written, and the doc-span/source-mix provenance."""
    shards_dir, _vocab_dir = write_token_shards(spark, sf_dir)
    return (
        spark.read.option("basePath", shards_dir)
        .parquet(shards_dir)
        .select(
            "seq_id",
            F.size("tok_ids").cast("long").alias("n_tokens"),
            "n_docs",
            "first_doc",
            "last_doc",
            "sources",
            F.md5(
                F.concat_ws(
                    ",", F.expr("transform(tok_ids, t -> CAST(t AS STRING))")
                ).cast("binary")
            ).alias("fp"),
        )
    )


@query("q_stream_token_shards", oracle=_shards_oracle())
def q_stream_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C179: the -State twin of C177 — the corpus arrives over the
    duplicate-injecting DOCUMENT WIRE (the C152 mechanics: stateful
    doc_id dedup carries digests across micro-batch boundaries), the
    drained set takes the place of the parquet scan, and the IDENTICAL
    clean → tokenize → pack pipeline runs downstream, checked against
    the UNCHANGED C177 oracle. One hash certifies that shard content
    built from streamed, duplicate-polluted ingest equals the batch
    product bit for bit — document text rides the WIRE (a corrupted or
    double-delivered payload changes clip/gate/dedup outcomes and
    hash-fails loudly); only `source` (absent from the wire schema) is
    joined back from the table by doc_id.

    Scale shape: the streaming stages are the C152 dedup state + one
    drain; everything downstream is the certified C177 plan."""
    import os

    from kafka_clickhouse_implementation_spark.streaming.corpus_stream import (
        _DOC_WIRE_SCHEMA,
        document_wire,
    )
    from kafka_clickhouse_implementation_spark.streaming.funnel import _drain

    wire, base = document_wire(spark, sf_dir)
    deduped = (
        spark.readStream.schema(_DOC_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .json(wire)
        .filter(F.col("doc_id") % SHARD_SLICE_MOD == 0)
        .dropDuplicates(["doc_id"])
        .select("doc_id", "text")
    )
    _drain(
        spark, deduped, "stream_shard_docs",
        os.path.join(base, "ckpt_shard_docs"), mode="append",
    )
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    docs = spark.table("stream_shard_docs").join(src, "doc_id").localCheckpoint()
    kept = clean_kept(docs).localCheckpoint()
    wpieces = bpe_piece_table(spark, sf_dir).localCheckpoint()
    vocab = token_vocab(wpieces).localCheckpoint()
    return (
        pack_sequences(kept, wpieces, vocab)
        .select(
            "seq_id",
            "n_tokens",
            "n_docs",
            "first_doc",
            "last_doc",
            "sources",
            F.md5(
                F.concat_ws(
                    ",", F.expr("transform(tok_ids, t -> CAST(t AS STRING))")
                ).cast("binary")
            ).alias("fp"),
        )
    )


# Per-source token targets for the SHARD mixture (C180) — reuses the
# C47 permille convention over TOKENS (what a training job actually
# budgets) instead of document counts.
_SHARD_TARGET_PERMILLE = {
    "src0": 300, "src1": 200, "src2": 100,
    "src3": 50, "src4": 50, "src5": 50,
}

_MIXTURE_FINAL = f""", scounts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT pos // {SEQ_LEN}) AS BIGINT) AS n_seqs
  FROM stream GROUP BY source
), stotal AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM scounts
), targets(source, permille) AS (
  VALUES {", ".join(f"('{s}', {p})" for s, p in sorted(_SHARD_TARGET_PERMILLE.items()))}
)
SELECT c.source, c.n_tokens, c.n_seqs,
       CAST(COALESCE(tg.permille, 0) AS BIGINT) AS target_permille,
       CAST(COALESCE(tg.permille, 0) * t.total AS DOUBLE)
         / CAST(1000 * c.n_tokens AS DOUBLE) AS weight
FROM scounts c
LEFT JOIN targets tg ON tg.source = c.source
CROSS JOIN stotal t
"""


@query("q_shard_mixture", oracle=_shards_oracle(final_sql=_MIXTURE_FINAL))
def q_shard_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C180: TOKEN-level mixture accounting over the packed shards —
    the number a training job budgets against: per source, exact token
    count in the shard stream (EOS attributed to its document), the
    distinct sequences it touches, and the C47 resampling weight
    computed over TOKENS (weight > 1 → upsample) as one IEEE division
    of exact int64 products. Shares the C177 positioned stream and its
    oracle CTE chain verbatim — only the final rollup differs, so the
    two views of the product cannot drift.

    Scale shape: the C177 stream plus one source-keyed rollup with
    map-side partials and a constant broadcast target table."""
    kept = clean_kept_slice(spark, sf_dir).localCheckpoint()
    wpieces = bpe_piece_table(spark, sf_dir).localCheckpoint()
    vocab = token_vocab(wpieces).localCheckpoint()
    stream = positioned_stream(kept, wpieces, vocab)
    counts = stream.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct(F.expr(f"pos div {SEQ_LEN}")).cast("long").alias("n_seqs"),
    )
    total = counts.agg(F.sum("n_tokens").cast("long").alias("total"))
    targets = spark.createDataFrame(
        sorted(_SHARD_TARGET_PERMILLE.items()), "source string, permille long"
    )
    return (
        counts.join(F.broadcast(targets), "source", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            "n_seqs",
            F.coalesce("permille", F.lit(0)).cast("long").alias("target_permille"),
            (
                (F.coalesce("permille", F.lit(0)) * F.col("total")).cast("double")
                / (F.lit(1000) * F.col("n_tokens")).cast("double")
            ).alias("weight"),
        )
    )
