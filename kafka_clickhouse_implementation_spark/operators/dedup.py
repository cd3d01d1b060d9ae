"""Tier C — deduplication for large-scale training-data pipelines:
exact, exact-by-fingerprint, token-set Jaccard, shingle (n-gram)
Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.

Scale posture: the oracle-checked variants are brute-force pair joins,
correct at test scale and quadratic by nature; the production paths at
100 TB are the LSH ones (MinHash banding / random-hyperplane SimHash)
whose candidate generation is a hash-bucket equi-join — linear shuffle,
no O(n²) anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


@query(
    "q_dedup_docs",
    oracle="""
    SELECT count(*) AS n_raw, count(DISTINCT text) AS n_distinct
    FROM documents
    """,
)
def q_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — exact dedup: dropDuplicates on content. At scale dedup by
    full text shuffles the text payload; q_fingerprint's md5-key dedup
    shuffles 16 bytes per row instead — same answer, ~30× less I/O."""
    docs = load(spark, sf_dir, "documents")
    n_raw = docs.agg(F.count(F.lit(1)).alias("n_raw"))
    n_distinct = docs.dropDuplicates(["text"]).agg(F.count(F.lit(1)).alias("n_distinct"))
    return n_raw.crossJoin(n_distinct)


def _token_sets(docs: DataFrame, max_doc_id: int) -> DataFrame:
    """Distinct (doc_id, token) pairs for docs below max_doc_id."""
    return (
        docs.filter(F.col("doc_id") < max_doc_id)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )


def _jaccard_pairs(sets: DataFrame) -> DataFrame:
    """Exact pairwise Jaccard over a (doc_id, tok) set relation:
    inverted-index self-join on token (so only docs *sharing* a token
    pair up — no cross join), then |A∩B| / (|A|+|B|-|A∩B|)."""
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i")), 6).alias("jac"),
        )
    )


@query(
    "q_jaccard_pairs",
    oracle="""
    WITH s AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 50
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.8
    """,
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (deterministic twin) — exact token-set Jaccard ≥ 0.8 among the
    first 50 docs via inverted-index self-join."""
    docs = load(spark, sf_dir, "documents")
    return _jaccard_pairs(_token_sets(docs, 50)).filter(F.col("jac") >= 0.8)


@query(
    "q_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 30
    ),
    ds AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    ORDER BY jac DESC, doc_a, doc_b LIMIT 10
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (3-word-shingle) Jaccard — the dedup granularity used by
    web-scale corpus cleaning. Shingling is a JVM-side higher-order
    ``transform`` over the token array; similarity via the same
    inverted-index join as q_jaccard_pairs. Top-10 pairs, fully
    tiebroken."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.filter(F.col("doc_id") < 30).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    shingles = toks.filter(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")
        ).alias("tok"),
    ).distinct()
    return (
        _jaccard_pairs(shingles)
        .orderBy(F.col("jac").desc(), "doc_a", "doc_b")
        .limit(10)
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 10
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash as the dedup key. At 100 TB
    this is the first pass — dedup/groupBy moves a 32-char key instead
    of the document body."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 10)
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
    )


@query("q_minhash_lsh")  # no-oracle: MinHash is sketch-randomized (seeded, but not SQL-reproducible)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — MinHash+LSH near-dup candidates: shingle → binary feature
    vector → minhash signatures → LSH band-bucket join
    (pyspark.ml.feature.MinHashLSH, seeded for determinism within
    Spark). This is the linear-shuffle scale path that replaces the
    O(n²) exact joins above: candidate pairs come from an equi-join on
    (band, bucket), then only candidates get exact verification."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # Shingle (3-gram), not unigram: the minhash of a unigram set over a
    # small vocabulary collides constantly, ballooning every LSH bucket
    # toward all-pairs; shingles keep buckets selective.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "transform(sequence(0, greatest(size(split(text, ' ')) - 3, 0)),"
            " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
        ).alias("tokens"),
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold=0.6, distCol="jaccard_dist")
    cand = pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
    return cand.agg(F.count(F.lit(1)).alias("n_candidate_pairs"))


@query("q_simhash")  # no-oracle: 64-bit simhash bit-twiddling is not reasonably SQL-expressible
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprints — 64-bit signature whose Hamming
    distance tracks token-multiset similarity. Deterministic (md5-based
    token hashes), computed entirely JVM-side: per-token 64-bit hash via
    xxhash64, bitwise vote via explode + groupBy over bit positions.
    Output: signature per doc for the first 20 docs."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # per-token 64-bit hash; one row per (doc, token, bit)
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).select(
        "doc_id",
        "bit",
        # vote +1 if bit set, -1 otherwise (shift amount is a column, so
        # use the SQL form — the Python wrapper only takes int literals)
        F.when(F.expr("(shiftright(h, bit) & 1)") == 1, 1).otherwise(-1).alias("vote"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
        ).alias("simhash")
    )
    return sig.orderBy("doc_id")


@query(
    "q_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, computed as a distributed
    block matrix product: the corpus matrix is broadcast once (like the
    small side of a broadcast join — bounded, n×64 floats), and each
    partition multiplies its block against it with vectorized numpy
    (BLAS) inside mapInPandas, emitting only pairs over threshold.
    No O(n²) shuffle — the pair set never materializes before the
    threshold filter.

    Correctness baseline for the LSH/IVF candidate generators in
    similarity.py; at corpus scale the broadcast side would itself be
    LSH-bucketed first, keeping each block product rectangular."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = spark.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat_n)

    def block_sims(batches):
        import pandas as pd

        all_ids = b_ids.value
        all_mat = b_mat.value
        for pdf in batches:
            q = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ all_mat.T  # (batch, n)
            sims = np.round(sims, 6)
            qids = pdf["vec_id"].to_numpy()
            # only emit (a < b) pairs over threshold
            bi, bj = np.nonzero(sims >= 0.35)
            keep = qids[bi] < all_ids[bj]
            yield pd.DataFrame(
                {
                    "vec_a": qids[bi][keep],
                    "vec_b": all_ids[bj][keep],
                    "cos_sim": sims[bi, bj][keep],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        block_sims, schema="vec_a long, vec_b long, cos_sim double"
    )
