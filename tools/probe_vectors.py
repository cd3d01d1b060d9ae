#!/usr/bin/env python
"""Large-vector SemDeDup probe — the committed, reproducible form of
the round-7 1M-vector measurement (verdict r7 item 6: the probe lived
in ROUNDLOG prose + /tmp; this script + docs/PROBE_1M.json make the
linear pair-count prediction reproducible).

What it does:
1. Builds an embeddings-only dataset of n_copies x sf1 vectors (default
   50x 20k = 1M) by deterministic replication: per-copy vec_id offset
   plus one perturbed dimension per copy — the same scheme
   tools/make_scale_data.py uses, so near-dup structure is preserved
   without exact clones exploding.
2. Runs q_semantic_dedup (C111) against it and records wall time, the
   derived k(n) = max(8, n // SEM_BLOCK), total within-cluster pairs,
   and the linear prediction n·(SEM_BLOCK-1)/2 the k(n) rule implies
   when clusters stay balanced.
3. Writes the JSON artifact (default docs/PROBE_1M.json).

Round-7 observation this reproduces: 1M vectors -> k=4000, exactly
124,500,000 pairs = n·249/2, ~204 s on local[32] — within-cluster pair
volume linear in n, the property that makes SemDeDup viable at 100 TB.

Usage: python tools/probe_vectors.py [n_copies] [src_sf1_dir] [out_json]
       python tools/probe_vectors.py 500 <src> docs/PROBE_10M.json --twolevel

--twolevel (round 9, the r8-verdict decade extension): cluster with the
C131 coarse->fine quantizer instead of flat Lloyd — the documented
scale path beyond ~10M vectors (assignment n*(k1+k2) ~= n*2*sqrt(k)
instead of n*k) — and measure the SAME balanced-cluster pair-count law
over the (cell, fid) blocks. At 10M vectors flat assignment is
n*k = 4e11 distance rows; two-level is 4e9 — the probe records the law
AND the wall-clock of the algorithm you would actually run there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.operators.clustering import (  # noqa: E402
    SEM_BLOCK,
    q_semantic_dedup,
    semdedup_k,
)
from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402


def build_vectors(spark, src: str, out: str, n_copies: int) -> int:
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    span = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    copies = spark.range(n_copies).select(F.col("id").cast("long").alias("k"))
    dim_idx = (F.col("k") % F.size("embedding")).cast("int")
    big = (
        emb.crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("k") * F.lit(span))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                # 7e-4 per copy: large enough to break exact equality,
                # small enough that every copy stays in its original's
                # neighborhood — Lloyd then groups each original with
                # its copies, which is what makes the balanced-cluster
                # pair-count prediction exact (the r7 observation)
                lambda v, i: F.when(
                    (F.col("k") > 0) & (i == dim_idx),
                    (v + F.col("k").cast("float") * F.lit(7e-4)).cast("float"),
                ).otherwise(v),
            ),
        )
        .drop("k")
    )
    big.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return span * n_copies


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--twolevel"]
    twolevel = "--twolevel" in sys.argv[1:]
    n_copies = int(args[0]) if len(args) > 0 else 50
    src = args[1] if len(args) > 1 else "/tmp/spark_graft_scale/sf1"
    out_json = args[2] if len(args) > 2 else "docs/PROBE_1M.json"
    out_dir = f"/tmp/spark_graft_scale/probe_{n_copies}x"

    spark = get_spark("probe_vectors")
    n = build_vectors(spark, src, out_dir, n_copies)
    k = semdedup_k(n)
    t0 = time.monotonic()
    if twolevel:
        from kafka_clickhouse_implementation_spark.operators.clustering import (
            _twolevel_clusters,
            twolevel_k,
        )

        asgf, _cents = _twolevel_clusters(spark, out_dir)
        stats = (
            asgf.groupBy("cell", "fid")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("total_pairs"),
                F.count(F.lit(1)).alias("n_clusters"),
                F.max("m").alias("max_cluster"),
            )
            .first()
        )
        k1, k2 = twolevel_k(n)
        extra = {"algorithm": "twolevel", "k1": k1, "k2": k2,
                 "max_cluster": int(stats.max_cluster)}
    else:
        stats = q_semantic_dedup(spark, out_dir).agg(
            F.sum("n_pairs").alias("total_pairs"),
            F.count(F.lit(1)).alias("n_clusters"),
        ).first()
        extra = {"algorithm": "flat"}
    secs = round(time.monotonic() - t0, 1)
    artifact = {
        "n_vectors": n,
        "k": k,
        "sem_block": SEM_BLOCK,
        "total_pairs": int(stats.total_pairs),
        "predicted_pairs_if_balanced": n * (SEM_BLOCK - 1) // 2,
        "n_clusters": int(stats.n_clusters),
        "seconds": secs,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "source": f"{n_copies}x {src} embeddings, per-copy offset + one perturbed dim",
        **extra,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
