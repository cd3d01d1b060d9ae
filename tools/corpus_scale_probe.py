#!/usr/bin/env python
"""Corpus-tier scale probe — the committed, reproducible form of the
round-10 verdict's optional-depth item 8: run the composed corpus
clean's STAGES on the sf1-equivalent corpus AND a 10x-duplicated
version of it (the C148 adversarial corpus: every document replicated
10x with a per-copy suffix token — massive cross-copy gram duplication,
the worst case for ExactSubstr and LSH), timing each stage separately,
so the linearity claims in docs/SCALE.md for clip/gate/dedup/LSH/CC
carry measured evidence the way PROBE_10M.json does for vectors.

Stages timed (each forced by a count, Spark side only — this measures
the ENGINE, not the DuckDB replay):
  clip   — ExactSubstr clipping (strided grams -> md5 dup detection ->
           first-occurrence -> per-doc interval merge -> reassembly)
  gate   — heuristic quality gate over the clipped text
  exact  — keep-lowest-id exact dedup
  pairs  — portable MinHash-LSH candidate generation + exact-Jaccard
           verification (banding bounds the pair volume)
  cc     — large-star/small-star connected components over the pairs
  kn     — the C142 Kneser-Ney gate scored over the raw corpus (the
           scored clean's heavy stage; independent of the clip chain)

Usage: python tools/corpus_scale_probe.py [sf1_dir] [out_json]
Builds the 10x corpus at /tmp/spark_graft_scale/sf10_docs (documents
table only — the corpus stages read nothing else).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.io import load  # noqa: E402
from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402

COPIES = 10


def build_docs10(spark, src: str, out: str, n_copies: int = COPIES) -> None:
    """N-replicated documents table: per-copy doc_id offset + a
    per-copy suffix token (the make_scale_data.py text mutation — keeps
    fingerprints distinct while leaving every long gram duplicated
    across copies, which is the adversarial property)."""
    docs = load(spark, src, "documents")
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(n_copies).select(F.col("id").cast("long").alias("k"))
    big = (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * F.lit(span))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" cp"), F.col("k").cast("string")),
        )
        .drop("k")
    )
    big.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))


def time_stages(spark, sf_dir: str, heavy_only: bool = False) -> dict:
    """``heavy_only`` times just the two corpus-sized stages (clip,
    kn) — the third scale point (round-12 verdict item 8) exists to
    extend THEIR trend line; the middle stages are sub-second and
    already measured flat at 10x."""
    from kafka_clickhouse_implementation_spark.operators.components import (
        connected_components,
    )
    from kafka_clickhouse_implementation_spark.operators.corpus_ext import (
        substring_clip,
    )
    from kafka_clickhouse_implementation_spark.operators.minhash_portable import (
        verified_pairs,
    )
    from kafka_clickhouse_implementation_spark.pipelines.corpus import (
        exact_dedup,
        kn_quality_gate,
        quality_filter,
    )

    out: dict = {}
    docs = load(spark, sf_dir, "documents")
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    clipped = (
        substring_clip(docs)
        .select("doc_id", F.col("kept_text").alias("text"))
        .localCheckpoint()
    )
    out["clip_sec"] = round(time.monotonic() - t0, 1)
    out["n_clipped"] = clipped.count()

    if heavy_only:
        t0 = time.monotonic()
        out["n_kn_kept"] = kn_quality_gate(docs).count()
        out["kn_sec"] = round(time.monotonic() - t0, 1)
        return out

    t0 = time.monotonic()
    gated = quality_filter(clipped).localCheckpoint()
    out["n_gated"] = gated.count()
    out["gate_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    exact = exact_dedup(gated).localCheckpoint()
    out["n_exact"] = exact.count()
    out["exact_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    pairs = verified_pairs(exact.select("doc_id", "text")).localCheckpoint()
    out["n_pairs"] = pairs.count()
    out["pairs_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    out["n_cc_nodes"] = comp.count()
    out["cc_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    out["n_kn_kept"] = kn_quality_gate(docs).count()
    out["kn_sec"] = round(time.monotonic() - t0, 1)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "docs/CORPUS_SCALE.json"
    ten_dir = "/tmp/spark_graft_scale/sf10_docs"
    # optional THIRD scale point (round-12 verdict item 8): replicate
    # this many copies and time the two corpus-sized stages only, so
    # the clip/kn ratios become a trend line rather than one interval
    third = int(os.environ.get("SPARK_GRAFT_THIRD_POINT", "0"))

    spark = get_spark("corpus_scale_probe")
    build_docs10(spark, src, ten_dir)

    runs = {"sf1": time_stages(spark, src), "sf10": time_stages(spark, ten_dir)}
    ratios = {
        k.replace("_sec", "_ratio"): round(
            runs["sf10"][k] / max(runs["sf1"][k], 0.1), 2
        )
        for k in runs["sf1"]
        if k.endswith("_sec")
    }
    artifact = {
        "copies": COPIES,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "source": src,
        **runs,
        "sf10_over_sf1": ratios,
    }
    if third:
        third_dir = f"/tmp/spark_graft_scale/sf{third}_docs"
        build_docs10(spark, src, third_dir, n_copies=third)
        runs[f"sf{third}"] = time_stages(spark, third_dir, heavy_only=True)
        artifact[f"sf{third}"] = runs[f"sf{third}"]
        artifact[f"sf{third}_over_sf1"] = {
            k.replace("_sec", "_ratio"): round(
                runs[f"sf{third}"][k] / max(runs["sf1"][k], 0.1), 2
            )
            for k in runs[f"sf{third}"]
            if k.endswith("_sec")
        }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
