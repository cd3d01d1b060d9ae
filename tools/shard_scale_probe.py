#!/usr/bin/env python
"""Shard-chain scale probe — the r13 verdict's #3: the heaviest new
composition (clean -> batched-BPE train -> tokenize -> resample ->
re-pack -> write, the C177/C181/C184 chain) gets the same committed
1x/10x/30x trend line the clip path earned (docs/CORPUS_SCALE.json),
run on the sf1-equivalent corpus and alpha-suffixed replications of it.

Replica text suffixes use base-26 LETTER tokens (' cpa', ' cpb', ...)
— unlike corpus_scale_probe's digit suffixes — because the replicated
words feed the BPE trainer, whose fold expressions enforce the [a-z_]
symbol alphabet (a digit-bearing merge winner would raise by design).

Stages timed (Spark side, each forced by an action):
  clean   — clean_kept over the doc_id % 10 slice (clip + gate + exact
            dedup + LSH + CC; the C149 plan)
  train   — bpe_piece_table: the BATCHED C182 trainer at the production
            budget (SHARD_BPE_ROUNDS x SHARD_BATCH_N) over the FULL
            corpus vocabulary
  vocab   — token_vocab ranged-prefix ranking of the distinct pieces
  weights — resample_weights (unpositioned token counts -> w_q)
  repack  — resampled instances re-packed through positioned_stream,
            forced by the mixture rollup
  write   — pack_sequences of the instance stream written as
            partitioned parquet shards

Corpus-sized stages are clean and train (the kept set after the
quality gate is ~1% of the corpus at every scale, so weights/repack/
write ride model-sized frames — recorded anyway: a superlinear step
there would still be a real cliff).

Usage: python tools/shard_scale_probe.py [sf1_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.io import load  # noqa: E402
from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402

SCALES = (10, 30)


def build_docs_alpha(spark, src: str, out: str, n_copies: int) -> None:
    """N-replicated documents: per-copy doc_id offset + a per-copy
    LETTER suffix token (keeps fingerprints distinct, words inside the
    BPE [a-z_] alphabet)."""
    docs = load(spark, src, "documents")
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(n_copies).select(F.col("id").cast("long").alias("k"))
    big = (
        docs.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * F.lit(span))
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" cp"),
                # base-26 letter encoding of k: 0->a, 1->b, ..., 26->ba
                F.expr(
                    "concat(CASE WHEN k >= 26 THEN chr(97 + CAST(k / 26 AS INT))"
                    " ELSE '' END, chr(97 + CAST(k % 26 AS INT)))"
                ),
            ),
        )
        .drop("k")
    )
    big.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))


def time_chain(spark, sf_dir: str) -> dict:
    from kafka_clickhouse_implementation_spark.pipelines.shards import (
        _RESAMPLE_TARGET_PERMILLE,
        SHARD_SLICE_MOD,
        bpe_piece_table,
        clean_kept,
        pack_sequences,
        resample_weights,
        resampled_instances,
        token_vocab,
        wpieces_fits_broadcast,
    )

    out: dict = {}
    docs = load(spark, sf_dir, "documents")
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    kept = clean_kept(
        docs.filter(F.col("doc_id") % SHARD_SLICE_MOD == 0)
    ).localCheckpoint()
    out["n_kept"] = kept.count()
    out["clean_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    wpieces = bpe_piece_table(spark, sf_dir).localCheckpoint()
    out["n_wpiece_rows"] = wpieces.count()
    out["train_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    vocab = token_vocab(wpieces).localCheckpoint()
    out["n_vocab"] = vocab.count()
    out["vocab_sec"] = round(time.monotonic() - t0, 1)

    wp_bc = wpieces_fits_broadcast(wpieces)
    t0 = time.monotonic()
    wq = resample_weights(
        kept, wpieces, vocab, _RESAMPLE_TARGET_PERMILLE, wp_bc
    ).localCheckpoint()
    wq.count()
    out["weights_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    inst = resampled_instances(kept, wq).localCheckpoint()
    out["n_instances"] = inst.count()
    seqs = pack_sequences(inst, wpieces, vocab, doc_expr="doc_id div 1000",
                          wp_broadcast=wp_bc)
    out["n_seqs"] = seqs.count()
    out["repack_sec"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    wdir = os.path.join("/tmp/spark_graft_scale", "shard_probe_write")
    shutil.rmtree(wdir, ignore_errors=True)
    seqs.write.mode("overwrite").partitionBy("shard").parquet(wdir)
    out["write_sec"] = round(time.monotonic() - t0, 1)
    shutil.rmtree(wdir, ignore_errors=True)

    # --- r15 extensions (the r14 verdict's #8): the two newest pack
    # paths. Both ride the kept/instance tables, which the quality gate
    # bounds to ~1% of the corpus at every scale here — recorded for
    # the same reason weights/repack are: a superlinear step would
    # still be a real cliff.
    from kafka_clickhouse_implementation_spark.pipelines.shards import (
        _assemble_sequences,
        _pack_with_fp,
        curriculum_positioned_stream,
    )

    # C189: the curriculum interleave (one instance-table window) +
    # the schedule-ordered ranged-prefix pack
    t0 = time.monotonic()
    cstream = curriculum_positioned_stream(inst, wpieces, vocab, wp_bc)
    out["n_curr_seqs"] = _assemble_sequences(
        cstream, "doc_id div 1000"
    ).count()
    out["curriculum_sec"] = round(time.monotonic() - t0, 1)

    # C186: one incremental upsert epoch — fingerprinted pack diffed
    # against the previously written versioned table (latest-per-key
    # rank + fp equi-join + tombstone anti-join), the per-trigger
    # emission machinery of the stream-written product
    from kafka_clickhouse_implementation_spark.plans.upsert import (
        append_versions,
        read_latest,
    )

    updir = os.path.join("/tmp/spark_graft_scale", "shard_probe_upsert")
    shutil.rmtree(updir, ignore_errors=True)
    cur = _pack_with_fp(inst, wpieces, vocab, wp_bc).localCheckpoint()
    append_versions(
        cur.withColumn("deleted", F.lit(False)).withColumn(
            "version", F.lit(0).cast("long")
        ),
        updir,
    )
    t0 = time.monotonic()
    prev_live = (
        read_latest(spark, updir, ("seq_id",), "version")
        .filter(~F.col("deleted"))
        .select("seq_id", F.col("fp").alias("prev_fp"))
    )
    changed = (
        cur.join(prev_live, "seq_id", "left")
        .filter(F.col("prev_fp").isNull() | (F.col("prev_fp") != F.col("fp")))
    )
    vanished = prev_live.join(cur.select("seq_id"), "seq_id", "left_anti")
    out["n_upsert_changed"] = changed.count()  # 0 by construction
    out["n_upsert_vanished"] = vanished.count()
    out["upsert_diff_sec"] = round(time.monotonic() - t0, 1)
    shutil.rmtree(updir, ignore_errors=True)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "docs/SHARD_SCALE.json"
    spark = get_spark("shard_scale_probe")

    runs = {"sf1": time_chain(spark, src)}
    for mult in SCALES:
        d = f"/tmp/spark_graft_scale/sf{mult}_docs_alpha"
        build_docs_alpha(spark, src, d, mult)
        runs[f"sf{mult}"] = time_chain(spark, d)

    artifact: dict = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "source": src,
        **runs,
    }
    for mult in SCALES:
        artifact[f"sf{mult}_over_sf1"] = {
            k.replace("_sec", "_ratio"): round(
                runs[f"sf{mult}"][k] / max(runs["sf1"][k], 0.1), 2
            )
            for k in runs[f"sf{mult}"]
            if k.endswith("_sec")
        }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
