"""Training-shards product demo — the round-12..14 deliverable chain a
pretraining-data team would actually run, composed from the same
library functions the oracle-checked queries certify:

1. persisted pipeline inputs (shard_inputs): ExactSubstr-clipped +
   cleaned kept corpus, batched-BPE word-piece table, token vocabulary
   — derived once per corpus identity, read by everything below
2. the tokenizer ARTIFACT (write_tokenizer): the merge trajectory at
   the production budget — what a tokenizer release ships
3. packed training shards (write_token_shards): fixed-length token
   sequences with provenance, partitioned parquet
4. mixture accounting + RESAMPLE to a target (q_shard_mixture /
   resample_weights): per-source token shares, the applied weights
5. the MIXED product (write_resampled_shards) and its curriculum-
   ordered twin (q_token_shards_curriculum): every file prefix
   carries the target mixture

Run:  python examples/training_shards_demo.py [sf_dir]
Default sf_dir: /root/testdata/sf0.001.

Every stage prints a one-line summary; the driver hash-checks the same
compositions via q_token_shards / q_tokenizer_export /
q_shard_mixture_resampled / q_token_shards_resampled /
q_token_shards_curriculum / q_stream_shards_upsert.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kafka_clickhouse_implementation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_shards_demo")

    from kafka_clickhouse_implementation_spark.pipelines.shards import (
        _RESAMPLE_TARGET_PERMILLE,
        q_shard_mixture,
        q_shard_mixture_resampled,
        q_token_shards_curriculum,
        shard_inputs,
        write_resampled_shards,
        write_token_shards,
        write_tokenizer,
    )

    kept, wpieces, vocab = shard_inputs(spark, sf_dir)
    print(
        f"[1] inputs: kept={kept.count()} docs, "
        f"wpieces={wpieces.count()} rows, vocab={vocab.count()} pieces"
    )

    merges_dir = write_tokenizer(spark, sf_dir)
    merges = spark.read.parquet(merges_dir)
    print(
        f"[2] tokenizer: {merges.count()} merges in "
        f"{merges.agg(F.max('round')).first()[0]} rounds -> {merges_dir}"
    )

    shards_dir, vocab_dir = write_token_shards(spark, sf_dir)
    shards = spark.read.parquet(shards_dir)
    print(
        f"[3] shards: {shards.count()} sequences, "
        f"{shards.agg(F.sum('n_tokens')).first()[0]} tokens -> {shards_dir}"
    )

    print("[4] mixture accounting (tokens per source, weight to target):")
    for r in q_shard_mixture(spark, sf_dir).orderBy("source").collect():
        print(
            f"      {r.source}: {r.n_tokens} tokens, target "
            f"{r.target_permille}permille, weight {r.weight:.3f}"
        )

    mixed_dir = write_resampled_shards(spark, sf_dir)
    print(f"[5] mixed product -> {mixed_dir}; achieved vs target:")
    for r in q_shard_mixture_resampled(spark, sf_dir).orderBy("source").collect():
        print(
            f"      {r.source}: achieved "
            f"{r.achieved_permille_milli / 1000:.1f}permille "
            f"(target {r.target_permille}, w_q={r.weight_q4096}/4096)"
        )

    cur = q_token_shards_curriculum(spark, sf_dir)
    first = cur.orderBy("seq_id").limit(3).collect()
    print(
        "[6] curriculum pack: first sequences mix sources "
        + str([r.sources for r in first])
        + f" (targets: {sorted(_RESAMPLE_TARGET_PERMILLE)})"
    )


if __name__ == "__main__":
    main()
