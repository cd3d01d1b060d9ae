"""C177 packed training shards: the detokenization contract — the
shards plus the shipped vocab must reconstruct the kept corpus
verbatim (the round-12 verdict's acceptance test), plus packing-shape
invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.pipelines.shards import (
    EOS,
    N_SHARDS,
    SEQ_LEN,
    clean_kept_slice,
    write_token_shards,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def product(spark):
    shards_dir, vocab_dir = write_token_shards(spark, SF)
    shards = spark.read.parquet(shards_dir)
    vocab = {r.tok_id: r.piece for r in spark.read.parquet(vocab_dir).collect()}
    return shards, vocab


def test_detokenized_shards_reconstruct_kept_text(spark, product):
    """Round-trip: shards + vocab -> token stream -> piece stream ->
    documents (EOS cuts) -> words ('_' end-of-word marker cuts) must
    equal the kept corpus's word sequences doc for doc, in doc_id
    order. (The corpus alphabet is [a-z ]; a word containing the
    literal marker would alias — outside the BPE module's declared
    alphabet contract.)"""
    shards, vocab = product
    rows = shards.select("seq_id", "tok_ids").orderBy("seq_id").collect()
    stream = [t for r in rows for t in r.tok_ids]

    docs_out: list[list[str]] = []
    cur: list[str] = []
    for t in stream:
        if vocab[t] == EOS:
            joined = "".join(cur)
            assert joined.endswith("_"), joined[-20:]
            docs_out.append([w for w in joined.split("_") if w != ""])
            cur = []
        else:
            cur.append(vocab[t])
    assert cur == [], "stream must end on a document boundary (EOS)"

    kept = (
        clean_kept_slice(spark, SF)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    assert len(docs_out) == len(kept)
    for rec, k in zip(docs_out, kept):
        want = [w for w in k.text.split(" ") if w != ""]
        assert rec == want, f"doc {k.doc_id} detokenized differently"


def test_packing_shape(spark, product):
    """Sequences are contiguous ids, exactly SEQ_LEN tokens except the
    single tail, sharded by seq_id % N_SHARDS, and provenance counts
    match the arrays on disk."""
    shards, _ = product
    rows = shards.select(
        "seq_id", "shard", "n_tokens", F.size("tok_ids").alias("sz")
    ).collect()
    ids = sorted(r.seq_id for r in rows)
    assert ids == list(range(len(ids)))
    last = max(ids)
    for r in rows:
        assert r.n_tokens == r.sz
        assert r.shard == r.seq_id % N_SHARDS
        if r.seq_id != last:
            assert r.n_tokens == SEQ_LEN
        else:
            assert 1 <= r.n_tokens <= SEQ_LEN


def test_vocab_ids_dense_with_reserved_eos(spark, product):
    """tok_ids are the 1-based rank of the sorted piece vocabulary;
    0 is reserved for EOS; ids are dense and pieces unique."""
    _, vocab = product
    assert vocab[0] == EOS
    ids = sorted(vocab)
    assert ids == list(range(len(ids)))
    pieces = [vocab[i] for i in ids[1:]]
    assert pieces == sorted(pieces)
    assert len(set(pieces)) == len(pieces)
