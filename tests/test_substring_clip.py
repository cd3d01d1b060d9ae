"""ExactSubstr clipping (C143): independent pure-Python
interval-arithmetic replay of the gram → dup → first-occurrence-wins →
merged-span → reassembly pipeline, compared doc-by-doc against the
Spark transformation on crafted docs AND on the real sf0.001 corpus."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from tests.conftest import SF_DIR

from kafka_clickhouse_implementation_spark.operators.corpus_ext import (
    GRAM_LEN,
    GRAM_STRIDE,
    substring_clip,
)


def _replay(docs: list[tuple[int, str, str]]) -> dict[int, tuple[str, int, int]]:
    """Pure-Python replay: doc_id -> (kept_text, clipped_chars,
    n_clip_spans). 1-based positions throughout, like the SQL."""
    by_h: dict[str, list[tuple[int, int]]] = {}
    for doc_id, _src, text in docs:
        if len(text) >= GRAM_LEN:
            for i in range((len(text) - GRAM_LEN) // GRAM_STRIDE + 1):
                pos = i * GRAM_STRIDE + 1
                gram = text[pos - 1 : pos - 1 + GRAM_LEN]
                h = hashlib.md5(gram.encode()).hexdigest()
                by_h.setdefault(h, []).append((doc_id, pos))
    clip: dict[int, list[tuple[int, int]]] = {}
    for occs in by_h.values():
        if len({d for d, _ in occs}) > 1:
            first = min(occs)  # (doc_id, pos) lexicographic = fd then fp
            for d, p in occs:
                if (d, p) != first:
                    clip.setdefault(d, []).append((p, p + GRAM_LEN))
    out: dict[int, tuple[str, int, int]] = {}
    for doc_id, _src, text in docs:
        merged: list[list[int]] = []
        for s, e in sorted(clip.get(doc_id, [])):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        parts, cur = [], 1
        for s, e in merged:
            parts.append(text[cur - 1 : s - 1])
            cur = e
        parts.append(text[cur - 1 :])
        out[doc_id] = (
            "".join(parts),
            sum(e - s for s, e in merged),
            len(merged),
        )
    return out


def _check_against_replay(spark, docs):
    sdf = spark.createDataFrame(
        [(d, s, t) for d, s, t in docs], "doc_id long, source string, text string"
    )
    got = {
        r.doc_id: (r.kept_text, r.clipped_chars, r.n_clip_spans)
        for r in substring_clip(sdf).collect()
    }
    want = _replay(docs)
    assert got == want
    # the transformation's own invariant: kept + clipped == total
    for d, _s, t in docs:
        assert len(got[d][0]) + got[d][1] == len(t)


def test_clip_crafted_docs(spark):
    shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"  # 40 chars shared
    docs = [
        (0, "s0", "unique prefix zero " + shared + " unique tail zero end!"),
        (1, "s0", "other lead-in text " + shared + " different tail here!!"),
        (2, "s1", shared + " starts this one, " + shared),  # two hits, one doc
        (3, "s1", "no duplicated content in this document at all, honest"),
        (4, "s1", "short"),  # below GRAM_LEN: untouched
    ]
    _check_against_replay(spark, docs)


def test_clip_adjacent_and_overlapping_spans_merge(spark):
    # doc 1 repeats doc 0's text twice back-to-back: overlapping gram
    # ranges must merge into ONE span per contiguous duplicated region
    base = "the quick brown fox jumps over the lazy dog today ok " * 2
    docs = [
        (0, "s0", base + "unique suffix one two three four five six"),
        (1, "s0", base + base + "and a different ending over here entirely"),
    ]
    _check_against_replay(spark, docs)
    # sanity on the replay itself: doc 1 has clipped content, doc 0 none
    want = _replay(docs)
    assert want[0][1] == 0 and want[1][1] > 0


def test_clip_replays_real_corpus(spark):
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    docs = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("source").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    )
    _check_against_replay(spark, docs)


def test_clipped_clean_deterministic_stages_match_replay(spark, sf_dir):
    """C148: the clip -> clean composition's deterministic funnel
    stages (raw, quality gate, exact dedup) must match a pure-Python
    replay over the replayed clipped texts — certifying that the
    transformation actually FEEDS the pipeline, not just a report."""
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    docs = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("source").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    )
    clipped = _replay(docs)
    n_raw = len(docs)
    kept_quality = []
    for d, _s, _t in docs:
        kt = clipped[d][0]
        toks = kt.split(" ")
        stop = sum(1 for t in toks if t in ("the", "a", "of", "and"))
        if len(toks) >= 10 and stop / len(toks) <= 0.5:
            kept_quality.append((d, kt))
    n_q = len(kept_quality)
    first_by_text: dict[str, int] = {}
    for d, kt in kept_quality:
        if kt not in first_by_text:
            first_by_text[kt] = d
    n_e = len(first_by_text)

    from kafka_clickhouse_implementation_spark.registry import all_queries

    row = all_queries()["q_corpus_clean_clipped"](spark, sf_dir).head()
    assert (row.n_raw, row.n_after_quality, row.n_after_exact_dedup) == (
        n_raw,
        n_q,
        n_e,
    )
    assert row.n_unconverged == 0
