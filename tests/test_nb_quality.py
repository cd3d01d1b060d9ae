"""C166 — supervised Naive-Bayes quality classifier: full pure-Python
replay (exact ints + pln_py, the third IEEE engine) on the real corpus,
plus a synthetic separability property test where the classes differ by
construction."""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq

from kafka_clickhouse_implementation_spark.functions.portable_math import pln_py
from kafka_clickhouse_implementation_spark.operators.nb_quality import (
    nb_scores,
    q_nb_quality,
)
from kafka_clickhouse_implementation_spark.operators.dsir import N_BUCKETS
from tests.test_dsir import _bucket_py


def _feats(text: str) -> collections.Counter:
    t = text.split(" ")
    c: collections.Counter = collections.Counter()
    for w in t:
        if w:
            c[_bucket_py(w)] += 1
    for i in range(len(t) - 1):
        if t[i] and t[i + 1]:
            c[_bucket_py(t[i] + "_" + t[i + 1])] += 1
    return c


def _replay(rows):
    """rows: (doc_id, source, text). Returns {doc_id: (score_nano,
    n_feats)} for odd held-out docs with >= 1 feature."""
    tgt_src = min(src for _, src, _t in rows)
    dfc = {d: _feats(text) for d, _src, text in rows}
    cpos: collections.Counter = collections.Counter()
    cneg: collections.Counter = collections.Counter()
    npos = nneg = 0
    for d, src, _t in rows:
        if d % 2 != 0 or not dfc[d]:
            continue
        tgt = src == tgt_src
        for b, n in dfc[d].items():
            (cpos if tgt else cneg)[b] += n
        if tgt:
            npos += 1
        else:
            nneg += 1
    tpos, tneg, ntr = sum(cpos.values()), sum(cneg.values()), npos + nneg
    prior = math.floor(
        (
            pln_py(float(npos + 1) / float(ntr + 2))
            - pln_py(float(nneg + 1) / float(ntr + 2))
        )
        * 1.0e9
    )
    buckets = set(cpos) | set(cneg)
    llr = {
        b: math.floor(
            (
                pln_py(float(cpos.get(b, 0) + 1) / float(tpos + N_BUCKETS))
                - pln_py(float(cneg.get(b, 0) + 1) / float(tneg + N_BUCKETS))
            )
            * 1.0e9
        )
        for b in buckets
    }
    out = {}
    for d, _src, _t in rows:
        if d % 2 != 1 or not dfc[d]:
            continue
        # held features in buckets absent from the train model have no
        # llr row (inner join on both engines) and contribute nothing
        hit = [(b, n) for b, n in dfc[d].items() if b in llr]
        if not hit:
            continue
        out[d] = (
            prior + sum(n * llr[b] for b, n in hit),
            sum(n for _b, n in hit),
        )
    return out


def test_nb_matches_python_replay(spark, sf_dir):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    rows = list(
        zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("source").to_pylist(),
            tbl.column("text").to_pylist(),
        )
    )
    want = _replay(rows)
    from kafka_clickhouse_implementation_spark.io import load

    got = {
        r.doc_id: (r.score_nano, r.n_feats)
        for r in nb_scores(load(spark, sf_dir, "documents")).collect()
    }
    assert got == want


def test_nb_separates_synthetic_domains(spark):
    """Classes that differ by construction must be separated on the
    held-out split: target docs score positive, off-target negative."""
    rows = []
    for i in range(40):
        # 'aaa' vocabulary for the target class, 'zzz' for the rest
        if i % 4 == 0:
            rows.append((i, "a_src", "alpha beta gamma " * 5))
        else:
            rows.append((i, "z_src", "omega psi chi " * 5))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    scored = {r.doc_id: r.score_nano for r in nb_scores(docs).collect()}
    for d, s in scored.items():
        if d % 4 == 0:
            assert s > 0, (d, s)
        else:
            assert s < 0, (d, s)


def test_nb_rollup_counts_partition_held_docs(spark, sf_dir):
    """Per-source n_docs must sum to the held-out scored-doc count and
    n_pred_target <= n_docs everywhere."""
    out = q_nb_quality(spark, sf_dir).collect()
    assert sum(r.n_docs for r in out) > 0
    for r in out:
        assert 0 <= r.n_pred_target <= r.n_docs
        assert r.min_score <= r.max_score
