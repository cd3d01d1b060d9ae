"""Tests for the composed corpus-cleaning pipeline on crafted docs with
known duplicates."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.pipelines.corpus import (
    clean_corpus,
    exact_dedup,
    near_dedup,
    quality_filter,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today " * 2
    near = base.replace("today", "tonight")
    rows = [
        (0, base.strip(), "en", "s", len(base)),
        (1, base.strip(), "en", "s", len(base)),          # exact dup of 0
        (2, near.strip(), "en", "s", len(near)),          # near dup of 0
        (3, "completely different words here about spark engines and parquet files", "en", "s", 60),
        (4, "tiny", "en", "s", 4),                        # fails quality gate
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_quality_filter_drops_short(spark):
    docs = _docs(spark)
    kept = {r["doc_id"] for r in quality_filter(docs).collect()}
    assert 4 not in kept and 0 in kept


def test_exact_dedup_keeps_lowest_id(spark):
    docs = _docs(spark)
    kept = {r["doc_id"] for r in exact_dedup(docs).collect()}
    assert 0 in kept and 1 not in kept
    assert {2, 3, 4} <= kept


def test_near_dedup_drops_near_duplicate(spark):
    docs = exact_dedup(quality_filter(_docs(spark)))
    kept = {r["doc_id"] for r in near_dedup(docs, threshold=0.6).collect()}
    assert 0 in kept and 2 not in kept  # near-dup dropped, original kept
    assert 3 in kept


def test_clean_corpus_funnel(spark):
    cleaned, stats = clean_corpus(_docs(spark))
    s = stats.head()
    assert s["n_raw"] == 5
    assert s["n_after_quality"] == 4
    assert s["n_after_exact_dedup"] == 3
    assert s["n_after_near_dedup"] <= 3
    assert cleaned.count() == s["n_after_near_dedup"]


def test_funnel_twin_matches_pipeline_counts(spark, tmp_path):
    """q_corpus_funnel (single-scan flag agg) must agree with the
    pipeline's own per-stage counts on the deterministic stages."""
    docs = _docs(spark)
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    from kafka_clickhouse_implementation_spark.registry import all_queries

    row = all_queries()["q_corpus_funnel"](spark, str(tmp_path)).head()
    _, stats = clean_corpus(docs)
    s = stats.head()
    assert (row["n_raw"], row["n_after_quality"], row["n_after_exact_dedup"]) == (
        s["n_raw"],
        s["n_after_quality"],
        s["n_after_exact_dedup"],
    )
