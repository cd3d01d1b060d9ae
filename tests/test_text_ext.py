"""text_ext invariants: the hash sample must be layout-independent
(the property that df.sample lacks), and bigram generation must not
leave JVM codegen."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_stratified_sample_is_layout_independent(spark):
    q = all_queries()["q_stratified_sample"]
    base = {r.lang: (r.n_total, r.n_sampled) for r in q(spark, SF).collect()}
    # same computation over a repartitioned input must sample the same rows
    from kafka_clickhouse_implementation_spark.io import load
    from pyspark.sql import functions as F

    docs = load(spark, SF, "documents").repartition(7)
    keep = (F.col("doc_id") * 2654435761) % 1000 < 200
    again = {
        r.lang: (r.n_total, r.n_sampled)
        for r in docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
        )
        .collect()
    }
    assert base == again
    # a ~20% sample should actually thin every stratum
    for n_total, n_sampled in base.values():
        assert 0 < n_sampled < n_total


def test_bigram_plan_stays_jvm_side_and_prunes(spark):
    """No BatchEvalPython / ArrowEvalPython (bigrams are higher-order
    expressions), and the scan reads only the text column."""
    df = all_queries()["q_bigram_counts"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "ReadSchema: struct<text:string>" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
