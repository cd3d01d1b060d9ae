"""Tier B UDx surface (SURVEY §2.3 B25-B27): scalar pandas UDF, grouped
UDAF via applyInPandas, and UDTF-style row expansion via mapInPandas.

UDFs are the slow path — everything here is Arrow-batched (vectorized),
never row-at-a-time, and the logic is deliberately SQL-replicable so the
DuckDB oracle can check it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


@F.pandas_udf(T.LongType())
def _cust_id_from_name(names: pd.Series) -> pd.Series:
    """Extract the numeric id token from 'Customer#000000042' — the
    consumer-side field-mapping idiom (kafka+clickhouse.md:146-153) as a
    vectorized scalar UDF."""
    return names.str.split("#").str[1].astype("int64")


@query(
    "q_udf_domain",
    oracle="""
    SELECT CAST(sum(CAST(split_part(c_name, '#', 2) AS BIGINT)) AS BIGINT)
             AS id_sum,
           count(*) AS n
    FROM customer
    """,
)
def q_udf_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25 — scalar pandas UDF (Arrow-batched): parse the id token out of
    each customer name, aggregate. ~10-100× faster than a row-at-a-time
    Python UDF; still slower than split_part built-in — kept as the UDF
    capability proof."""
    c = load(spark, sf_dir, "customer")
    return c.select(_cust_id_from_name(F.col("c_name")).alias("cid")).agg(
        F.sum("cid").alias("id_sum"), F.count(F.lit(1)).alias("n")
    )


def _geomean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group geometric mean, numerically via mean-of-logs."""
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "geomean": [round(float(np.exp(np.log(pdf["l_quantity"].to_numpy()).mean())), 6)],
        }
    )


@query(
    "q_udaf_geomean",
    oracle="""
    SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geomean
    FROM lineitem GROUP BY 1
    """,
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 — UDAF via applyInPandas: geometric mean of quantity per
    returnflag. One shuffle on the group key; each group arrives as one
    Arrow batch. Scale note: groups must fit in executor memory —
    fine for low-cardinality keys; for high-cardinality use a two-level
    sum-of-logs with built-ins instead (as the oracle shows)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        _geomean_group, schema="l_returnflag string, geomean double"
    )


def _tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """UDTF: one document row in → one row per token out (vectorized:
    numpy repeat + single concatenation, no per-row Python loop)."""
    import itertools

    for pdf in batches:
        toks = pdf["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), lens),
                "token": list(itertools.chain.from_iterable(toks)),
            }
        )


@query(
    "q_udtf_tokenize",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY 1 ORDER BY n DESC, token LIMIT 20
    """,
)
def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 — UDTF-style expansion via mapInPandas (each input batch may
    yield more rows than it received), then a plain distributed count.
    Top-20 with token tiebreak for determinism.

    The input repartitions before the Python stage: the documents
    table is one parquet file → one scan partition → ONE Python worker
    would do all the UDTF work (measured 2.2 s at sf0.1 vs 0.6 s
    parallel). On a real corpus the scan has many splits and this is a
    no-op-sized shuffle of (id, text) pairs; the principle stands —
    match Python-stage parallelism to cores, not to file count."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").repartition(32)
    tokens = docs.mapInPandas(_tokenize_batches, schema="doc_id long, token string")
    return (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )
