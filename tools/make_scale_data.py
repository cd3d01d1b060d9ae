"""Self-generated sf1-equivalent dataset (round-4 verdict item 1):
10x key-remapped replication of /root/testdata/sf0.1 into a temp dir,
so bench.py and the plan-assertion suite can measure how every
headliner actually scales (the sf0.1 -> sf1 wall-clock ratio) instead
of arguing about it.

Replication — not re-synthesis — is deliberate: per-copy key
offsetting preserves every marginal distribution, join fan-out, and
skew profile of the driver's generator exactly, while scaling key
cardinalities 10x (which is what a larger scale factor does). Copies
stay referentially consistent within themselves: copy k remaps
o_orderkey AND l_orderkey by the same offset, o_custkey and c_custkey
likewise, so join selectivities are unchanged. Two content columns
need per-copy mutation to avoid a pathological 90%-duplicate corpus:
document text gets a copy-suffix token (fingerprints diverge; token
and length distributions shift by one ~3-char token) and embeddings
get one deterministically-perturbed dimension (near-dup pairs stay
near-dup, exact clones don't explode 10x). Dimension tables (region,
nation) do NOT scale, exactly as in TPC-H.

Usage: python tools/make_scale_data.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/spark_graft_scale/sf1
Everything is deterministic (no RNG, no wall-clock).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.session import get_spark

REPLICAS = 10


def _copies(spark: SparkSession) -> DataFrame:
    return spark.range(REPLICAS).select(F.col("id").cast("long").alias("k"))


def _offset(df: DataFrame, col: str, span: int, dtype: str = "bigint") -> DataFrame:
    return df.withColumn(col, (F.col(col) + F.col("k") * F.lit(span)).cast(dtype))


def replicate(spark: SparkSession, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    copies = _copies(spark)

    def write(name: str, df: DataFrame) -> None:
        df.drop("k").write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"  {name}: written")

    # key spans (max+1) so per-copy offsets can never collide
    def span(df: DataFrame, col: str) -> int:
        return int(df.agg(F.max(col)).first()[0]) + 1

    for name in ("region", "nation"):  # dims don't scale (TPC-H rule)
        write(name, load(spark, src, name).withColumn("k", F.lit(0)))

    cust = load(spark, src, "customer")
    supp = load(spark, src, "supplier")
    part = load(spark, src, "part")
    orders = load(spark, src, "orders")
    li = load(spark, src, "lineitem")
    ck, sk, pk, ok = (
        span(cust, "c_custkey"), span(supp, "s_suppkey"),
        span(part, "p_partkey"), span(orders, "o_orderkey"),
    )
    write("customer", _offset(cust.crossJoin(copies), "c_custkey", ck))
    write("supplier", _offset(supp.crossJoin(copies), "s_suppkey", sk))
    write("part", _offset(part.crossJoin(copies), "p_partkey", pk))
    write(
        "orders",
        _offset(_offset(orders.crossJoin(copies), "o_orderkey", ok), "o_custkey", ck),
    )
    write(
        "lineitem",
        _offset(
            _offset(_offset(li.crossJoin(copies), "l_orderkey", ok), "l_partkey", pk),
            "l_suppkey", sk,
        ),
    )

    ev = load(spark, src, "events")
    ek, uk = span(ev, "event_id"), span(ev, "user_id")
    write(
        "events",
        _offset(_offset(ev.crossJoin(copies), "event_id", ek), "user_id", uk),
    )

    docs = load(spark, src, "documents")
    dk = span(docs, "doc_id")
    docs10 = _offset(docs.crossJoin(copies), "doc_id", dk).withColumn(
        "text",
        F.when(F.col("k") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" c"), F.col("k").cast("string"))
        ),
    )
    write("documents", docs10.withColumn("n_chars", F.length("text").cast("bigint")))

    emb = load(spark, src, "embeddings")
    vk = span(emb, "vec_id")
    dim_idx = (F.col("k") % F.size("embedding")).cast("int")
    emb10 = _offset(emb.crossJoin(copies), "vec_id", vk).withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda v, i: F.when(
                (F.col("k") > 0) & (i == dim_idx),
                (v + F.col("k").cast("float") * F.lit(0.05)).cast("float"),
            ).otherwise(v),
        ),
    )
    write("embeddings", emb10)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    spark = get_spark("make_scale_data")
    replicate(spark, src, out)
    for t in ("lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    # portable-kernel accuracy over the freshly scaled inputs (round-8
    # verdict item 4: monitor at the scale where new input values appear)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import guard_band

    guard_band.main(out)
