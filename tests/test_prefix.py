"""plans/prefix.ranged_prefix — exact global running aggregates from
range partitioning + per-partition offsets (no single-partition window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.plans.prefix import ranged_prefix


def test_running_sum_and_rank_match_serial(spark):
    n = 1_000
    vals = [(i, (i * 7919) % 13) for i in range(n)]
    df = spark.createDataFrame(vals, "id long, v long")
    out = ranged_prefix(
        df, [F.col("id")], sum_cols={"cum": "v"}, rn_col="rn", num_partitions=7
    )
    rows = sorted(out.collect(), key=lambda r: r["id"])
    acc = 0
    for i, r in enumerate(rows):
        acc += vals[i][1]
        assert r["cum"] == acc, (i, r)
        assert r["rn"] == i + 1, (i, r)


def test_descending_composite_order(spark):
    # same total order q_zipf_rank uses: (n DESC, token)
    data = [("a", 5), ("b", 5), ("c", 2), ("d", 9)]
    df = spark.createDataFrame(data, "token string, n long")
    out = ranged_prefix(
        df,
        [F.col("n").desc(), F.col("token")],
        sum_cols={"cum": "n"},
        rn_col="rnk",
        num_partitions=3,
    )
    got = {r["token"]: (r["rnk"], r["cum"]) for r in out.collect()}
    assert got == {"d": (1, 9), "a": (2, 14), "b": (3, 19), "c": (4, 21)}


def test_property_random_values_and_partitionings(spark):
    """Randomized model check: for arbitrary values and partition
    counts (including p >> n and p = 1), the distributed prefix sum
    must equal the serial scan. Deterministic seeds, no hypothesis
    spark-fixture interplay needed."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(1, 80)
        p = rng.choice([1, 2, 3, 7, 16, 64])
        vals = [(i, rng.randint(-50, 50)) for i in range(n)]
        df = spark.createDataFrame(vals, "id long, v long")
        out = ranged_prefix(
            df, [F.col("id")], sum_cols={"cum": "v"}, rn_col="rn", num_partitions=p
        )
        rows = sorted(out.collect(), key=lambda r: r["id"])
        acc = 0
        for i, r in enumerate(rows):
            acc += vals[i][1]
            assert r["cum"] == acc, (seed, p, i)
            assert r["rn"] == i + 1, (seed, p, i)


def test_single_row_and_empty(spark):
    one = spark.createDataFrame([(1, 10)], "id long, v long")
    r = ranged_prefix(one, [F.col("id")], {"cum": "v"}, rn_col="rn").collect()
    assert [(x["cum"], x["rn"]) for x in r] == [(10, 1)]
    empty = one.filter("id < 0")
    assert ranged_prefix(empty, [F.col("id")], {"cum": "v"}).count() == 0
