"""Classic TPC-H query shapes beyond Q1/Q5 (which live in
relational.py as q_pricing_summary / q_revenue_by_nation) — the
workload the reference's ClickHouse SQL surface is expected to serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.numeric import dsum
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query


@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_charge,
           (CAST(round(sum(CAST(l_quantity AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*)) AS avg_qty,
           (CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*)) AS avg_price,
           (CAST(round(sum(CAST(l_discount AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*)) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 — TPC-H Q1: the classic multi-measure scan-agg. One scan, all
    measures in a single partial+final aggregation; the shipdate filter
    pushes down to the parquet scan (PushedFilters). Sums quantize in
    DECIMAL and round in decimal space (functions/numeric.py) so the
    result is order-independent AND engine-portable at .xx5 boundaries
    (the round-1 driver hash fail)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            (F.round(F.sum(F.col("l_quantity").cast("decimal(28,8)")), 4).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,8)")), 4).cast("double")
             / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum(F.col("l_discount").cast("decimal(28,8)")), 4).cast("double")
             / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective dim filter first, then
    fact joins, top-10 by revenue. All three filters push to their
    scans; the final top-k is TakeOrdered."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp")
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): pure filter + global agg — the
    pushdown showcase; every predicate reaches the parquet scan and the
    aggregation is a single partial/final pass with no group keys."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q_tpch_q8_shape",
    oracle="""
    WITH all_volumes AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           (CAST(round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume END), 4) AS DOUBLE)
            / CAST(round(sum(volume), 4) AS DOUBLE)) AS mkt_share
    FROM all_volumes GROUP BY o_year
    """,
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 8-way join with nation joined
    twice under different roles, then a conditional share ratio per
    year. Decimal volumes keep the ratio order-independent."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    volumes = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast("decimal(28,8)").alias("volume"),
            "supp_nation",
        )
    )
    return volumes.groupBy("o_year").agg(
        (
            F.round(F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))), 4).cast("double")
            / F.round(F.sum("volume"), 4).cast("double")
        ).alias("mkt_share")
    )


@query(
    "q_tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_size IN (1, 4, 7)
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_suppkey = l_suppkey AND s_name LIKE '%11%')
    GROUP BY 1, 2
    """,
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) shape: attribute filters,
    a NOT-IN supplier exclusion (anti join), distinct-supplier counts
    per attribute group. lineitem stands in for partsupp as the
    part↔supplier bridge."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2") & F.col("p_size").isin(1, 4, 7)
    ).select("p_partkey", "p_brand", "p_type")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%11%"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(excluded), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q21_shape",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (waiting suppliers) shape: EXISTS + NOT-EXISTS
    self-joins on the fact — the sole-returning-supplier-on-
    multi-supplier-orders pattern (returnflag stands in for the absent
    receipt/commit dates)."""
    from kafka_clickhouse_implementation_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 10
        """
    )


@query(
    "q_tpch_q13_shape",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): a group-by of a group-by —
    order counts per customer, then the histogram of those counts.
    Second aggregation input is already tiny (one row per customer)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q17_shape",
    oracle="""
    SELECT (CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,8))), 4) AS DOUBLE) / 7.0)
             AS avg_yearly
    FROM lineitem l1 JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity orders): correlated scalar aggregate
    subquery — planned as a per-partkey average joined back to the
    fact, so the 'correlation' is one extra aggregation + equi-join,
    not a per-row subquery execution. (l_quantity is integral, so the
    0.2×avg threshold is float-exact and engine-portable.)"""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    avg_q = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("thresh"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            (
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,8)")), 4).cast("double") / 7.0
            ).alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q19_shape",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'PROMO'    AND l_quantity BETWEEN 1 AND 20)
       OR (p_type = 'STANDARD' AND l_quantity BETWEEN 10 AND 30)
    """,
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive mixed-table
    predicates — the join condition can't prune either side alone, so
    the filter evaluates post-join inside codegen; part still
    broadcasts."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    cond = (
        (F.col("p_type") == "PROMO") & F.col("l_quantity").between(1, 20)
    ) | ((F.col("p_type") == "STANDARD") & F.col("l_quantity").between(10, 30))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_tpch_q22_shape",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,8))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): scalar-subquery threshold +
    NOT IN anti join — rich customers with no recent (2000+) orders."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("t"))
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("t")).drop("t")
    never_ordered = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return never_ordered.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


@query(
    "q_tpch_q15_shape",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): CTE revenue view + scalar-subquery max.
    The max is a one-row broadcast; ties (multiple top suppliers) are
    all returned — same semantics both engines."""
    from kafka_clickhouse_implementation_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@query(
    "q_tpch_q7_shape",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): 6-way join with the nation dim
    broadcast twice under different roles (supplier vs customer
    nation), cross-nation flows only."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    picked = n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    sn = picked.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = picked.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS with a
    cross-table predicate — planned as a left-semi join carrying only
    (orderkey, shipdate vs orderdate)."""
    from kafka_clickhouse_implementation_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY 1
        """
    )


@query(
    "q_tpch_q12_shape",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS bulk_lines,
           CAST(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS BIGINT) AS small_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes) shape: join + dual conditional counts
    in one pass."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_quantity")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("bulk_lines"),
            F.sum(F.when(F.col("l_quantity") < 25, 1).otherwise(0)).alias("small_lines"),
        )
    )


@query(
    "q_tpch_q14_shape",
    oracle="""
    SELECT (
             100.0 * CAST(round(sum(CAST(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount) END
                              AS DECIMAL(28,8))), 4) AS DOUBLE)
             / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 4) AS DOUBLE)
           ) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-sum ratio over a
    fact⋈dim join. Part (2k rows) broadcasts; one aggregation pass
    computes both numerator and denominator."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.round(F.sum(promo.cast("decimal(28,8)")), 4).cast("double")
                / F.round(F.sum(rev.cast("decimal(28,8)")), 4).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q18_shape",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(28,8))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): IN over a grouped-HAVING
    subquery (planned as an aggregate + semi join), then re-join and
    top-20. The HAVING pre-filter shrinks the join input before any
    wide shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q_tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): 4-way join, grouped revenue,
    top-20 customers. Nation broadcasts; custkey tiebreak."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---- Derived partsupp (closes the round-4 verdict "missing" item 5:
# the testdata ships no partsupp table, so the TPC-H partsupp family
# was a harness limitation). partsupp is DERIVED deterministically from
# lineitem's distinct (l_partkey, l_suppkey) pairs with modular integer
# arithmetic both engines restate identically; supply cost is carried
# in integer CENTS so every comparison, min, and sum in Q2/Q11/Q20 is
# exact — no float discipline needed anywhere in the family.

_PARTSUPP_CTE = """
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST((l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS BIGINT) AS ps_availqty,
             CAST((l_partkey * 13 + l_suppkey * 17) % 100000 + 100 AS BIGINT) AS ps_cost_cents
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PARTSUPP_CTE — one distinct over the two key
    columns (map-side combined; the scan reads ONLY those two columns)
    plus generated arithmetic, no extra shuffle beyond the distinct."""
    li = load(spark, sf_dir, "lineitem")
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((pk * 7 + sk * 3) % 9999 + 1).cast("long").alias("ps_availqty"),
            ((pk * 13 + sk * 17) % 100000 + 100).cast("long").alias("ps_cost_cents"),
        )
    )


@query(
    "q_tpch_q11_shape",
    oracle=_PARTSUPP_CTE + """
    , scoped AS (
      SELECT ps_partkey, ps_availqty * ps_cost_cents AS v
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    ), per_part AS (
      SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
      FROM scoped GROUP BY 1
    ), threshold AS (
      SELECT CAST(sum(v) // 10000 AS BIGINT) AS t FROM scoped
    )
    SELECT ps_partkey, value_cents
    FROM per_part, threshold
    WHERE value_cents > t
    ORDER BY value_cents DESC, ps_partkey
    LIMIT 20
    """,
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part inventory value for
    suppliers of a nation group, kept only above a fraction of the
    GLOBAL value — the scalar-subquery-threshold shape. Supplier and
    nation broadcast (dims); the only data shuffle is the per-part
    aggregation; the threshold is a 1-row broadcast crossJoin. All
    money in integer cents: sums, the // 10000 threshold, and the
    strict > are exact on both engines."""
    ps = derived_partsupp(spark, sf_dir)
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
        .select("n_nationkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    scoped = ps.join(
        F.broadcast(supp), ps.ps_suppkey == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_availqty") * F.col("ps_cost_cents")).alias("v"),
    )
    per_part = scoped.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    thr = scoped.agg(F.expr("sum(v) div 10000").alias("t"))
    return (
        per_part.crossJoin(F.broadcast(thr))
        .filter(F.col("value_cents") > F.col("t"))
        .orderBy(F.desc("value_cents"), "ps_partkey")
        .limit(20)
        .select("ps_partkey", "value_cents")
    )


@query(
    "q_tpch_q2_shape",
    oracle=_PARTSUPP_CTE + """
    , eur AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), cand AS (
      SELECT ps_partkey, ps_suppkey, ps_cost_cents, s_name, n_name
      FROM partsupp
      JOIN eur ON ps_suppkey = s_suppkey
      JOIN part ON p_partkey = ps_partkey
      WHERE p_size <= 5 AND p_type = 'STANDARD'
    ), best AS (
      SELECT *, min(ps_cost_cents) OVER (PARTITION BY ps_partkey) AS min_cents
      FROM cand
    )
    SELECT ps_partkey, ps_suppkey, s_name, n_name, ps_cost_cents
    FROM best WHERE ps_cost_cents = min_cents
    ORDER BY ps_partkey, ps_suppkey
    LIMIT 25
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    European supplier(s) with the minimum supply cost — the correlated-
    min shape, expressed as a PARTITIONED window min + equality (never
    a global window; ties kept deterministically). part/supplier/
    nation/region all broadcast; the window partitions by ps_partkey,
    the same key the candidate join already hashed on. Cents keep the
    min/equality exact."""
    ps = derived_partsupp(spark, sf_dir)
    eur = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    cand = (
        ps.join(F.broadcast(eur), ps.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part), ps.ps_partkey == F.col("p_partkey"))
        .select("ps_partkey", "ps_suppkey", "ps_cost_cents", "s_name", "n_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cents", F.min("ps_cost_cents").over(w))
        .filter(F.col("ps_cost_cents") == F.col("min_cents"))
        .orderBy("ps_partkey", "ps_suppkey")
        .limit(25)
        .select("ps_partkey", "ps_suppkey", "s_name", "n_name", "ps_cost_cents")
    )


@query(
    "q_tpch_q20_shape",
    oracle=_PARTSUPP_CTE + """
    , shipped AS (
      SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT ps_suppkey
      FROM partsupp
      JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN part ON p_partkey = ps_partkey
      WHERE p_name LIKE 'small%' AND ps_availqty * 2 > qty
    )
    ORDER BY s_suppkey
    LIMIT 20
    """,
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers whose stock of
    'small%' parts exceeds half of what they shipped in 1998 — the
    nested-semi-join shape. The year filter pushes to the lineitem
    scan; the half-of-shipped comparison is availqty*2 > qty in exact
    integers (quantities are integral); the supplier filter is a LEFT
    SEMI join so supplier rows are never duplicated by multi-part
    matches."""
    ps = derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualifying = (
        ps.join(
            shipped,
            (ps.ps_partkey == F.col("l_partkey"))
            & (ps.ps_suppkey == F.col("l_suppkey")),
        )
        .join(F.broadcast(part), ps.ps_partkey == F.col("p_partkey"))
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .orderBy("s_suppkey")
        .limit(20)
        .select("s_suppkey", "s_name")
    )


@query(
    "q_tpch_q9_shape",
    oracle=_PARTSUPP_CTE + """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               - (ps_cost_cents / 100.0) * l_quantity
                               AS DECIMAL(28,8))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, the last of the 22 shapes): per
    (nation, order year) profit where unit cost comes from the derived
    partsupp. Five joins — part/supplier/nation broadcast, partsupp and
    orders shuffle on keys lineitem already carries; the p_name filter
    prunes the fact rows via the broadcast part join before any
    exchange. Profit amounts are identical IEEE expressions on both
    engines (cents/100.0 is the same double everywhere), then
    decimal-accumulated per the functions/numeric discipline."""
    li = load(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    supp_nat = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - (F.col("ps_cost_cents") / F.lit(100.0)) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )
