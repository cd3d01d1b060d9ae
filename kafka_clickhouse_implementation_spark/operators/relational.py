"""Tier B — relational capability closure (SURVEY §2.3).

The reference's query language is ClickHouse SQL, so a same-capability
engine must cover the standard relational algebra even though the
tutorial itself only exercises filter/project/sort/count/sum
(kafka+clickhouse.md:161-166, 221-243). Everything here is built-in
Spark SQL — zero custom Catalyst work (SURVEY §4 conclusion).

Scale notes appear per-query; the common rules: dims (nation, region,
supplier) are broadcast so fact-side joins shuffle nothing; aggregates
rely on Spark's automatic partial (map-side) aggregation; top-k is
orderBy+limit which Spark executes as TakeOrdered (per-partition heap +
driver merge of k rows, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.numeric import dsum
from kafka_clickhouse_implementation_spark.io import load, register_views
from kafka_clickhouse_implementation_spark.registry import query


# --- joins -----------------------------------------------------------------


@query(
    "q_join_orders_customer",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — inner equi-join; Spark/AQE picks the physical join. At
    sf0.01 customer broadcasts; at 100 TB AQE would pick sort-merge on
    the shuffled key — same declared plan either way."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_join_broadcast_nation",
    oracle="""
    SELECT r_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def q_join_broadcast_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — explicit broadcast of small dims: nation (25 rows) and
    region (5 rows) never warrant a shuffle at any scale; the fact side
    streams through map-side hash joins."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_left_join_orders",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_custs_without_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def q_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — left outer join preserving customers with zero orders."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_custs_without_orders"),
    )


@query(
    "q_semi_anti",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS n_with_orders,
      (SELECT count(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
          AS n_without_orders
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — left-semi (EXISTS) and left-anti (NOT EXISTS) joins. Semi
    and anti joins carry no payload columns from the right side, so the
    shuffle moves keys only — the cheapest existence check at scale."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return semi.crossJoin(anti)


@query(
    "q_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — multi-way join + aggregation (TPC-H Q5 shape). Join order:
    fact⋈orders⋈customer (shuffle joins on keys) then broadcast nation;
    the revenue expression is computed pre-aggregation inside
    whole-stage codegen, and partial aggregation shrinks the final
    shuffle to 25 nation rows per task."""
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- aggregates ------------------------------------------------------------


@query(
    "q_agg_suite",
    oracle="""
    SELECT l_returnflag,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty,
           (CAST(round(sum(CAST(l_quantity AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*)) AS avg_qty,
           count(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY 1
    """,
)
def q_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 — min/max/avg/count-distinct in one grouped pass. Exact
    distinct forces a second shuffle stage on (group, partkey); see
    q_approx_distinct for the single-pass sketch alternative at scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        (F.round(F.sum(F.col("l_quantity").cast("decimal(28,8)")), 4).cast("double")
         / F.count(F.lit(1))).alias("avg_qty"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
    )


@query(
    "q_rollup_day_type",
    oracle="""
    SELECT day, event_type, count(*) AS n
    FROM (SELECT CAST(ts AS DATE) AS day, event_type FROM events)
    GROUP BY ROLLUP(day, event_type)
    """,
)
def q_rollup_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 — ROLLUP grouping sets: (day, type), (day), () in one pass
    (Spark expands grouping sets inside a single shuffle)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .rollup("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_having",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events GROUP BY 1 HAVING count(*) > 150
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 — HAVING is a post-aggregation filter."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 150)
    )


@query(
    "q_distinct_users",
    oracle="""
    SELECT count(*) AS n_pairs
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 — distinct/dedup: a group-by with no measures; partial
    dedup runs map-side before the shuffle."""
    ev = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "q_topk_spenders",
    oracle="""
    SELECT o_custkey, CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,8))), 2) AS DOUBLE) AS total_spent
    FROM orders GROUP BY 1
    ORDER BY total_spent DESC, o_custkey LIMIT 5
    """,
)
def q_topk_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11/B24 — top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap of k, driver merges k·partitions rows — never a
    global sort). Tiebreak on o_custkey for determinism."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey"))
        .limit(5)
    )


@query(
    "q_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 20
    """,
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 — LIMIT/OFFSET pagination over a unique sort key."""
    orders = load(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey").orderBy("o_orderkey").offset(20).limit(10)


# --- window functions ------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 — ranking window: top-3 orders per customer. One shuffle on
    the partition key; the rank filter cuts output before anything else
    consumes it (Spark pushes the rnk<=3 limit into the window via
    WindowGroupLimit)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT count(*) AS n_gaps FROM (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS gap_us
      FROM events
    ) WHERE gap_us > 3600000000
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 — lag analytic: per-user previous event time; count gaps over
    one hour. Microsecond-exact arithmetic on both sides (no float)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return (
        ev.select((us - F.lag(us, 1).over(w)).alias("gap_us"))
        .filter(F.col("gap_us") > 3_600_000_000)
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


@query(
    "q_window_runsum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS run_sum
    FROM events WHERE user_id IN (1, 2, 3)
    """,
)
def q_window_runsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 — frame aggregate: running sum per user. The user filter
    pushes to the scan, so the window sees only the 3 users' rows."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.filter(F.col("user_id").isin(1, 2, 3))
        .select("event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("run_sum"))
    )


@query(
    "q_window_analytics",
    oracle="""
    SELECT user_id, event_id,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           first_value(event_id) OVER w AS first_ev,
           last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS last_ev
    FROM events WHERE user_id IN (4, 5)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window analytics suite: ntile/percent_rank/first_value/last_value
    (last_value over the full-partition frame — the default running
    frame is a classic correctness trap)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.filter(F.col("user_id").isin(4, 5)).select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.first("event_id").over(w).alias("first_ev"),
        F.last("event_id").over(wfull).alias("last_ev"),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT CAST(sum(CASE WHEN regexp_matches(c_name, '00+42$') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suffix_42,
           count(DISTINCT regexp_extract(c_name, '([0-9]+)', 1)) AS n_distinct_ids,
           min(regexp_replace(c_name, '[0-9]+', '#')) AS min_masked
    FROM customer
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex suite: match / extract / replace, all JVM-side."""
    c = load(spark, sf_dir, "customer")
    return c.agg(
        F.sum(F.when(F.col("c_name").rlike("00+42$"), 1).otherwise(0)).alias("n_suffix_42"),
        F.countDistinct(F.regexp_extract("c_name", "([0-9]+)", 1)).alias("n_distinct_ids"),
        F.min(F.regexp_replace("c_name", "[0-9]+", "#")).alias("min_masked"),
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT coalesce(NULLIF(event_type, 'error'), 'was_error') AS et,
           count(*) AS n,
           CAST(sum(CASE WHEN value IS NOT NULL AND isnan(value) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nan
    FROM events GROUP BY 1
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling suite: nullif/coalesce/isnan."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("was_error")).alias("et"),
            "value",
        )
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value").isNotNull() & F.isnan("value"), 1).otherwise(0)
            ).alias("n_nan"),
        )
    )


# --- set ops / conditional / scalar functions ------------------------------


@query(
    "q_setops",
    oracle="""
    SELECT
      (SELECT count(*) FROM (SELECT c_nationkey FROM customer
                             INTERSECT SELECT s_nationkey FROM supplier)) AS n_intersect,
      (SELECT count(*) FROM (SELECT c_nationkey FROM customer
                             EXCEPT SELECT s_nationkey FROM supplier)) AS n_except,
      (SELECT count(*) FROM (SELECT c_nationkey FROM customer
                             UNION ALL SELECT s_nationkey FROM supplier)) AS n_unionall
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 — INTERSECT / EXCEPT (distinct semantics) and UNION ALL."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n_intersect = cust.intersect(supp).agg(F.count(F.lit(1)).alias("n_intersect"))
    # subtract = SQL EXCEPT (distinct semantics); exceptAll would keep
    # surplus duplicate occurrences instead.
    n_except = cust.subtract(supp).agg(F.count(F.lit(1)).alias("n_except"))
    n_unionall = cust.unionAll(supp).agg(F.count(F.lit(1)).alias("n_unionall"))
    return n_intersect.crossJoin(n_except).crossJoin(n_unionall)


@query(
    "q_case_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 150000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 — CASE/WHEN bucketing."""
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 150000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return orders.select(bucket.alias("bucket")).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_string_funcs",
    oracle="""
    SELECT CAST(sum(CASE WHEN c_name LIKE '%0042%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_like,
           CAST(sum(length(trim(c_name))) AS BIGINT) AS total_len,
           min(upper(substr(c_name, 1, 8))) AS first_upper,
           max(replace(lower(c_name), 'customer', 'cust')) AS max_replaced,
           count(DISTINCT split_part(c_name, '#', 1)) AS n_prefixes
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 — string function suite: like/length/trim/upper/substr/
    lower/replace/split. All JVM built-ins inside codegen."""
    c = load(spark, sf_dir, "customer")
    return c.agg(
        F.sum(F.when(F.col("c_name").like("%0042%"), 1).otherwise(0)).alias("n_like"),
        F.sum(F.length(F.trim(F.col("c_name")))).alias("total_len"),
        F.min(F.upper(F.substring("c_name", 1, 8))).alias("first_upper"),
        F.max(F.replace(F.lower(F.col("c_name")), F.lit("customer"), F.lit("cust"))).alias("max_replaced"),
        F.countDistinct(F.split_part(F.col("c_name"), F.lit("#"), F.lit(1))).alias("n_prefixes"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           count(*) AS n,
           (CAST(CAST(sum(datediff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT)
                 AS DOUBLE) / count(*)) AS avg_days_since_1995
    FROM orders GROUP BY 1, 2
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 — date/time functions: year/month extraction, datediff."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("dd"),
        )
        .groupBy("yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact integer sum -> ONE IEEE division: engine-portable at
            # any data, unlike round(avg(double)) which flips at .xxx5
            # boundaries (q_docs_by_lang failed exactly this way at sf1)
            (F.sum("dd").cast("double") / F.count(F.lit(1))).alias("avg_days_since_1995"),
        )
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT c_mktsegment,
           (CAST(round(sum(CAST(abs(c_acctbal) AS DECIMAL(28,8))), 4) AS DOUBLE) / count(*)) AS avg_abs,
           CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS sum_floor,
           CAST(sum(CAST(ceil(c_acctbal) AS BIGINT)) AS BIGINT) AS sum_ceil,
           sqrt(CAST(round(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(28,8))), 4) AS DOUBLE)
                / count(*)) AS rms,
           (CAST(sum(CAST(floor(ln(abs(c_acctbal) + 1) * 1e9) AS BIGINT)) AS BIGINT)
            / 1e9 / count(*)) AS avg_ln,
           CAST(sum(c_custkey % 7) AS BIGINT) AS sum_mod
    FROM customer GROUP BY 1
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 — math function suite: abs/floor/ceil/sqrt/ln/modulo."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        (F.round(F.sum(F.abs(F.col("c_acctbal")).cast("decimal(28,8)")), 4).cast("double")
         / F.count(F.lit(1))).alias("avg_abs"),
        F.sum(F.floor(F.col("c_acctbal"))).alias("sum_floor"),
        F.sum(F.ceil(F.col("c_acctbal"))).alias("sum_ceil"),
        # rms: decimal-accumulated sum of squares (order-free), one
        # division + sqrt (both correctly-rounded IEEE); avg_ln: ln is
        # NOT correctly rounded cross-engine, so each term is quantized
        # to integer nano-units BEFORE summing (the LSH projection
        # recipe) - the sum is then exact on both engines
        F.sqrt(
            F.round(F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(28,8)")), 4)
            .cast("double") / F.count(F.lit(1))
        ).alias("rms"),
        (F.sum(F.floor(F.log(F.abs(F.col("c_acctbal")) + 1) * 1e9).cast("long"))
         / F.lit(1e9) / F.count(F.lit(1))).alias("avg_ln"),
        F.sum(F.col("c_custkey") % 7).alias("sum_mod"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT label,
           count(*) AS n_vals,
           (CAST(round(sum(CAST(CAST(e AS DOUBLE) AS DECIMAL(28,8))), 6) AS DOUBLE)
            / count(*)) AS avg_val
    FROM (SELECT label, unnest(embedding) AS e FROM embeddings)
    GROUP BY label
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 — array ops: explode each embedding and aggregate elements
    per label (size histogram is degenerate — all dims are 64 — so the
    per-label element stats are the meaningful check)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.explode("embedding").alias("e"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            # widen float->double BEFORE the decimal cast: casting a
            # FLOAT to decimal rounds its shortest repr in Spark but its
            # exact binary value in DuckDB; float->double is exact in both
            (F.round(F.sum(F.col("e").cast("double").cast("decimal(28,8)")), 6).cast("double")
             / F.count(F.lit(1))).alias("avg_val"),
        )
    )


@query(
    "q_exact_distinct",
    oracle="""
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_id) AS n_events
    FROM events
    """,
)
def q_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 (exact twin) — exact count-distinct; see q_approx_distinct
    for the one-pass HLL variant used at scale."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_id").alias("n_events"),
    )


@query("q_approx_distinct")  # no-oracle: HLL estimates differ across engines
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 — approx_count_distinct (HyperLogLog++): single pass, fixed
    memory, no second shuffle — the scale path for distinct counting.
    Rows-only check (DuckDB's sketch gives different estimates); the
    oracle-checked deterministic twin is q_exact_distinct, and the
    <=5% error bound vs it is pytest-asserted."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("n_events_approx"),
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT count(*) AS n_customers
    FROM customer
    WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 — IN-subquery (Catalyst rewrites to a left-semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_customers
        FROM customer
        WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
        """
    )


@query(
    "q_cte_reuse",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS level, count(*) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT level,
           CAST(sum(total) AS BIGINT) AS total_count,
           count(*) AS n_days
    FROM daily GROUP BY level
    """,
)
def q_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 — CTE: the daily-rollup CTE re-aggregated, same result as the
    A7 two-level path."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type AS level, count(*) AS total
          FROM events GROUP BY 1, 2
        )
        SELECT level,
               sum(total) AS total_count,
               count(*) AS n_days
        FROM daily GROUP BY level
        """
    )
