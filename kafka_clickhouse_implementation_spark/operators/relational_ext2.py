"""Round-3 relational widening: exact distribution statistics (interpolated
quartiles), deterministic mode, pivot/unpivot reshaping, and cumulative
first-seen distinct counting on the distributed-prefix library.

Float discipline notes (see functions/numeric.py + verify skill):
- Interpolated quantiles at q ∈ {.25, .5, .75} over INTEGER-VALUED data
  are engine-portable: the interpolation fraction is an exact binary
  fraction and lo + f·(hi−lo) stays an exact small rational, so Spark's
  ``percentile`` and DuckDB's ``quantile_cont`` emit identical doubles.
  Arbitrary q (e.g. 0.37) or non-integer data would NOT be safe.
- Everything else here is integer counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query
from kafka_clickhouse_implementation_spark.schemas import EVENT_TYPES

# the schema's closed domain, in deterministic column order for PIVOT
_EVENT_TYPES = sorted(EVENT_TYPES)


@query(
    "q_quartiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5)  AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of order quantity per return flag
    (ClickHouse ``quantileExact``-family analogue). ``percentile`` is
    an exact partial aggregate: each partition ships a value histogram,
    never raw rows, then the final interpolation runs once per group —
    portable here because quarter fractions over integers are exact
    (module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25D)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5D)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75D)").alias("p75"),
        F.count("*").alias("n"),
    )


@query("q_approx_quartiles")  # rows-only: approx_percentile's KLL-family
# sketch is engine-private; the exact twin q_quartiles is the oracle-
# checked counterpart, and the error bound is pytest-asserted.
def q_approx_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quartiles (ClickHouse ``quantileTDigest`` family):
    ``approx_percentile`` keeps a bounded-size mergeable sketch per
    group — the 100 TB path when C38's exact value histogram is itself
    too wide (e.g. high-cardinality float measures). accuracy=10000
    bounds rank error at 1/10000."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 10000)"
        ).alias("qs"),
        F.count("*").alias("n"),
    ).select(
        "l_returnflag",
        F.col("qs")[0].alias("p25"),
        F.col("qs")[1].alias("p50"),
        F.col("qs")[2].alias("p75"),
        "n",
    )


@query(
    "q_mode_by_type",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id % 100 AS bucket, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, bucket, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, bucket) AS rn
      FROM counts
    )
    SELECT event_type, bucket AS mode_bucket, n AS mode_n
    FROM ranked WHERE rn = 1
    """,
)
def q_mode_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent user bucket per event type,
    ties broken by smallest bucket — ClickHouse ``topK(1)`` exact twin).
    Two partial-aggregated exchanges; the rank window is partitioned by
    event_type, never global."""
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.select("event_type", (F.col("user_id") % 100).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "bucket")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "q_pivot_events",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: daily event counts fanned out to one column per event type
    (ClickHouse ``sumIf``-per-type reports). The explicit value list
    keeps the plan a single pass — Spark needs no extra distinct-scan to
    discover the columns, and the output schema is stable for the
    driver's schema check."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    pv = ev.groupBy("day").pivot("event_type", _EVENT_TYPES).count().na.fill(0)
    return pv.select(
        "day", *[F.col(t).cast("long").alias(t) for t in _EVENT_TYPES]
    )


@query(
    "q_unpivot_measures",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'n_rows' AS measure, n_rows AS val FROM agg
    UNION ALL
    SELECT l_returnflag, 'n_orders' AS measure, n_orders AS val FROM agg
    """,
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide per-group measures to (group, measure, val)
    long form — the inverse reshape of q_pivot_events, via the native
    ``unpivot`` operator (a narrow generate, no shuffle beyond the
    aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["n_rows", "n_orders"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "q_qualify_latest",
    oracle="""
    SELECT user_id, event_id, event_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_qualify_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-semantics parity (ClickHouse and DuckDB both speak the
    keyword; open-source Spark expresses the same predicate as a
    row_number filter, which Catalyst rewrites to WindowGroupLimit —
    per-group early stop before the exchange): the latest event per
    user, i.e. the ReplacingMergeTree-FINAL read. Window partitioned by
    user_id, never global; deterministic tie-break on event_id."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@query(
    "q_limit_by",
    oracle="""
    SELECT event_type, event_id, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id) <= 2
    """,
)
def q_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT 2 BY event_type`` — top-2 rows per group,
    deterministic tie-break on event_id. Expressed as a rank predicate
    so Spark's WindowGroupLimit keeps only 2 rows per group on the map
    side before the window exchange."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("event_type", "event_id", "value")
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT user_id, event_id,
           CAST(ntile(4) OVER w AS INT) AS quartile_bucket,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per user — portable because both emit exact small-integer ratios
    through one IEEE division ((rank-1)/(n-1), rows≤cur/n) over an
    unambiguous integer ordering. Windows partitioned by user_id,
    never global."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile_bucket"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_first_seen_cumulative",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ), per_day AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM first_day GROUP BY day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM per_day
    """,
)
def q_first_seen_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user accounting: users first seen per day and the cumulative
    distinct-user curve. The cumulative sum runs on
    plans/prefix.ranged_prefix — the same distributed prefix-sum library
    as q_token_packing/q_zipf_rank, so even a years-long day spine never
    funnels through one window task (the oracle may use a plain window;
    DuckDB is single-node by definition)."""
    from kafka_clickhouse_implementation_spark.plans.prefix import ranged_prefix

    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    per_day = first_day.groupBy("day").agg(F.count("*").alias("new_users"))
    return ranged_prefix(
        per_day, [F.col("day")], sum_cols={"cum_users": "new_users"}
    ).select("day", "new_users", "cum_users")


@query(
    "q_group_array",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS uniq_types,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events WHERE user_id < 50 GROUP BY user_id
    """,
)
def q_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArray`` / ``groupUniqArray`` parity: per user,
    the event-type sequence in (ts, event_id) order and the sorted
    distinct type set — serialized to comma-joined strings at the
    driver boundary (SURVEY §2 notes: no ArrayType may reach the
    driver). One hash aggregation; the order-sensitive sequence is
    assembled by sorting (ts_us, event_id, type) structs inside the
    aggregation buffer, so the shuffle order never matters. Per-user
    sequences are clickstream-sized; for adversarial skew cap with a
    windowed top-N first (same note as sequenceMatch C14)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    kv = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id"),
                F.col("event_type"),
            )
        )
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(kv, lambda x: x["event_type"])).alias("type_seq"),
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("uniq_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_dict_get",
    oracle="""
    SELECT coalesce(n.n_name, '<none>') AS nation_name,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS total_bal
    FROM customer c
    LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) n
      ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGetOrDefault`` analogue (round 5, the batch twin
    of streaming/pipeline.enriched_stream): enrich each fact row via a
    BROADCAST dictionary lookup with a declared default for misses —
    the dictionary is deliberately missing keys >= 20 so the default
    path is non-vacuous. Plan shape at 100 TB: the dictionary ships
    once per executor (ClickHouse's in-RAM dictionary is Spark's
    broadcast hash relation); the fact side is never shuffled for the
    lookup — the only exchange is the final small aggregation. Money
    sum follows the functions/numeric decimal discipline."""
    from kafka_clickhouse_implementation_spark.functions.numeric import dsum

    cust = load(spark, sf_dir, "customer")
    dim = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 20)
        .select("n_nationkey", "n_name")
    )
    return (
        cust.join(
            F.broadcast(dim),
            cust.c_nationkey == dim.n_nationkey,
            "left",
        )
        .groupBy(F.coalesce("n_name", F.lit("<none>")).alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "q_ema",
    # The fold is IEEE-deterministic because the order is pinned and
    # alpha=0.5 is an exact binary fraction: both engines execute the
    # identical x_0-seeded left fold 0.5*x + 0.5*acc over the same
    # (ts, event_id)-sorted sequence, so the doubles are bit-identical
    # — no rounding needed (the same order-control recipe as
    # q_unigram_surprisal).
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vals,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE user_id < 100 GROUP BY user_id
    )
    SELECT user_id, n_events,
           list_reduce(vals, (acc, x) -> CAST(0.5 AS DOUBLE) * x
                                         + CAST(0.5 AS DOUBLE) * acc) AS ema
    FROM seq
    """,
)
def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` analogue (C72): per-user
    EMA of event value over the (ts, event_id)-ordered stream,
    alpha=1/2, seeded with the first observation. The sequence is
    assembled by sorting structs inside ONE aggregation buffer
    (shuffle-order-free, same pattern as groupArray) and folded with a
    JVM-side higher-order ``aggregate`` — per-user state is one double,
    and at 100 TB the shuffle carries (user, value, ts) triples once.
    Streaming twin: the same fold is an applyInPandasWithState update
    (one double of state per user), the C25 machinery."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id"),
                F.col("value"),
            )
        )
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("seq"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.expr(
                "aggregate(slice(transform(seq, s -> s.value), 2, size(seq) - 1),"
                " transform(seq, s -> s.value)[0],"
                " (acc, x) -> CAST(0.5 AS DOUBLE) * x"
                "             + CAST(0.5 AS DOUBLE) * acc)"
            ).alias("ema"),
        )
    )


_VM_WT = "CAST(floor(value * 1000 + 0.5) AS BIGINT)"  # the C76 milli recipe


@query(
    "q_with_totals",
    oracle=f"""
    SELECT CASE WHEN grouping(event_type) = 1 THEN '' ELSE event_type END
             AS event_type,
           CAST(grouping(event_type) AS INT) AS is_total,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({_VM_WT}) AS BIGINT) AS sum_vm,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY ROLLUP (event_type)
    ORDER BY is_total, event_type
    """,
)
def q_with_totals(spark, sf_dir):
    """ClickHouse `GROUP BY ... WITH TOTALS` (SELECT docs): grouped
    rows PLUS one totals row aggregating the whole input, the totals
    group key taking the type's default value ('' for String — the
    ClickHouse convention, distinguished by an explicit is_total flag
    since '' could collide with a real key). Spark-first: ROLLUP with
    a grouping() marker IS the semantics — one pass, partial aggs
    map-side, no second scan for the totals row; n_users shows it
    composing with count(DISTINCT) (totals users <= sum of per-group
    users, the reaggregation-vs-union distinction WITH TOTALS exists
    for)."""
    from kafka_clickhouse_implementation_spark.io import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.grouping("event_type").cast("int").alias("is_total"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr(_VM_WT)).cast("long").alias("sum_vm"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.coalesce("event_type", F.lit("")).alias("event_type"),
            "is_total",
            "n_events",
            "sum_vm",
            "n_users",
        )
        .orderBy("is_total", "event_type")
    )
