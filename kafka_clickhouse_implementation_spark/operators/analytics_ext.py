"""ClickHouse behavioral/statistical aggregate parity, batch 3
(round 6): intervalLengthSum, maxIntersections(+Position),
boundingRatio, rankCorr (Spearman), welchTTest, entropy, and
sequenceNextNode — each an oracle-checked query over ``events``.

Interval model shared by the first two operators: every event opens a
deterministic interval [start_us, start_us + (event_id % 7 + 1)
minutes) — the payload carries no explicit end column, so the duration
is derived reproducibly from event_id arithmetic that the oracle
restates verbatim (same trick as the multimodal payload synthesis).
All interval arithmetic is integer microseconds end-to-end.

Float discipline (functions/numeric.py, ROUNDLOG r5 'latent
round(avg)' entry): no double is ever ROUNDed. Statistics emit raw
IEEE expressions whose inputs are exact integers/decimals rendered
identically on both engines — every +,*,/,sqrt is correctly rounded in
IEEE 754, so identical expression trees over bit-identical inputs
yield bit-identical doubles. ln() is NOT correctly rounded across
libm/Java, so entropy quantizes each ln term to integer nano-units
before summing (the q_math_funcs avg_ln pattern).

Scale: every window below partitions on user_id or event_type — never
a global ORDER BY window (the no-bare-WindowExec plan rule,
tests/test_plans.py). Final reductions are tiny hash aggregates.

Reference anchor: ClickHouse aggregate-function docs list these as
first-class aggregates (intervalLengthSum, maxIntersections,
boundingRatio, rankCorr, welchTTest, entropy, sequenceNextNode);
kafka+clickhouse.md's analytics tier motivates the funnel/retention
family they extend (operators/funnels.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.functions.portable_math import dcast
from kafka_clickhouse_implementation_spark.registry import query

# Shared event-interval definition (integer micros; duration from
# event_id arithmetic so both engines state it identically).
_DUR_US = "(event_id % 7 + 1) * 60000000"


def _spark_ival() -> list:
    """Column list built lazily — F.expr needs an active SparkContext,
    so this must NOT run at import time (the registry imports every
    operator module before any session exists in some tools)."""
    return [
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("s_us"),
        F.expr(f"unix_micros(ts) + {_DUR_US}").alias("e_us"),
    ]
_DUCK_IVAL = f"""
    SELECT user_id, event_id, epoch_us(ts) AS s_us,
           epoch_us(ts) + {_DUR_US} AS e_us
    FROM events
"""


_ILS_ORACLE = f"""
    WITH ival AS ({_DUCK_IVAL}),
    flagged AS (
      SELECT user_id, s_us, e_us, event_id,
             CASE WHEN s_us > coalesce(max(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, e_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM ival
    ),
    islands AS (
      -- event_id tiebreak MUST match the flagged window's total order:
      -- without it, a flag-0 row tied on (s_us, e_us) with its flag-1
      -- partner can sort before it and be assigned to the PREVIOUS
      -- island, nondeterministically (round-6 ADVICE fix).
      SELECT user_id, s_us, e_us,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island,
             max(e_us) - min(s_us) AS island_len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(island_len) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """


@query("q_interval_length_sum", oracle=_ILS_ORACLE)
def q_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` parity: per user, the total
    length of the UNION of its event intervals (overlaps counted once;
    touching intervals merge). Classic island detection — an interval
    starts a new island iff its start exceeds the running max end of
    all earlier intervals — in two user-partitioned window passes over
    integer micros, then a per-island min/max and a per-user sum. Both
    windows and the aggregation shuffle once on user_id; nothing is
    global, so the operator scales with the user count."""
    ival = load(spark, sf_dir, "events").select(*_spark_ival())
    flagged = ival.select(
        "user_id",
        "s_us",
        "e_us",
        "event_id",
        F.when(
            F.col("s_us")
            > F.coalesce(
                F.expr(
                    "max(e_us) OVER (PARTITION BY user_id"
                    " ORDER BY s_us, e_us, event_id"
                    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
                ),
                F.lit(-9223372036854775808),
            ),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    # Same event_id tiebreak as the flagged window (and the oracle): the
    # two windows must share ONE total order or tied (s_us, e_us) rows
    # can land in the wrong island.
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.expr(
            "sum(new_island) OVER (PARTITION BY user_id"
            " ORDER BY s_us, e_us, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e_us") - F.min("s_us")).alias("island_len")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_len").cast("long").alias("covered_us"),
    )


@query(
    "q_max_intersections",
    oracle=f"""
    WITH ival AS ({_DUCK_IVAL}),
    pts AS (
      SELECT user_id, s_us AS t, 1 AS delta, event_id FROM ival
      UNION ALL
      SELECT user_id, e_us AS t, -1 AS delta, event_id FROM ival
    ),
    running AS (
      SELECT user_id, t,
             sum(delta) OVER (
               PARTITION BY user_id ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
      FROM pts
    ),
    per_user AS (
      SELECT user_id, max(open_now) AS max_open
      FROM running GROUP BY user_id
    )
    SELECT p.user_id, CAST(p.max_open AS BIGINT) AS max_open,
           CAST(min(r.t) AS BIGINT) AS first_peak_us
    FROM per_user p JOIN running r
      ON p.user_id = r.user_id AND r.open_now = p.max_open
    GROUP BY p.user_id, p.max_open
    """,
)
def q_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` + ``maxIntersectionsPosition``
    parity: per user, the maximum number of simultaneously open event
    intervals and the earliest time it is reached. Sweep line: each
    interval emits (+1 at start, -1 at end); ends sort before starts at
    the same instant (half-open intervals), so ORDER BY (t, delta,
    event_id) is a deterministic total order; a user-partitioned
    running sum is the concurrency profile. Peak position joins back on
    (user, peak) and takes min(t) — all integer micros."""
    ival = load(spark, sf_dir, "events").select(*_spark_ival())
    pts = ival.select(
        "user_id", F.col("s_us").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        ival.select(
            "user_id", F.col("e_us").alias("t"), F.lit(-1).alias("delta"), "event_id"
        )
    )
    running = pts.select(
        "user_id",
        "t",
        F.expr(
            "sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("open_now"),
    )
    per_user = running.groupBy("user_id").agg(F.max("open_now").alias("max_open"))
    return (
        per_user.join(
            running.withColumnRenamed("user_id", "r_uid"),
            (F.col("user_id") == F.col("r_uid"))
            & (F.col("open_now") == F.col("max_open")),
        )
        .groupBy("user_id", "max_open")
        .agg(F.min("t").cast("long").alias("first_peak_us"))
        .select("user_id", F.col("max_open").cast("long").alias("max_open"), "first_peak_us")
    )


@query(
    "q_bounding_ratio",
    oracle="""
    WITH ordered AS (
      SELECT event_type, value, epoch_us(ts) AS t_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type,
           (max(CASE WHEN rn_d = 1 THEN value END)
            - max(CASE WHEN rn_a = 1 THEN value END))
           / (CAST(max(CASE WHEN rn_d = 1 THEN t_us END)
                   - max(CASE WHEN rn_a = 1 THEN t_us END) AS DOUBLE) / 1000000.0)
             AS bounding_ratio,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered GROUP BY event_type
    """,
)
def q_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio`` parity: per event type, the slope
    between the chronologically first and last (ts, value) points —
    (v_last - v_first) / seconds elapsed. First/last are picked by
    row_number with an (ts, event_id) total order (no min_by/max_by
    tie ambiguity); the subtraction and single division are IEEE ops
    over bit-identical doubles/integers, so the quotient needs no
    rounding to hash identically (numeric.py discipline)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", F.expr("unix_micros(ts)").alias("t_us"), "ts", "event_id"
    )
    ordered = ev.select(
        "event_type",
        "value",
        "t_us",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)"
        ).alias("rn_a"),
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)"
        ).alias("rn_d"),
    )
    return ordered.groupBy("event_type").agg(
        (
            (
                F.max(F.when(F.col("rn_d") == 1, F.col("value")))
                - F.max(F.when(F.col("rn_a") == 1, F.col("value")))
            )
            / (
                (
                    F.max(F.when(F.col("rn_d") == 1, F.col("t_us")))
                    - F.max(F.when(F.col("rn_a") == 1, F.col("t_us")))
                ).cast("double")
                / F.lit(1000000.0)
            )
        ).alias("bounding_ratio"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_rank_corr",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rv,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rt
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST((rv - rt) * (rv - rt) AS DECIMAL(38,0))) AS sumd2
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n,
           1.0 - (6.0 * (CASE WHEN sumd2 < 0 THEN -(CAST(abs(CAST(sumd2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(sumd2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(sumd2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(sumd2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) END))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
             AS spearman_rho
    FROM s
    """,
)
def q_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr`` parity: Spearman rank correlation
    between a value's magnitude rank and its time rank, per event type
    (is the metric drifting over time?). Both rankings use event_id
    tie-breaks, so ranks are distinct integers and the textbook
    1 - 6*sum(d^2)/(n(n^2-1)) formula applies exactly; d^2 accumulates
    in DECIMAL(38,0) (order-independent, overflow-proof at any scale),
    and the final expression is the same IEEE tree on both engines.
    Two event_type-partitioned window passes + a tiny agg."""
    ranked = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)"
        ).alias("rv"),
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)"
        ).alias("rt"),
    )
    # Spark row_number is INT (DuckDB's is BIGINT): widen the rank
    # difference to DECIMAL before squaring — int d^2 overflows 32 bits
    # from ~46k rows per group (caught by the sf1 differential under
    # ANSI mode), and decimal^2 stays exact at any group size.
    d = (F.col("rv") - F.col("rt")).cast("decimal(19,0)")
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).alias("sumd2"),
    )
    return s.select(
        "event_type",
        "n",
        (
            F.lit(1.0)
            - (F.lit(6.0) * F.expr(dcast("sumd2", "spark")))
            / (
                F.col("n").cast("double")
                * (F.col("n").cast("double") * F.col("n").cast("double") - F.lit(1.0))
            )
        ).alias("spearman_rho"),
    )


# Welch t-test: values quantized to integer milli-units (the
# definition, stated identically on both sides); sums of squares in
# DECIMAL(38,0) so no scale overflows int64.
_VM = "CAST(floor(value * 1000 + 0.5) AS BIGINT)"


@query(
    "q_welch_ttest",
    oracle=f"""
    WITH q AS (
      SELECT user_id % 2 AS cohort, {_VM} AS vm FROM events
    ),
    s AS (
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s1,
             sum(CAST(vm AS DECIMAL(19,0)) * CAST(vm AS DECIMAL(19,0))) AS s2
      FROM q GROUP BY cohort
    ),
    m AS (
      SELECT cohort, n,
             CAST(s1 AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE) AS mean,
             ((CASE WHEN s2 < 0 THEN -(CAST(abs(CAST(s2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(s2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(s2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(s2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) END)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / 1000000.0 / (CAST(n AS DOUBLE) - 1.0) AS var
      FROM s
    )
    SELECT a.n AS n0, b.n AS n1, a.mean - b.mean AS mean_diff,
           (a.mean - b.mean)
             / sqrt(a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
             AS t_stat,
           (a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
           * (a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
           / ((a.var / CAST(a.n AS DOUBLE)) * (a.var / CAST(a.n AS DOUBLE))
                / (CAST(a.n AS DOUBLE) - 1.0)
              + (b.var / CAST(b.n AS DOUBLE)) * (b.var / CAST(b.n AS DOUBLE))
                / (CAST(b.n AS DOUBLE) - 1.0)) AS welch_df
    FROM (SELECT * FROM m WHERE cohort = 0) a
    CROSS JOIN (SELECT * FROM m WHERE cohort = 1) b
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest`` parity: Welch's unequal-variance
    t-statistic and degrees of freedom comparing ``value`` between the
    even and odd user cohorts. Values quantize to integer milli-units
    first (both engines state the same floor(v*1000+0.5)); count/sum/
    sum-of-squares are exact integers/decimals; mean, variance, t and
    the Welch-Satterthwaite df are then identical IEEE expression
    trees, so the doubles hash bit-for-bit with no rounding. One
    map-side-combined aggregation over the fact table; the finish is a
    1-row x 1-row cross join."""
    q = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("cohort"), F.expr(_VM).alias("vm")
    )
    s = q.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").cast("long").alias("s1"),
        F.sum(F.col("vm").cast("decimal(19,0)") * F.col("vm").cast("decimal(19,0)")).alias("s2"),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "cohort",
        "n",
        (F.col("s1").cast("double") / F.lit(1000.0) / nD).alias("mean"),
        (
            (
                F.expr(dcast("s2", "spark"))
                - F.col("s1").cast("double") * F.col("s1").cast("double") / nD
            )
            / F.lit(1000000.0)
            / (nD - F.lit(1.0))
        ).alias("var"),
    )
    a = m.filter(F.col("cohort") == 0).select(
        F.col("n").alias("n0"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = m.filter(F.col("cohort") == 1).select(
        F.col("n").alias("n1"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    j = a.crossJoin(b)
    se_a = F.col("var_a") / F.col("n0").cast("double")
    se_b = F.col("var_b") / F.col("n1").cast("double")
    return j.select(
        "n0",
        "n1",
        (F.col("mean_a") - F.col("mean_b")).alias("mean_diff"),
        ((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se_a + se_b)).alias("t_stat"),
        (
            (se_a + se_b)
            * (se_a + se_b)
            / (
                se_a * se_a / (F.col("n0").cast("double") - F.lit(1.0))
                + se_b * se_b / (F.col("n1").cast("double") - F.lit(1.0))
            )
        ).alias("welch_df"),
    )


_ENTROPY_ORACLE = """
    WITH counts AS (
      SELECT user_id % 10 AS cohort, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT cohort, CAST(sum(c) AS BIGINT) AS total FROM counts GROUP BY cohort
    ),
    terms AS (
      SELECT c.cohort, t.total,
             c.c * CAST(floor(ln(CAST(c.c AS DOUBLE) / CAST(t.total AS DOUBLE)) * 1e9)
                        AS BIGINT) AS term
      FROM counts c JOIN tot t ON c.cohort = t.cohort
    )
    SELECT cohort, CAST(max(total) AS BIGINT) AS n_events,
           -(CASE WHEN sum(term) < 0 THEN -(CAST(abs(CAST(sum(term) AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(sum(term) AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(sum(term) AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(sum(term) AS HUGEINT)) % 1099511627776 AS DOUBLE)) END) / (CAST(max(total) AS DOUBLE) * 1e9)
             AS entropy_nats
    FROM terms GROUP BY cohort
    """


@query("q_entropy", oracle=_ENTROPY_ORACLE)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy`` parity: Shannon entropy (nats) of the
    event-type distribution within each user-id cohort. ln is not
    correctly rounded across Java Math.log and libm (quality_ext.py
    caveat), so each ln(p) quantizes to integer NANO-units before the
    weighted integer sum — both engines then divide the identical
    bigint by total*1e9 once. Two hash aggregations, a broadcast-sized
    cohort-total join, no windows."""
    counts = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 10).alias("cohort"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.groupBy("cohort").agg(F.sum("c").cast("long").alias("total"))
    terms = counts.join(F.broadcast(tot), "cohort").select(
        "cohort",
        "total",
        (
            F.col("c")
            * F.floor(
                F.log(F.col("c").cast("double") / F.col("total").cast("double"))
                * F.lit(1e9)
            ).cast("long")
        ).alias("term"),
    )
    st = terms.groupBy("cohort").agg(
        F.max("total").cast("long").alias("n_events"),
        F.sum(F.col("term").cast("decimal(38,0)")).alias("s_term"),
    )
    return st.select(
        "cohort",
        "n_events",
        (
            -F.expr(dcast("s_term", "spark"))
            / (F.col("n_events").cast("double") * F.lit(1e9))
        ).alias("entropy_nats"),
    )


@query(
    "q_sequence_next_node",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS nxt1,
             lead(event_type, 2) OVER w AS nxt2,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
      SELECT user_id, nxt2, rn,
             row_number() OVER (PARTITION BY user_id ORDER BY rn) AS hit_no
      FROM seq WHERE event_type = 'view' AND nxt1 = 'click'
    )
    SELECT coalesce(nxt2, '(end)') AS next_node,
           CAST(count(*) AS BIGINT) AS n_users
    FROM matches WHERE hit_no = 1
    GROUP BY 1
    """,
)
def q_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode(forward, first_match)`` parity:
    for each user, the event that immediately follows the FIRST
    adjacent 'view' -> 'click' pair in their timeline, with '(end)'
    when the match closes the timeline; output is the distribution of
    next nodes. One user-partitioned window builds (event, next, next2)
    triples; the first match per user is a second partitioned
    row_number; the finish is a tiny hash agg on the next node."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("nxt1"),
        F.expr(
            "lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("nxt2"),
        F.expr(
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("rn"),
    )
    matches = (
        seq.filter((F.col("event_type") == "view") & (F.col("nxt1") == "click"))
        .select(
            "user_id",
            "nxt2",
            F.expr("row_number() OVER (PARTITION BY user_id ORDER BY rn)").alias(
                "hit_no"
            ),
        )
        .filter(F.col("hit_no") == 1)
    )
    return matches.groupBy(
        F.coalesce(F.col("nxt2"), F.lit("(end)")).alias("next_node")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------
# Batch 4: quantileExactWeighted, groupArrayMovingSum/-Avg, minMap /
# maxMap, studentTTest, uniqUpTo, windowFunnel(strict_order)
# ---------------------------------------------------------------------


@query(
    "q_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS wt,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS total
      FROM lineitem
    )
    SELECT l_returnflag,
           min(CASE WHEN 2 * cumw >= total THEN v END) AS weighted_median,
           CAST(max(total) AS BIGINT) AS total_weight
    FROM w GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5)`` parity: the
    quantity-weighted median extended price per return flag — the
    smallest value whose cumulative weight reaches half the total.
    Weights are integral (exact bigint cumsum); the median is one of
    the input doubles verbatim, so no float arithmetic happens at all.
    One returnflag-partitioned window (3 partitions here, any number at
    scale) + a tiny agg."""
    w = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
        F.expr(
            "sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag"
            " ORDER BY l_extendedprice, l_orderkey, l_linenumber"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("cumw"),
        F.expr(
            "sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag)"
        ).alias("total"),
    )
    return w.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("total"), F.col("v"))).alias(
            "weighted_median"
        ),
        F.max("total").cast("long").alias("total_weight"),
    )


@query(
    "q_moving_sum",
    oracle="""
    WITH w AS (
      SELECT user_id,
             sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
      WHERE user_id < 100
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(ms) AS DOUBLE) AS total_mov_sum,
           CAST(max(ms) AS DOUBLE) AS max_mov_sum,
           CAST(arg_max(ms, rn) AS DOUBLE) AS last_mov_sum,
           CAST(sum(ms * (6 // least(rn, 3))) AS DOUBLE) AS total_mov_avg6
    FROM w GROUP BY user_id
    """,
)
def q_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(3)`` / ``groupArrayMovingAvg``
    parity: per user, the trailing-3-event moving sum and average of
    ``value`` along the time order, finished as ONE aggregate row per
    user (round-7 result-cap fix: ≤100 rows at every SF — the per-
    event unnested form scaled with events-per-user and bought no
    extra checking power). Every frame value still flows through the
    checksums: count, exact-decimal sum/max of the frame sums, the
    arg-max-by-rn last frame value, and 6× the sum of the moving
    averages — the divisor least(rn,3) ∈ {1,2,3} always divides 6, so
    ms·(6 div least(rn,3)) keeps the average checksum in EXACT decimal
    (no double division anywhere). Values cast to DECIMAL(18,2) BEFORE
    the frame sum; one user-partitioned window, no global sort."""
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
    )
    w = load(spark, sf_dir, "events").filter(F.col("user_id") < 100).select(
        "user_id",
        F.expr(f"sum(CAST(value AS DECIMAL(18,2))) {frame}").alias("ms"),
        F.expr(
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("rn"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(sum(ms) AS DOUBLE)").alias("total_mov_sum"),
        F.expr("CAST(max(ms) AS DOUBLE)").alias("max_mov_sum"),
        F.expr("CAST(max_by(ms, rn) AS DOUBLE)").alias("last_mov_sum"),
        F.expr("CAST(sum(ms * (6 div least(rn, 3))) AS DOUBLE)").alias(
            "total_mov_avg6"
        ),
    )


@query(
    "q_min_max_map",
    oracle="""
    WITH per AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(min(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS mn,
             CAST(max(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           string_agg(event_type, ',' ORDER BY event_type) AS type_keys,
           string_agg(mn, ',' ORDER BY event_type) AS type_mins,
           string_agg(mx, ',' ORDER BY event_type) AS type_maxs
    FROM per GROUP BY day
    """,
)
def q_min_max_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap`` parity: per day, the
    event-type -> min/max value maps as sorted parallel arrays
    (serialized to comma strings at the driver boundary, the q_sum_map
    convention). Values stringify through DECIMAL(18,2) so both engines
    render identical text ('5.00', never '5.0' vs '5'). Same two-level
    aggregation shape as sum_map: wide partials at (day, type), tiny
    per-day assembly."""
    per = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.min(F.col("value").cast("decimal(18,2)")).cast("string").alias("mn"),
            F.max(F.col("value").cast("decimal(18,2)")).cast("string").alias("mx"),
        )
    )
    assembled = per.groupBy("day").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "mn", "mx"))).alias("kv")
    )
    return assembled.select(
        "day",
        F.array_join(F.transform("kv", lambda x: x["event_type"]), ",").alias(
            "type_keys"
        ),
        F.array_join(F.transform("kv", lambda x: x["mn"]), ",").alias("type_mins"),
        F.array_join(F.transform("kv", lambda x: x["mx"]), ",").alias("type_maxs"),
    )


@query(
    "q_student_ttest",
    oracle=f"""
    WITH q AS (
      SELECT user_id % 2 AS cohort, {_VM} AS vm FROM events
    ),
    s AS (
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s1,
             sum(CAST(vm AS DECIMAL(19,0)) * CAST(vm AS DECIMAL(19,0))) AS s2
      FROM q GROUP BY cohort
    ),
    m AS (
      SELECT cohort, n,
             CAST(s1 AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE) AS mean,
             ((CASE WHEN s2 < 0 THEN -(CAST(abs(CAST(s2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(s2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(s2 AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(s2 AS HUGEINT)) % 1099511627776 AS DOUBLE)) END)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / 1000000.0 / (CAST(n AS DOUBLE) - 1.0) AS var
      FROM s
    )
    SELECT a.n AS n0, b.n AS n1,
           CAST(a.n + b.n - 2 AS BIGINT) AS df,
           (a.mean - b.mean)
             / sqrt(((CAST(a.n AS DOUBLE) - 1.0) * a.var
                     + (CAST(b.n AS DOUBLE) - 1.0) * b.var)
                    / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE) - 2.0)
                    * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE)))
             AS t_stat
    FROM (SELECT * FROM m WHERE cohort = 0) a
    CROSS JOIN (SELECT * FROM m WHERE cohort = 1) b
    """,
)
def q_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest`` parity: the pooled-variance
    two-sample t statistic over the same milli-quantized cohorts as
    q_welch_ttest (shared _VM definition — the two tests can never
    diverge in their input quantization). Identical IEEE expression
    trees on both engines; df is the exact integer n0+n1-2."""
    q = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("cohort"), F.expr(_VM).alias("vm")
    )
    s = q.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").cast("long").alias("s1"),
        F.sum(
            F.col("vm").cast("decimal(19,0)") * F.col("vm").cast("decimal(19,0)")
        ).alias("s2"),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "cohort",
        "n",
        (F.col("s1").cast("double") / F.lit(1000.0) / nD).alias("mean"),
        (
            (
                F.expr(dcast("s2", "spark"))
                - F.col("s1").cast("double") * F.col("s1").cast("double") / nD
            )
            / F.lit(1000000.0)
            / (nD - F.lit(1.0))
        ).alias("var"),
    )
    a = m.filter(F.col("cohort") == 0).select(
        F.col("n").alias("n0"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = m.filter(F.col("cohort") == 1).select(
        F.col("n").alias("n1"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    j = a.crossJoin(b)
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    pooled = ((n0d - F.lit(1.0)) * F.col("var_a") + (n1d - F.lit(1.0)) * F.col("var_b")) / (
        n0d + n1d - F.lit(2.0)
    )
    return j.select(
        "n0",
        "n1",
        (F.col("n0") + F.col("n1") - 2).cast("long").alias("df"),
        (
            (F.col("mean_a") - F.col("mean_b"))
            / F.sqrt(pooled * (F.lit(1.0) / n0d + F.lit(1.0) / n1d))
        ).alias("t_stat"),
    )


_UNIQ_CAP = 20


@query(
    "q_uniq_up_to",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(least(count(DISTINCT user_id), {_UNIQ_CAP + 1}) AS BIGINT)
             AS uniq_up_to,
           count(DISTINCT user_id) <= {_UNIQ_CAP} AS is_exact
    FROM events GROUP BY 1, 2
    """,
)
def q_uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)`` parity: per (day, event_type), the
    exact distinct-user count while it is <= N, else the sentinel N+1
    ('more than N') — the bounded-memory distinct counter used for
    'show exact numbers until they stop being interesting'. At scale
    the partial state is at most N+1 ids per group by construction.
    Both the capped count and the exactness flag are checked; the test
    data exercises both branches (small type-days stay exact, big ones
    cap)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.least(
                F.countDistinct("user_id"), F.lit(_UNIQ_CAP + 1)
            )
            .cast("long")
            .alias("uniq_up_to"),
            (F.countDistinct("user_id") <= _UNIQ_CAP).alias("is_exact"),
        )
    )


@query(
    "q_window_funnel_strict",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    lv AS (
      SELECT CASE WHEN seq LIKE '%vcp%' THEN 3
                  WHEN seq LIKE '%vc%' THEN 2
                  WHEN seq LIKE '%v%' THEN 1
                  ELSE 0 END AS strict_level
      FROM seqs
    )
    SELECT strict_level, CAST(count(*) AS BIGINT) AS n_users
    FROM lv GROUP BY strict_level
    """,
)
def q_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(strict_order)`` parity (order
    semantics; window = infinity, documented simplification): in
    strict_order mode ANY intervening event breaks the chain, so a
    level-k match is a CONTIGUOUS run of the first k chain letters in
    the user's time-ordered event string — substring search on the
    same per-user sequence q_sequence_match builds (funnels.
    user_event_seq, one hash aggregation, shared so the two operators
    cannot drift in their sequence encoding)."""
    from kafka_clickhouse_implementation_spark.operators.funnels import user_event_seq

    seqs = user_event_seq(load(spark, sf_dir, "events"))
    lv = seqs.select(
        F.expr(
            "CASE WHEN seq LIKE '%vcp%' THEN 3"
            " WHEN seq LIKE '%vc%' THEN 2"
            " WHEN seq LIKE '%v%' THEN 1"
            " ELSE 0 END"
        ).alias("strict_level")
    )
    return lv.groupBy("strict_level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_ip_funcs",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events WHERE user_id < 100
    ), ip AS (
      SELECT user_id,
             (user_id * 2654435761) % 4294967296 AS ip_num
      FROM u
    )
    SELECT user_id, CAST(ip_num AS BIGINT) AS ip_num,
           CAST(ip_num // 16777216 AS VARCHAR) || '.' ||
           CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
           CAST((ip_num // 256) % 256 AS VARCHAR) || '.' ||
           CAST(ip_num % 256 AS VARCHAR) AS ip_str,
           CAST((ip_num // 16777216) * 16777216
                + ((ip_num // 65536) % 256) * 65536
                + ((ip_num // 256) % 256) * 256
                + ip_num % 256 AS BIGINT) AS roundtrip_num,
           ip_num // 16777216 = 10 AS in_10_slash_8,
           CAST(ip_num // 16777216 AS VARCHAR) || '.' ||
           CAST((ip_num // 65536) % 256 AS VARCHAR) || '.' ||
           CAST((ip_num // 256) % 256 AS VARCHAR) || '.0/24' AS net_24
    FROM ip
    """,
)
def q_ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IP-function family parity (``IPv4NumToString``,
    ``IPv4StringToNum``, CIDR membership, network truncation):
    deterministic synthetic IPv4s from user_id arithmetic (a Knuth
    multiplicative hash mod 2^32, restated identically in the oracle),
    rendered to dotted-quad, parsed back (round-trip pinned), tested
    against 10.0.0.0/8, and truncated to the /24 network. Pure integer
    div/mod and string concatenation — whole-stage codegen, no
    shuffles beyond the distinct."""
    u = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select("user_id")
        .distinct()
    )
    ip = u.select(
        "user_id",
        ((F.col("user_id") * 2654435761) % 4294967296).alias("ip_num"),
    )
    o1 = F.expr("ip_num div 16777216")
    o2 = F.expr("(ip_num div 65536) % 256")
    o3 = F.expr("(ip_num div 256) % 256")
    o4 = F.expr("ip_num % 256")
    dq = F.concat_ws(
        ".",
        o1.cast("string"),
        o2.cast("string"),
        o3.cast("string"),
        o4.cast("string"),
    )
    return ip.select(
        "user_id",
        F.col("ip_num").cast("long").alias("ip_num"),
        dq.alias("ip_str"),
        (o1 * 16777216 + o2 * 65536 + o3 * 256 + o4).cast("long").alias(
            "roundtrip_num"
        ),
        (o1 == 10).alias("in_10_slash_8"),
        F.concat(
            F.concat_ws(".", o1.cast("string"), o2.cast("string"), o3.cast("string")),
            F.lit(".0/24"),
        ).alias("net_24"),
    )


@query(
    "q_cramers_v",
    # Contingency stats over exact integer counts. Every per-cell
    # double term (chi2 contribution, ln entropy term) quantizes to an
    # INTEGER before summing — double sums are accumulation-order-
    # dependent and flipped a hash between two correct runs of the
    # first draft of this query; integer sums are associative. The
    # final divisions/sqrt are single IEEE ops over bit-identical
    # inputs.
    oracle="""
    WITH cells AS (
      SELECT user_id % 5 AS r, event_type AS c,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ), rowm AS (
      SELECT r, CAST(sum(o) AS BIGINT) AS row_n FROM cells GROUP BY r
    ), colm AS (
      SELECT c, CAST(sum(o) AS BIGINT) AS col_n FROM cells GROUP BY c
    ), tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
    ), terms AS (
      SELECT o, row_n, col_n, n,
             CAST(floor(
               (CAST(o AS DOUBLE)
                - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
               * 1e12) AS BIGINT) AS chi_q,
             o * CAST(floor(ln(CAST(o AS DOUBLE) / CAST(col_n AS DOUBLE)) * 1e9)
                      AS BIGINT) AS hrc_q
      FROM cells JOIN rowm USING (r) JOIN colm USING (c) CROSS JOIN tot
    ), chi AS (
      SELECT max(n) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM rowm) AS nr,
             (SELECT CAST(count(*) AS BIGINT) FROM colm) AS nc,
             CAST(sum(chi_q) AS BIGINT) AS chi2_acc,
             CAST(sum(hrc_q) AS BIGINT) AS h_rc_acc
      FROM terms
    ), hr AS (
      SELECT CAST(sum(row_n * CAST(floor(ln(CAST(row_n AS DOUBLE) / CAST(n AS DOUBLE))
                                         * 1e9) AS BIGINT)) AS BIGINT) AS h_r_acc
      FROM rowm CROSS JOIN tot
    )
    SELECT chi.n, CAST(chi.chi2_acc AS DOUBLE) / 1e12 AS chi2,
           sqrt((CAST(chi.chi2_acc AS DOUBLE) / 1e12)
                / (CAST(chi.n AS DOUBLE)
                   * CAST(least(chi.nr - 1, chi.nc - 1) AS DOUBLE)))
             AS cramers_v,
           (CAST(-hr.h_r_acc AS DOUBLE) - CAST(-chi.h_rc_acc AS DOUBLE))
             / CAST(-hr.h_r_acc AS DOUBLE) AS theils_u
    FROM chi CROSS JOIN hr
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV`` + ``theilsU`` parity: association
    strength between the user-id residue class (5 rows) and event type
    (5 columns). The contingency table comes from ONE wide hash
    aggregation; margins are two tiny groupBys broadcast back (no
    global windows — a bare OVER () would single-task the cell table);
    each chi-squared contribution quantizes to integer pico-units and
    each ln entropy term to nano-units before the sums, making every
    emitted double bit-identical across engines AND across Spark's own
    accumulation orders."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 5).alias("r"), F.col("event_type").alias("c"))
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint()  # 25 rows; reused by four branches below
    )
    rowm = cells.groupBy("r").agg(F.sum("o").cast("long").alias("row_n"))
    colm = cells.groupBy("c").agg(F.sum("o").cast("long").alias("col_n"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    joined = (
        cells.join(F.broadcast(rowm), "r")
        .join(F.broadcast(colm), "c")
        .crossJoin(F.broadcast(tot))
    )
    e = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )
    terms = joined.select(
        "o",
        "row_n",
        "col_n",
        "n",
        F.floor(
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
            * F.lit(1e12)
        )
        .cast("long")
        .alias("chi_q"),
        (
            F.col("o")
            * F.floor(
                F.log(F.col("o").cast("double") / F.col("col_n").cast("double"))
                * F.lit(1e9)
            ).cast("long")
        ).alias("hrc_q"),
    )
    chi = terms.agg(
        F.max("n").alias("n"),
        F.sum("chi_q").cast("long").alias("chi2_acc"),
        F.sum("hrc_q").cast("long").alias("h_rc_acc"),
    )
    nr = rowm.agg(F.count(F.lit(1)).alias("nr"))
    nc = colm.agg(F.count(F.lit(1)).alias("nc"))
    hr = (
        rowm.crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("row_n")
                * F.floor(
                    F.log(F.col("row_n").cast("double") / F.col("n").cast("double"))
                    * F.lit(1e9)
                ).cast("long")
            ).alias("hr_q")
        )
        .agg(F.sum("hr_q").cast("long").alias("h_r_acc"))
    )
    j = (
        chi.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(hr))
    )
    return j.select(
        "n",
        (F.col("chi2_acc").cast("double") / F.lit(1e12)).alias("chi2"),
        F.sqrt(
            (F.col("chi2_acc").cast("double") / F.lit(1e12))
            / (
                F.col("n").cast("double")
                * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
            )
        ).alias("cramers_v"),
        (
            ((-F.col("h_r_acc")).cast("double") - (-F.col("h_rc_acc")).cast("double"))
            / (-F.col("h_r_acc")).cast("double")
        ).alias("theils_u"),
    )


# LTTB geometry: NB middle buckets + the always-kept first and last
# points. Requires every middle bucket non-empty (holds whenever each
# series has >= ~3*NB points; events has >= 1k rows per type at the
# smallest test scale).
LTTB_NB = 12


@query(
    "q_lttb",
    # The sequential choose-then-advance dependency is a recursive CTE
    # over the bucket index: step b joins the bucket-(b+1) candidates
    # with the point selected at step b and the PRE-AGGREGATED sums of
    # bucket b+2 (the "third point" centroid, denominator cleared so
    # the triangle-area comparison is exact integer DECIMAL — no
    # floats anywhere). max(struct(area, -x, -event_id, ...)) is the
    # deterministic argmax.
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT event_type, epoch_us(ts) // 1000000 AS x,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS y,
             event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) - 1 AS idx,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    mid AS (
      SELECT event_type, x, y, event_id,
             ((idx - 1) * {LTTB_NB}) // (n - 2) AS b
      FROM pts WHERE idx > 0 AND idx < n - 1
    ),
    nxt AS (
      SELECT event_type, b - 1 AS b, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS cnt
      FROM mid GROUP BY event_type, b
      UNION ALL
      SELECT event_type, {LTTB_NB - 1}, x, y, 1 FROM pts WHERE idx = n - 1
    ),
    sel(event_type, b, x, y) AS (
      SELECT event_type, CAST(-1 AS BIGINT), x, y FROM pts WHERE idx = 0
      UNION ALL
      SELECT c.event_type, c.b, c.pick.x, c.pick.y FROM (
        SELECT m.event_type, m.b,
               max(struct_pack(
                 a := CAST(abs(
                   CAST(m.x - s.x AS DECIMAL(18,0))
                     * CAST(nx.sy - nx.cnt * s.y AS DECIMAL(18,0))
                   - CAST(nx.sx - nx.cnt * s.x AS DECIMAL(18,0))
                     * CAST(m.y - s.y AS DECIMAL(18,0))
                 ) AS DECIMAL(37,0)),
                 nx2 := -m.x, ne := -m.event_id, x := m.x, y := m.y)) AS pick
        FROM sel s
        JOIN mid m ON m.event_type = s.event_type AND m.b = s.b + 1
        JOIN nxt nx ON nx.event_type = m.event_type AND nx.b = m.b
        GROUP BY m.event_type, m.b
      ) c
    )
    SELECT event_type, CAST(b + 1 AS INT) AS seq,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM sel
    UNION ALL
    SELECT event_type, CAST({LTTB_NB + 1} AS INT), x, y
    FROM pts WHERE idx = n - 1
    """,
)
def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets`` parity — the
    dashboard downsampler (keep the visually dominant point per
    bucket): each event_type's (second, milli-value) series reduces to
    NB+2 points — first, last, and per middle bucket the point whose
    triangle with the previously SELECTED point and the NEXT bucket's
    centroid has maximal area. The centroid denominator is multiplied
    through, so the whole argmax runs in exact integer arithmetic
    (Python ints / DECIMAL) — bit-equal to the recursive DuckDB
    oracle. Spark side: the choose-then-advance loop is inherently
    sequential PER SERIES, so it runs as a grouped-map applyInPandas
    (one task per series, thousands of series in parallel at scale;
    state = one series, same contract as the UDAF tier)."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("x"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("y"),
        "event_id",
        "ts",
    )

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        et = pdf["event_type"].iloc[0]
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        eids = [int(v) for v in pdf["event_id"]]
        n = len(xs)
        nb = LTTB_NB
        if n < nb + 2:
            # Shorter than first + last + one interior point per bucket:
            # some middle bucket would be empty and the argmax below has
            # no candidate. Fail loudly with the series identity instead
            # of an opaque TypeError (round-6 ADVICE fix).
            raise ValueError(
                f"LTTB series {et!r} has {n} points; needs >= {nb + 2} "
                f"for {nb} buckets — lower LTTB_NB or pre-aggregate"
            )
        buckets: list[list[int]] = [[] for _ in range(nb)]
        for i in range(1, n - 1):
            buckets[((i - 1) * nb) // (n - 2)].append(i)
        out = [(0, xs[0], ys[0])]
        px, py = xs[0], ys[0]
        for b in range(nb):
            if b < nb - 1:
                nxt_idx = buckets[b + 1]
                sx = sum(xs[i] for i in nxt_idx)
                sy = sum(ys[i] for i in nxt_idx)
                cnt = len(nxt_idx)
            else:
                sx, sy, cnt = xs[n - 1], ys[n - 1], 1
            best = None
            for i in buckets[b]:
                a = abs(
                    (xs[i] - px) * (sy - cnt * py) - (sx - cnt * px) * (ys[i] - py)
                )
                key = (a, -xs[i], -eids[i])
                if best is None or key > best[0]:
                    best = (key, i)
            i = best[1]
            out.append((b + 1, xs[i], ys[i]))
            px, py = xs[i], ys[i]
        out.append((nb + 1, xs[n - 1], ys[n - 1]))
        return pd.DataFrame(
            {
                "event_type": [et] * len(out),
                "seq": [o[0] for o in out],
                "x": [o[1] for o in out],
                "y": [o[2] for o in out],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        lttb, schema="event_type string, seq int, x long, y long"
    )


@query(
    "q_window_range_frame",
    oracle="""
    WITH w AS (
      SELECT user_id,
             sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hs,
             count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hc
      FROM events
      WHERE user_id < 100
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(hs) AS DOUBLE) AS total_hour_sum,
           CAST(max(hs) AS DOUBLE) AS max_hour_sum,
           CAST(sum(hc) AS BIGINT) AS total_hour_cnt,
           CAST(max(hc) AS BIGINT) AS max_hour_cnt
    FROM w GROUP BY user_id
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window parity (every other window in the repo uses
    ROWS frames): per user, the trailing-ONE-HOUR sum and count of
    ``value`` — the frame boundary is a VALUE offset on the epoch-
    second ordering, so timestamp ties are frame-peers on both engines
    (a rows frame would order-split them). The sum accumulates in
    DECIMAL(18,2) (exact under any within-frame order). Finished as
    ONE aggregate row per user (round-7 result-cap fix: ≤100 rows at
    every SF); every frame value still flows through the exact
    decimal/integer checksums. One user-partitioned window shuffle."""
    frame = (
        "OVER (PARTITION BY user_id ORDER BY unix_micros(ts) div 1000000"
        " RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
    )
    w = load(spark, sf_dir, "events").filter(F.col("user_id") < 100).select(
        "user_id",
        F.expr(f"sum(CAST(value AS DECIMAL(18,2))) {frame}").alias("hs"),
        F.expr(f"count(*) {frame}").alias("hc"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(sum(hs) AS DOUBLE)").alias("total_hour_sum"),
        F.expr("CAST(max(hs) AS DOUBLE)").alias("max_hour_sum"),
        F.sum("hc").cast("long").alias("total_hour_cnt"),
        F.max("hc").cast("long").alias("max_hour_cnt"),
    )


@query(
    "q_window_funnel_dedup",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    lv AS (
      SELECT CASE WHEN regexp_matches(seq, 'v[^v]*c[^vc]*p') THEN 3
                  WHEN regexp_matches(seq, 'v[^v]*c') THEN 2
                  WHEN regexp_matches(seq, 'v') THEN 1
                  ELSE 0 END AS dedup_level
      FROM seqs
    )
    SELECT dedup_level, CAST(count(*) AS BIGINT) AS n_users
    FROM lv GROUP BY dedup_level
    """,
)
def q_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(strict_deduplication)`` parity (order
    semantics; window = infinity, as for C80's strict_order twin): a
    repeat of an ALREADY-MATCHED chain event between stages interrupts
    that attempt — but a later attempt may start at the repeat, which
    is exactly regex search semantics over the per-user letter string:
    level k holds iff 'v[^v]*c[^vc]*p' (prefix-truncated for k<3)
    matches anywhere. Shares funnels.user_event_seq with
    q_sequence_match and q_window_funnel_strict, so the three funnel
    modes can never drift in their sequence encoding."""
    from kafka_clickhouse_implementation_spark.operators.funnels import user_event_seq

    seqs = user_event_seq(load(spark, sf_dir, "events"))
    lv = seqs.select(
        F.when(F.col("seq").rlike("v[^v]*c[^vc]*p"), 3)
        .when(F.col("seq").rlike("v[^v]*c"), 2)
        .when(F.col("seq").rlike("v"), 1)
        .otherwise(0)
        .alias("dedup_level")
    )
    return lv.groupBy("dedup_level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_gap_fill_interpolate",
    # Linear interpolation with an EXACT integer numerator: the
    # interpolated value is (vp*(n-k) + vn*k) / n where vp/vn are
    # integer cent sums and k/n integer day offsets — one IEEE
    # division over identical integers on both engines.
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('purchase', 'signup')
      GROUP BY 1, 2
    ),
    axis AS (
      SELECT et.event_type, d.day
      FROM (SELECT DISTINCT event_type FROM counts) et
      CROSS JOIN (SELECT unnest(generate_series(DATE '2024-01-01',
                                                DATE '2024-02-29',
                                                INTERVAL 1 DAY))::DATE AS day) d
    ),
    joined AS (
      SELECT a.event_type, a.day, c.cents,
             CASE WHEN c.cents IS NOT NULL THEN a.day END AS known_day
      FROM axis a LEFT JOIN counts c USING (event_type, day)
    ),
    bounds AS (
      SELECT event_type, day, cents,
             last_value(cents IGNORE NULLS) OVER w_a AS vp,
             last_value(known_day IGNORE NULLS) OVER w_a AS dp,
             first_value(cents IGNORE NULLS) OVER w_b AS vn,
             first_value(known_day IGNORE NULLS) OVER w_b AS dn
      FROM joined
      WINDOW w_a AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_b AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           CASE
             WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
             WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
               CAST(vp * (date_diff('day', day, dn))
                    + vn * (date_diff('day', dp, day)) AS DOUBLE)
               / CAST(date_diff('day', dp, dn) AS DOUBLE)
             WHEN vp IS NOT NULL THEN CAST(vp AS DOUBLE)
             WHEN vn IS NOT NULL THEN CAST(vn AS DOUBLE)
           END AS cents_interp,
           cents IS NOT NULL AS observed
    FROM bounds
    """,
)
def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL ... INTERPOLATE`` parity:
    per event type, a dense daily axis where missing days get the
    LINEAR interpolation between the neighboring observed days (and
    boundary days clamp to the nearest observation). Values are
    integer cent sums, so the interpolation numerator is exact and the
    single division is bit-identical cross-engine. Both forward and
    backward scans are event_type-partitioned windows with IGNORE
    NULLS last/first_value — no bare window, no second scan of the
    fact table (the axis join is broadcast)."""
    counts = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-02-29").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    axis = counts.select("event_type").distinct().crossJoin(F.broadcast(days))
    joined = axis.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        "cents",
        F.when(F.col("cents").isNotNull(), F.col("day")).alias("known_day"),
    )
    w_a = (
        "OVER (PARTITION BY event_type ORDER BY day"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    w_b = (
        "OVER (PARTITION BY event_type ORDER BY day"
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    bounds = joined.selectExpr(
        "event_type",
        "day",
        "cents",
        f"last(cents, true) {w_a} AS vp",
        f"last(known_day, true) {w_a} AS dp",
        f"first(cents, true) {w_b} AS vn",
        f"first(known_day, true) {w_b} AS dn",
    )
    return bounds.selectExpr(
        "event_type",
        "day",
        """CASE
             WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
             WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
               CAST(vp * datediff(dn, day) + vn * datediff(day, dp) AS DOUBLE)
               / CAST(datediff(dn, dp) AS DOUBLE)
             WHEN vp IS NOT NULL THEN CAST(vp AS DOUBLE)
             WHEN vn IS NOT NULL THEN CAST(vn AS DOUBLE)
           END AS cents_interp""",
        "cents IS NOT NULL AS observed",
    )


@query(
    "q_select_modifiers",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS p_name,
           p_size, p_retailprice,
           CAST(length(p_name) AS BIGINT) AS p_name_len,
           CAST(length(p_brand) AS BIGINT) AS p_brand_len,
           CAST(length(p_type) AS BIGINT) AS p_type_len
    FROM part
    """,
)
def q_select_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse SELECT-modifier parity over ``part`` —
    ``* EXCEPT (p_brand, p_type) REPLACE (upper(p_name) AS p_name)``
    plus ``APPLY (length)`` over the string columns (applied BEFORE
    the REPLACE, as ClickHouse evaluates APPLY against the original
    expressions): pure projection rewrites discovered from the SCHEMA
    (drop / withColumn / derived columns), which Catalyst collapses
    into the scan's ReadSchema at zero cost."""
    part = load(spark, sf_dir, "part")
    string_cols = [
        f.name for f in part.schema.fields if f.dataType.simpleString() == "string"
    ]
    out = part
    for c in string_cols:
        out = out.withColumn(f"{c}_len", F.length(F.col(c)).cast("long"))
    out = out.withColumn("p_name", F.upper(F.col("p_name")))
    out = out.drop("p_brand", "p_type")
    return out.select(
        "p_partkey", "p_name", "p_size", "p_retailprice",
        "p_name_len", "p_brand_len", "p_type_len",
    )
