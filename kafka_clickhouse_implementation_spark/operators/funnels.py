"""Tier C extension — ClickHouse-style behavioral analytics over the
event stream: funnel levels (``windowFunnel``), cohort retention
(``retention``), ordered-sequence matching (``sequenceMatch``), per-day
type breakdowns (``sumMap``), and top event paths.

The reference's dashboard tier (kafka+clickhouse.md:221-243) stops at
daily GROUP-BY counts; these are the next queries a campaign-analytics
user of that stack reaches for, and ClickHouse ships them as dedicated
aggregate functions. Here each is a deterministic composition of
built-in Spark ops — window functions and hash aggregations, zero
Python in the hot path — with an exactly-equivalent DuckDB oracle.

Scale notes (100 TB):
- Funnel/retention/sequence state is per-user and tiny (a few
  timestamps or one letter string per user); the only wide exchange is
  the hash partition on ``user_id``. The chained window expressions all
  share one partitioning, so Spark plans ONE shuffle for all three
  funnel stages (asserted in tests/test_plans.py).
- ``q_sequence_match`` materializes one letter per event into a
  per-user string — O(events/user) memory inside an aggregate buffer,
  fine for clickstream cardinalities (even 1e5 events/user is a 100 KB
  string). For adversarial skew, cap with a windowed top-N first.
- All outputs are grouped summaries (levels, cohort counts, day × type)
  — result sizes independent of input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

# Funnel window: a conversion chain view -> click -> purchase only
# counts if it completes within 6 hours of the first view.
FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000


def funnel_levels(events: DataFrame, window_us: int = FUNNEL_WINDOW_US) -> DataFrame:
    """First-touch funnel level per user (deterministic ``windowFunnel``
    variant): t1 = first 'view', t2 = first 'click' after t1, t3 = first
    'purchase' after t2; level = longest prefix whose last stage lands
    within ``window_us`` of t1.

    Three chained window-min expressions over the same ``user_id``
    partitioning — Catalyst plans a single Exchange for all three.
    """
    us = "unix_micros(ts)"
    w1 = events.selectExpr(
        "user_id",
        "event_type",
        f"{us} AS e_us",
        f"min(CASE WHEN event_type = 'view' THEN {us} END)"
        " OVER (PARTITION BY user_id) AS t1",
    )
    w2 = w1.selectExpr(
        "*",
        "min(CASE WHEN event_type = 'click' AND e_us > t1 THEN e_us END)"
        " OVER (PARTITION BY user_id) AS t2",
    )
    w3 = w2.selectExpr(
        "*",
        "min(CASE WHEN event_type = 'purchase' AND e_us > t2 THEN e_us END)"
        " OVER (PARTITION BY user_id) AS t3",
    )
    per_user = w3.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    return per_user.selectExpr(
        "user_id",
        f"""CAST(CASE WHEN t1 IS NULL THEN 0
                 WHEN t3 IS NOT NULL AND t3 - t1 <= {window_us} THEN 3
                 WHEN t2 IS NOT NULL AND t2 - t1 <= {window_us} THEN 2
                 ELSE 1 END AS INT) AS funnel_level""",
    )


_FUNNEL_ORACLE = f"""
WITH w1 AS (
  SELECT user_id, event_type, epoch_us(ts) AS e_us,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND e_us > t1 THEN e_us END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND e_us > t2 THEN e_us END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
  FROM w3 GROUP BY user_id
), lv AS (
  SELECT CAST(CASE WHEN t1 IS NULL THEN 0
              WHEN t3 IS NOT NULL AND t3 - t1 <= {FUNNEL_WINDOW_US} THEN 3
              WHEN t2 IS NOT NULL AND t2 - t1 <= {FUNNEL_WINDOW_US} THEN 2
              ELSE 1 END AS INT) AS funnel_level
  FROM per_user
)
SELECT funnel_level, CAST(count(*) AS BIGINT) AS n_users
FROM lv GROUP BY funnel_level
"""


@query("q_window_funnel", oracle=_FUNNEL_ORACLE)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel`` parity: users per funnel level for
    view -> click -> purchase within a 6-hour window."""
    ev = load(spark, sf_dir, "events")
    return (
        funnel_levels(ev)
        .groupBy("funnel_level")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), per_user AS (
      SELECT f.user_id,
             max(CASE WHEN a.d = f.d0 + 1 THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN a.d = f.d0 + 7 THEN 1 ELSE 0 END) AS r7
      FROM first_day f JOIN active a USING (user_id)
      GROUP BY f.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS cohort_users,
           CAST(sum(r1) AS BIGINT) AS retained_d1,
           CAST(sum(r7) AS BIGINT) AS retained_d7
    FROM per_user
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention`` parity: of all users (cohorted by first
    active day), how many were active again exactly 1 and 7 days later.

    Two aggregations on the same ``user_id`` key (first-day + distinct
    active days), then a user-keyed join — every exchange hashes the
    same small key, and per-user state is two bits.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    active = ev.distinct()
    per_user = (
        first_day.join(active, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("d") == F.date_add("d0", 1), 1).otherwise(0)
            ).alias("r1"),
            F.max(
                F.when(F.col("d") == F.date_add("d0", 7), 1).otherwise(0)
            ).alias("r7"),
        )
    )
    return per_user.agg(
        F.count("*").alias("cohort_users"),
        F.sum("r1").alias("retained_d1"),
        F.sum("r7").alias("retained_d7"),
    )


def user_event_seq(events: DataFrame) -> DataFrame:
    """Per-user letter string of the time-ordered event stream
    (v/c/p/s/e), built inside ONE hash aggregation: the collect_list
    buffer is order-insensitive, made deterministic by sorting on
    (ts, event_id) before joining the letters."""
    return events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", F.expr("substr(event_type, 1, 1)").alias("ch"))
                    )
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq")
    )


@query(
    "q_sequence_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT regexp_matches(seq, 'v.*c.*p') AS matched,
           CAST(count(*) AS BIGINT) AS n_users
    FROM seqs GROUP BY matched
    """,
)
def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` parity: encode
    each user's time-ordered event stream as a letter string (v/c/p/s/e)
    and count users whose stream matches view-then-click-then-purchase.

    The per-user string is built with sort_array(collect_list(struct))
    — an order-insensitive aggregate made deterministic by sorting on
    (ts, event_id) inside the buffer, so it needs no window pre-sort and
    stays a single hash aggregation.
    """
    ev = load(spark, sf_dir, "events")
    return (
        user_event_seq(ev).select(F.col("seq").rlike("v.*c.*p").alias("matched"))
        .groupBy("matched")
        .agg(F.count("*").alias("n_users"))
    )


def sum_map(ev: DataFrame) -> DataFrame:
    """Array-native ClickHouse ``sumMap`` parity: per day, the
    event-type breakdown as aligned sorted key/count arrays (ClickHouse
    returns sorted map keys; we emit the two parallel arrays it
    decomposes into).

    Two-level aggregation: the wide count happens at (day, type)
    granularity (map-side partials), then the tiny per-day array
    assembly touches only #days x #types rows.
    """
    per = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    assembled = per.groupBy("day").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "cnt"))).alias("kv")
    )
    return assembled.select(
        "day",
        F.transform("kv", lambda x: x["event_type"]).alias("type_keys"),
        F.transform("kv", lambda x: x["cnt"]).alias("type_counts"),
    )


@query(
    "q_sum_map",
    oracle="""
    WITH per AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           string_agg(event_type, ',' ORDER BY event_type) AS type_keys,
           string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY event_type) AS type_counts
    FROM per GROUP BY day
    """,
)
def q_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-boundary view of :func:`sum_map`: the parallel arrays are
    serialized to comma-joined strings because the correctness
    harness's pandas canonicalizer cannot hash Python lists (r3 rows
    ERRed on ArrayType cells). The array-native :func:`sum_map` stays
    the library surface; this wrapper only changes the wire format."""
    arrays = sum_map(load(spark, sf_dir, "events"))
    return arrays.select(
        "day",
        F.concat_ws(",", "type_keys").alias("type_keys"),
        F.concat_ws(",", F.col("type_counts").cast("array<string>")).alias(
            "type_counts"
        ),
    )


@query(
    "q_delta_sum",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(value AS DECIMAL(18,2))
               - lag(CAST(value AS DECIMAL(18,2)))
                   OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS delta
      FROM events
    )
    SELECT event_type,
           CAST(round(sum(CASE WHEN delta > 0 THEN delta END), 2) AS DOUBLE)
             AS delta_sum,
           CAST(count(CASE WHEN delta > 0 THEN 1 END) AS BIGINT) AS n_increases
    FROM d GROUP BY event_type
    """,
)
def q_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` parity: per event type, the total of
    positive value deltas along each user's time-ordered series (the
    monotonic-counter-rate aggregation). Values are cast to
    DECIMAL(18,2) BEFORE differencing so the lag-subtract and the sum
    are exact and order-independent (functions/numeric.py discipline);
    one window shuffle on (user_id, event_type), then a tiny agg."""
    ev = load(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,2)")
    d = ev.select(
        "event_type",
        (
            dv
            - F.expr(
                "lag(CAST(value AS DECIMAL(18,2))) OVER"
                " (PARTITION BY user_id, event_type ORDER BY ts, event_id)"
            )
        ).alias("delta"),
    )
    pos = F.when(F.col("delta") > 0, F.col("delta"))
    return d.groupBy("event_type").agg(
        F.round(F.sum(pos), 2).cast("double").alias("delta_sum"),
        F.count(F.when(F.col("delta") > 0, 1)).alias("n_increases"),
    )


@query(
    "q_event_paths",
    oracle="""
    WITH hops AS (
      SELECT user_id, event_type,
             lag(event_type, 2) OVER w AS p2,
             lag(event_type, 1) OVER w AS p1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM hops WHERE p2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event paths (the 'what do users do next'
    dashboard query): lag-window trigrams per user, then a count.

    One window shuffle on user_id, one agg shuffle on path (paths have
    at most |types|^3 = 125 distinct values here — broadcast-tiny), and
    TakeOrdered for the limit.
    """
    ev = load(spark, sf_dir, "events")
    hops = ev.selectExpr(
        "user_id",
        "event_type",
        "lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2",
        "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1",
    )
    return (
        hops.filter(F.col("p2").isNotNull())
        .select(F.concat_ws(">", "p2", "p1", "event_type").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "q_sequence_count",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(len(regexp_extract_all(seq, 'v[^p]*p'))) AS BIGINT)
             AS n_chains,
           CAST(count(*) AS BIGINT) AS n_users
    FROM seqs
    """,
)
def q_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount`` parity: non-overlapping
    view-...-purchase chains per user (regex left-to-right scan counts
    exactly the non-overlapping matches), summed over all users. Same
    single hash aggregation as q_sequence_match plus a regexp_count."""
    ev = load(spark, sf_dir, "events")
    return user_event_seq(ev).agg(
        F.sum(F.expr("regexp_count(seq, 'v[^p]*p')")).alias("n_chains"),
        F.count("*").alias("n_users"),
    )


@query(
    "q_sliding_counts",
    oracle="""
    WITH e AS (
      SELECT epoch_us(ts) AS t, event_type FROM events
      WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    ), w AS (
      SELECT event_type,
             unnest([(t // 300000000) * 300000000 - 300000000,
                     (t // 300000000) * 300000000]) AS win_start
      FROM e
    )
    SELECT make_timestamp(win_start) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM w WHERE win_start >= 0
    GROUP BY win_start, event_type
    """,
)
def q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 batch twin with a full oracle: sliding-window counts (10-min
    windows, 5-min slide) over day one. Spark's native F.window
    enumerates the two windows per event JVM-side; the oracle unnests
    the same two window starts arithmetically — exact equality, which
    pins the window-assignment semantics the streaming variant
    inherits."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-02 00:00:00")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )



@query(
    "q_session_bounds",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_sess
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 session twin, strengthened: full session windows (start, end,
    event count) per user — the batch equivalent of
    ``session_window(ts, '30 minutes')``, derived from the same
    lag+cumsum construction the oracle replays. One window shuffle on
    user_id; the bounds aggregation reuses that partitioning."""
    from kafka_clickhouse_implementation_spark.operators.sessions import sessionize

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    s = sessionize(ev)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------
# Cohort retention triangle — round 10 (C164): the week-cohort x
# week-age GRID (the classic retention-triangle dashboard deliverable
# — ClickHouse's retention() gives the per-user boolean vector C13
# already covers; the triangle is its corpus-level rollup with cohort
# sizes, which is what an analyst actually reads). Weeks via
# date_trunc('week') — both engines start weeks on Monday (the
# q_weekly_rollup precedent); age = day-difference div 7, pure integer.
# No float surface: the grid reports (n_active, n_cohort) exact counts
# — rates are the consumer's division.
#
# Scale shape: one distinct over (user, week) -> per-user min -> two
# grouped counts; every shuffle carries (user_id, date) pairs; the
# cohort-size table is week-cardinality-sized and broadcasts.
# ---------------------------------------------------------------------

TRI_MAX_AGE = 4  # maximum week age reported (ages 0..TRI_MAX_AGE inclusive)


@query(
    "q_retention_triangle",
    oracle=f"""
    WITH wk AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    ), coh AS (
      SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id
    ), csize AS (
      SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort FROM coh GROUP BY cw
    )
    SELECT c.cw AS cohort_week,
           CAST((w.w - c.cw) // 7 AS BIGINT) AS age,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active,
           s.n_cohort
    FROM wk w
    JOIN coh c USING (user_id)
    JOIN csize s ON s.cw = c.cw
    WHERE (w.w - c.cw) // 7 <= {TRI_MAX_AGE}
    GROUP BY cohort_week, age, s.n_cohort
    """,
)
def q_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C164: weekly cohort retention triangle — per (first-activity
    cohort week, week age <= TRI_MAX_AGE): distinct active users and
    the cohort size. The hash certifies the week bucketing, the cohort
    assignment, the integer age arithmetic, and both counts."""
    ev = load(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
    ).distinct()
    coh = wk.groupBy("user_id").agg(F.min("w").alias("cw"))
    csize = coh.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    j = (
        wk.join(coh, "user_id")
        .selectExpr(
            "user_id", "cw AS cohort_week",
            "CAST(datediff(w, cw) div 7 AS BIGINT) AS age",
        )
        .filter(F.col("age") <= TRI_MAX_AGE)
    )
    return (
        j.join(
            F.broadcast(csize.withColumnRenamed("cw", "cohort_week")),
            "cohort_week",
        )
        .groupBy("cohort_week", "age", "n_cohort")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .select("cohort_week", "age", "n_active", "n_cohort")
    )
