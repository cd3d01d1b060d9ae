"""Tier C — batch sessionization (the deterministic twin of streaming
session windows, SURVEY C7): a session break is a >30-minute gap in a
user's event stream; session count = sum of breaks (+1 for the first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Assign a session id per (user, run-of-events) via lag + cumulative
    sum of gap-breaks — one window shuffle on user_id, microsecond-exact
    arithmetic (no float time math)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = (
        F.when(F.lag(us, 1).over(w).isNull(), 1)
        .when(us - F.lag(us, 1).over(w) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


@query(
    "q_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 THEN 1
                  ELSE 0 END AS new_sess
      FROM events WHERE user_id < 10
    )
    SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 twin — sessions per user (users 0-9), 30-minute gap rule."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    s = sessionize(ev)
    return s.groupBy("user_id").agg(F.sum("new_sess").alias("n_sessions"))
