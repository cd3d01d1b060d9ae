"""ClickHouse mutation semantics — lightweight DELETE and ALTER
TABLE UPDATE — re-expressed as Spark read paths over immutable parquet
(SURVEY §2 C117–C118).

ClickHouse mutations never update rows in place either: a lightweight
``DELETE FROM t WHERE cond`` writes a ``_row_exists`` mask that reads
apply until a background mutation materializes the part rewrite, and
``ALTER TABLE ... UPDATE`` stages a patch the merge applies. The
Spark-native equivalents:

- **DELETE** = a delete-marker table (the deleted KEYS only) + an
  anti-join read path; "materialization" is a one-time filtered
  rewrite after which the read path needs no join. At 100 TB the
  marker table is broadcast-size (deletes are rare) so the read-path
  anti-join is a BroadcastHashJoin — no shuffle of the fact table.
- **UPDATE** = a patch table (key → new column values, versioned) +
  a read-time left-join + coalesce; materialization folds the patch
  in. Same broadcast profile.

Both queries verify the READ PATH (markers applied at read time)
against a DuckDB oracle that states the post-mutation semantics
directly; a pytest additionally materializes the mutation and asserts
the rewritten table equals the read path row-for-row (the
``_row_exists`` contract: reads before and after materialization are
indistinguishable).

Reference basis: public ClickHouse ALTER DELETE/UPDATE mutation
semantics; the reference tutorial's engine tier (kafka+clickhouse.md
MergeTree discussion) assumes the same immutable-parts model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

# Deterministic mutation predicates (non-vacuous at every SF):
# DELETE: purge one user cohort (a GDPR-style erasure request).
_DEL_COHORT = 5  # user_id % 31 == 5
# UPDATE: re-price one event type (milli-exact doubling).
_UPD_TYPE = "error"


def delete_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delete-marker table: KEYS of rows a lightweight DELETE has
    masked. Derived deterministically here; in production it is the
    tiny side table the DELETE statement writes."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") % 31 == _DEL_COHORT)
        .select("event_id")
        .distinct()
    )


@query(
    "q_lightweight_delete",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS vm_sum
    FROM events
    WHERE user_id % 31 <> {_DEL_COHORT}
    GROUP BY event_type
    """,
)
def q_lightweight_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse lightweight-DELETE read path: the fact scan
    LEFT-ANTI-joins the (broadcast) delete-marker key table — the
    ``_row_exists = 0`` mask applied at read time, before any
    background mutation has rewritten parts. The oracle states the
    post-delete semantics directly, so a hash match proves the masked
    read equals the materialized table; tests/test_mutations.py
    additionally performs the materializing rewrite and asserts
    read-path == rewritten-table row-for-row. Scale: markers are the
    deleted keys only → broadcast anti-join, zero fact shuffle."""
    ev = load(spark, sf_dir, "events")
    marks = delete_markers(spark, sf_dir)
    alive = ev.join(F.broadcast(marks), "event_id", "left_anti")
    return alive.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("vm_sum"),
    )


def update_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UPDATE mutation's patch table: (key, new value) for every
    row the predicate touches — value doubles, exactly, in integer
    milli-units."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == _UPD_TYPE).select(
        "event_id",
        (F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)") * 2).alias("new_vm"),
    )


@query(
    "q_update_mutation",
    oracle=f"""
    WITH patched AS (
      SELECT event_type, user_id,
             CASE WHEN event_type = '{_UPD_TYPE}'
                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) * 2
                  ELSE CAST(floor(value * 1000 + 0.5) AS BIGINT) END AS vm
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vm) AS BIGINT) AS vm_sum,
           CAST(max(vm) AS BIGINT) AS vm_max
    FROM patched GROUP BY event_type
    """,
)
def q_update_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ALTER TABLE UPDATE`` read path: the fact scan
    LEFT-joins the (broadcast) patch table on the row key and
    coalesces the patched column over the stored one — update-as-
    overlay, the way the mutation reads before the merge materializes
    it. The oracle states the post-mutation semantics as a CASE
    expression; the materialize-then-compare contract is pinned in
    tests/test_mutations.py. Scale: the patch carries only touched
    keys → broadcast left join, zero fact shuffle; the coalesce is a
    codegen projection."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm0"),
    )
    patch = update_patch(spark, sf_dir)
    patched = ev.join(F.broadcast(patch), "event_id", "left").select(
        "event_type",
        "user_id",
        F.coalesce("new_vm", "vm0").alias("vm"),
    )
    return patched.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").cast("long").alias("vm_sum"),
        F.max("vm").cast("long").alias("vm_max"),
    )


def materialize_delete(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """The background mutation: rewrite the table without masked rows
    (what ClickHouse's part-rewrite does once the DELETE mutates)."""
    ev = load(spark, sf_dir, "events")
    marks = delete_markers(spark, sf_dir)
    ev.join(F.broadcast(marks), "event_id", "left_anti").write.mode(
        "overwrite"
    ).parquet(out_dir)


def materialize_update(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """The background mutation for UPDATE: fold the patch into a
    rewritten table (stored value stays a double; the patched column
    is exact because doubling milli-units is exact in binary)."""
    ev = load(spark, sf_dir, "events")
    patch = update_patch(spark, sf_dir)
    (
        ev.join(F.broadcast(patch), "event_id", "left")
        .withColumn(
            "value",
            F.when(
                F.col("new_vm").isNotNull(),
                F.col("new_vm").cast("double") / F.lit(1000.0),
            ).otherwise(F.col("value")),
        )
        .drop("new_vm")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
