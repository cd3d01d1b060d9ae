"""C132 — AggregatingMergeTree-style aggregate-STATE tables.

ClickHouse's ``AggregatingMergeTree`` persists aggregate *states*
(``-State`` combinators) in table columns; merges combine states
pairwise; reads finalize with ``-Merge``. This module is the
table-persisted half of the combinator story (the streaming state-store
half lives in streaming/sketches_stream.py et al.), built Spark-first
(round-8 verdict item 8):

- ``build_state_table`` (-State): ONE pass over raw events produces a
  state row per day — exact integer accumulators (count / milli-sum /
  min / max) plus two sketch states as plain array columns: a dense
  64-slot portable-HLL register vector (C31's hash arithmetic) and a
  bottom-k md5 digest list (C37's KMV).
- ``merge_states`` (the MergeTree merge): re-aggregates state rows to
  coarser keys USING ONLY STATES — sums add, min/max fold, HLL
  registers merge by positional slot-max (posexplode → max →
  map_from_entries re-densify), KMV lists union-and-retruncate
  (explode → distinct → rank ≤ k). No raw row is touched.
- ``finish_exprs`` (-Merge): counts/sums verbatim; the HLL register
  vector folds to the portable estimate via one ``aggregate`` HOF +
  C31's literal-coefficient finish; the KMV k-th digest yields the
  (k−1)/h estimate, NULL until the sketch is full.

Why it matters at 100 TB: the daily state table is a few rows per
partition (registers are 64 longs, the digest list ≤ k strings); any
rollup — weekly here, monthly, ad-hoc ranges — is a merge over states,
so the fact table is scanned once ever. Every state is a pure function
of the row SET (order-independent max / bottom-k / integer sums),
which is exactly what makes the algebra oracle-checkable: the driver
hash proves merged-daily-states == DuckDB recomputing from raw rows.

Reference anchor: kafka+clickhouse.md:221-229 (the MV machinery that
-State aggregates feed); ClickHouse AggregatingMergeTree +
uniqCombinedState/-Merge docs (public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.relational_ext import (
    _HLL_FINISH,
    _HLL_M,
    _HLL_RHO,
    _hll_estimate_sql,
)
from kafka_clickhouse_implementation_spark.operators.sketches import (
    _nibble_value_sql,
)
from kafka_clickhouse_implementation_spark.registry import query

_VM = "CAST(floor(value * 1000 + 0.5) AS BIGINT)"  # C76 milli-unit recipe
_KMV_K = 16  # bottom-k size; small enough to fill at weekly granularity
_TWO_52 = 1 << 52


def _hashed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events with the per-row sketch ingredients (same md5
    slot/rank arithmetic as C31, same digest ordering as C37)."""
    return (
        load(spark, sf_dir, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "value",
            "md5(CAST(user_id AS STRING)) AS uh",
        )
        .selectExpr(
            "day",
            "value",
            "uh",
            f"({_nibble_value_sql('uh', 2)}) % {_HLL_M} AS idx",
            f"{_nibble_value_sql('uh', 13, start=3)} AS w",
        )
        .selectExpr("day", "value", "uh", "idx", f"{_HLL_RHO} AS rho")
    )


def build_state_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-State: one state row per day. The hashed projection is
    materialized ONCE (localCheckpoint — repartitioned first so the
    single-file scan doesn't collapse to one partition, the r7 trap),
    then the three state aggregations read the materialization, never
    the fact table again; the joins are over day-cardinality frames,
    broadcast-sized."""
    ev = _hashed_events(spark, sf_dir)
    ev = ev.repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    nums = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("s_cnt"),
        F.sum(F.expr(_VM)).cast("long").alias("s_sum"),
        F.min(F.expr(_VM)).alias("s_min"),
        F.max(F.expr(_VM)).alias("s_max"),
    )
    # HLL state: slot-max per (day, idx), re-densified to 64 longs
    hll = (
        ev.groupBy("day", "idx")
        .agg(F.max("rho").alias("m"))
        .groupBy("day")
        .agg(F.expr("map_from_entries(collect_list(struct(idx, m)))").alias("mm"))
        .selectExpr(
            "day",
            f"transform(sequence(0, {_HLL_M - 1}),"
            " s -> coalesce(mm[CAST(s AS BIGINT)], CAST(0 AS BIGINT))) AS s_hll",
        )
    )
    # KMV state: the day's k smallest distinct digests (rank, never a
    # per-group collect of the full distinct set)
    w = Window.partitionBy("day").orderBy("uh")
    kmv = (
        ev.select("day", "uh")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("day")
        .agg(F.expr("array_sort(collect_list(uh))").alias("s_kmv"))
    )
    return nums.join(hll, "day").join(kmv, "day")


def merge_states(states: DataFrame, group_expr: str) -> DataFrame:
    """The AggregatingMergeTree merge: coarser keys from states ONLY."""
    keyed = states.selectExpr(f"{group_expr} AS g", "*")
    nums = keyed.groupBy("g").agg(
        F.sum("s_cnt").cast("long").alias("s_cnt"),
        F.sum("s_sum").cast("long").alias("s_sum"),
        F.min("s_min").alias("s_min"),
        F.max("s_max").alias("s_max"),
    )
    hll = (
        keyed.select("g", F.posexplode("s_hll").alias("idx", "m"))
        .groupBy("g", "idx")
        .agg(F.max("m").alias("m"))
        .groupBy("g")
        .agg(
            F.expr(
                "map_from_entries(collect_list(struct(CAST(idx AS BIGINT) AS idx, m)))"
            ).alias("mm")
        )
        .selectExpr(
            "g",
            f"transform(sequence(0, {_HLL_M - 1}),"
            " s -> coalesce(mm[CAST(s AS BIGINT)], CAST(0 AS BIGINT))) AS s_hll",
        )
    )
    w = Window.partitionBy("g").orderBy("uh")
    kmv = (
        keyed.select("g", F.explode("s_kmv").alias("uh"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("g")
        .agg(F.expr("array_sort(collect_list(uh))").alias("s_kmv"))
    )
    return nums.join(hll, "g").join(kmv, "g")


# -Merge finisher fragments over a state row (Spark-side SQL; the HLL
# register fold reuses C31's estimate arithmetic on aggregate-HOF-
# derived s_total / v_zero — absent slots carry m=0, so the fold's
# shiftleft(1, 53-0) contributes the same 2^53 the oracle adds for
# missing registers)
_HLL_FOLD = (
    "aggregate(s_hll, CAST(0 AS BIGINT),"
    " (acc, m) -> acc + shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT)))"
)
_V_ZERO = "CAST(size(filter(s_hll, m -> m = 0)) AS BIGINT)"


def finalize(merged: DataFrame, lc_array_sql: str, key_alias: str) -> DataFrame:
    """-Merge: finalize merged states into values."""
    return merged.selectExpr(
        "g",
        "s_cnt",
        "s_sum",
        "s_min",
        "s_max",
        f"{_HLL_FOLD} AS s_total",
        f"{_V_ZERO} AS v_zero",
        "s_kmv",
    ).selectExpr(
        f"g AS {key_alias}",
        "s_cnt AS n_events",
        "s_sum AS sum_vm",
        "s_min AS min_vm",
        "s_max AS max_vm",
        f"{_hll_estimate_sql(lc_array_sql)} AS est_users_milli",
        "CAST(size(s_kmv) AS BIGINT) AS kmv_kept",
        f"CASE WHEN size(s_kmv) = {_KMV_K} THEN element_at(s_kmv, {_KMV_K})"
        " ELSE NULL END AS kmv_kth",
    )


# ---------------------------------------------------------------------------
# declared query: weekly rollup answered FROM DAILY STATES ONLY
# ---------------------------------------------------------------------------

# Spark `div` and DuckDB integer `//` BOTH truncate toward zero
# (DuckDB floors only for FLOAT operands; DATE - DATE is BIGINT), so
# the week key agrees cross-engine even for pre-1970 timestamps —
# pinned by tests/test_agg_state.py::test_week_key_portable_pre_epoch.
_WEEK_SPARK = "CAST(datediff(day, DATE '1970-01-01') AS BIGINT) div 7"

_AGG_STATE_ORACLE = f"""
WITH hashed AS (
  SELECT (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
         {_VM} AS vm,
         md5(CAST(user_id AS VARCHAR)) AS uh
  FROM events
),
slotted AS (
  SELECT wk, uh,
         ({_nibble_value_sql("uh", 2)}) % {_HLL_M} AS idx,
         {_nibble_value_sql("uh", 13, start=3)} AS w
  FROM hashed
),
regs AS (
  SELECT wk, idx, max({_HLL_RHO}) AS m_j
  FROM slotted GROUP BY wk, idx
),
finish AS (
  SELECT wk, {_HLL_FINISH} FROM regs GROUP BY wk
),
nums AS (
  SELECT wk,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(vm) AS BIGINT) AS sum_vm,
         min(vm) AS min_vm,
         max(vm) AS max_vm
  FROM hashed GROUP BY wk
),
kdist AS (SELECT DISTINCT wk, uh FROM hashed),
kranked AS (
  SELECT wk, uh, row_number() OVER (PARTITION BY wk ORDER BY uh) AS rn
  FROM kdist
),
kmv AS (
  SELECT wk,
         CAST(sum(CASE WHEN rn <= {_KMV_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS kmv_kept,
         max(CASE WHEN rn = {_KMV_K} THEN uh END) AS kth_if_full
  FROM kranked GROUP BY wk
)
SELECT n.wk AS week, n.n_events, n.sum_vm, n.min_vm, n.max_vm,
       {{est}} AS est_users_milli,
       k.kmv_kept,
       CASE WHEN k.kmv_kept = {_KMV_K} THEN k.kth_if_full END AS kmv_kth
FROM nums n JOIN finish f ON f.wk = n.wk JOIN kmv k ON k.wk = n.wk
ORDER BY week
"""


def _oracle_sql() -> str:
    from kafka_clickhouse_implementation_spark.operators.relational_ext import (
        _HLL_LC,
    )

    lc = f"list_extract([{', '.join(_HLL_LC)}], CAST(v_zero AS INT))"
    return _AGG_STATE_ORACLE.format(est=_hll_estimate_sql(lc))


@query("q_agg_state_merge", oracle=_oracle_sql())
def q_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree end to end: build the DAILY state table
    (-State), merge daily states to WEEKS using states only (the
    MergeTree merge), finalize (-Merge) — and the driver hash proves
    the result equals DuckDB recomputing every week directly from raw
    rows: counts/sums/min/max, the portable-HLL distinct estimate, and
    the bottom-k digest boundary all match value-for-value, which is
    the state-algebra law (merge-of-partials == direct) that lets a
    100 TB deployment answer any rollup from a KB-scale state table.
    Plan: one raw scan for the daily states; everything after touches
    only day-cardinality frames."""
    from kafka_clickhouse_implementation_spark.operators.relational_ext import (
        _HLL_LC,
    )

    daily = build_state_table(spark, sf_dir)
    weekly = merge_states(daily, _WEEK_SPARK)
    lc = (
        f"element_at(array({', '.join(v + 'D' for v in _HLL_LC)}),"
        " CAST(v_zero AS INT))"
    )
    return finalize(weekly, lc, "week").orderBy("week")
