"""Round-6 statistical-aggregate batch — the remaining ClickHouse
statistics family re-expressed Spark-first with the repo's exact-
arithmetic portability discipline (SURVEY §2 C98–C103):

- ``simpleLinearRegression``  → q_linreg
- ``skewPop`` / ``kurtPop``   → q_skew_kurt
- ``mannWhitneyUTest``        → q_mann_whitney
- ``kolmogorovSmirnovTest``   → q_ks_test
- ``avgWeighted``             → q_avg_weighted
- ``groupBitmapAnd/Or/Xor``   → q_bitmap_ops

Reference basis: the ClickHouse aggregate-function surface the tutorial
engine exposes through its dashboard queries (kafka+clickhouse.md
:246-258 shows the aggregation idiom; the function family is public
ClickHouse API). Numeric recipe (shared with analytics_ext C76/C84):
quantize doubles to integer milli-units, accumulate ONLY exact
integers/decimals (DECIMAL(38,0) here, HUGEINT in DuckDB), and finish
with an IEEE expression tree stated identically on both engines — no
double is ever rounded, so value hashes match bit-for-bit.

Scale notes per operator in the docstrings; nothing here uses an
unpartitioned window (the rank/CDF prefixes ride plans/prefix.py's
ranged_prefix — range shuffle + partitioned window + P-row offset
join), and every aggregation is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.portable_math import dcast
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.plans.prefix import ranged_prefix
from kafka_clickhouse_implementation_spark.registry import query

_VM = "CAST(floor(value * 1000 + 0.5) AS BIGINT)"  # milli-units (C76 recipe)
# x origin for the regression: 2024-01-01 epoch seconds. A constant
# shift changes the intercept's reference point, not the slope, and
# keeps x small (~seconds-into-2024) so x² sums stay far from the
# 128-bit ceiling at any row count.
_X0 = 1704067200


_LINREG_ORACLE = f"""
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - {_X0} AS x,
             {_VM} AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      FROM pts GROUP BY event_type
    )
    , s2 AS (
      SELECT event_type, n, sx, sy,
             CAST(n AS HUGEINT) * sxy - sx * sy AS num_i,
             CAST(n AS HUGEINT) * sxx - sx * sx AS den_i
      FROM s
    )
    SELECT event_type, n,
           ({dcast('num_i', 'duck')} / {dcast('den_i', 'duck')}) / 1000.0
             AS slope_per_sec,
           (CAST(sy AS DOUBLE)
            - ({dcast('num_i', 'duck')} / {dcast('den_i', 'duck')})
              * CAST(sx AS DOUBLE))
           / (CAST(n AS DOUBLE) * 1000.0) AS intercept_at_origin
    FROM s2
    """


@query("q_linreg", oracle=_LINREG_ORACLE)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` parity: per
    event_type, the least-squares slope (value units per second) and
    intercept (value at 2024-01-01) of value over event time. n, Σx,
    Σy, Σx², Σxy accumulate exactly (DECIMAL(38,0) ↔ HUGEINT — x is
    seconds-into-2024, y integer milli-units, so the sums stay ~10
    orders under the 128-bit ceiling at any realistic row count); the
    closed forms (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) are then identical IEEE
    trees over exactly-cast integers. One map-side-combined hash
    aggregation — the canonical mergeable-state aggregate, same shuffle
    profile as sum()."""
    pts = load(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("unix_micros(ts) div 1000000") - F.lit(_X0)).alias("x"),
        F.expr(_VM).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    # num/den reach ~1e24-1e26: dcast (split cast), not .cast("double")
    # — DuckDB's wide-int->double cast is not correctly rounded, so
    # both engines use the construction-identical split (see
    # portable_math.dcast; sx/sy stay under 2^53, plain casts exact).
    s2 = s.select(
        "event_type",
        "n",
        "sx",
        "sy",
        (n_dec * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num_i"),
        (n_dec * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den_i"),
    )
    slope_milli = F.expr(dcast("num_i", "spark")) / F.expr(dcast("den_i", "spark"))
    return s2.select(
        "event_type",
        "n",
        (slope_milli / F.lit(1000.0)).alias("slope_per_sec"),
        (
            (F.col("sy").cast("double") - slope_milli * F.col("sx").cast("double"))
            / (F.col("n").cast("double") * F.lit(1000.0))
        ).alias("intercept_at_origin"),
    )


# Moment center: 250000 milli-units (mid-range of the value domain).
# A CONSTANT center needs no second pass; centered powers are bounded
# by the value SPREAD, not its location, so Σd⁴ stays ~5 orders under
# the 128-bit ceiling even at 10^12 rows per group.
_A = 250000
_DM = f"({_VM} - {_A})"


@query(
    "q_skew_kurt",
    oracle=f"""
    WITH d AS (
      SELECT user_id % 5 AS cohort, CAST({_DM} AS HUGEINT) AS d FROM events
    ),
    s AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n,
             sum(d) AS s1, sum(d*d) AS s2, sum(d*d*d) AS s3,
             sum(d*d*d*d) AS s4
      FROM d GROUP BY cohort
    ),
    m AS (
      SELECT cohort, n,
             {dcast('s1', 'duck')} / CAST(n AS DOUBLE) AS m1,
             {dcast('s2', 'duck')} / CAST(n AS DOUBLE) AS m2r,
             {dcast('s3', 'duck')} / CAST(n AS DOUBLE) AS m3r,
             {dcast('s4', 'duck')} / CAST(n AS DOUBLE) AS m4r
      FROM s
    ),
    c AS (
      SELECT cohort, n,
             m2r - m1 * m1 AS c2,
             m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1 AS c3,
             m4r - 4.0 * m1 * m3r + 6.0 * m1 * m1 * m2r
                 - 3.0 * m1 * m1 * m1 * m1 AS c4
      FROM m
    )
    SELECT cohort, n,
           c3 / (c2 * sqrt(c2)) AS skew_pop,
           c4 / (c2 * c2) AS kurt_pop
    FROM c
    """,
)
def q_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` parity: population skewness
    m3/m2^1.5 and kurtosis m4/m2² of value per user cohort. Raw moments
    about the CONSTANT center 250 (value units) accumulate as exact
    DECIMAL(38,0)/HUGEINT sums of centered milli-unit powers; central
    moments come from the constant-shift identities (c2=M2−M1², ...)
    evaluated in one identical IEEE tree — both ratios are scale-free
    so the milli quantization cancels. sqrt is IEEE-correctly-rounded
    (unlike pow, which is why kurt uses c2·c2 and skew c2·sqrt(c2)).
    One map-side-combined aggregation; mergeable partials (the sums),
    O(cohorts) final state."""
    d = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("cohort"),
        F.expr(_DM).cast("decimal(38,0)").alias("d"),
    )
    s = d.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).cast("decimal(38,0)").alias("s3"),
        F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
        .cast("decimal(38,0)")
        .alias("s4"),
    )
    # dcast, not .cast("double"): Spark's DECIMAL->DOUBLE is correctly
    # rounded but DuckDB's HUGEINT->DOUBLE is NOT — both sides use the
    # split cast so the doubles are equal by construction (s3/s4 pass
    # 2^53 even at sf0.001).
    nd = F.col("n").cast("double")
    m1 = F.expr(dcast("s1", "spark")) / nd
    m2r = F.expr(dcast("s2", "spark")) / nd
    m3r = F.expr(dcast("s3", "spark")) / nd
    m4r = F.expr(dcast("s4", "spark")) / nd
    c2 = m2r - m1 * m1
    c3 = m3r - F.lit(3.0) * m1 * m2r + F.lit(2.0) * m1 * m1 * m1
    c4 = (
        m4r
        - F.lit(4.0) * m1 * m3r
        + F.lit(6.0) * m1 * m1 * m2r
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    return s.select(
        "cohort",
        "n",
        (c3 / (c2 * F.sqrt(c2))).alias("skew_pop"),
        (c4 / (c2 * c2)).alias("kurt_pop"),
    )


def _rank_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared MWU/KS intermediate: one row per DISTINCT milli-value
    with per-cohort counts and the INCLUSIVE global cumulative count in
    value order. The distinct-value table is bounded by the quantized
    domain (≤ ~10⁶ rows however large the fact table), and the global
    cumulative rides ranged_prefix — range shuffle + partitioned
    window + P-row offset join, never a single-task window."""
    vals = load(spark, sf_dir, "events").select(
        F.expr(_VM).alias("vm"), (F.col("user_id") % 2).alias("g")
    )
    agg = vals.groupBy("vm").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("cnt_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("cnt_b"),
    )
    agg = agg.withColumn("cnt", (F.col("cnt_a") + F.col("cnt_b")).cast("long"))
    return ranged_prefix(agg, [F.col("vm")], sum_cols={"cum": "cnt"})


_RANK_CTE = f"""
    vals AS (
      SELECT {_VM} AS vm, user_id % 2 AS g FROM events
    ),
    agg AS (
      SELECT vm,
             CAST(count(*) FILTER (WHERE g = 0) AS BIGINT) AS cnt_a,
             CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS cnt_b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM vals GROUP BY vm
    ),
    ranked AS (
      SELECT vm, cnt_a, cnt_b, cnt,
             sum(cnt) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM agg
    )
"""


@query(
    "q_mann_whitney",
    oracle=f"""
    WITH {_RANK_CTE},
    terms AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n1,
             CAST(sum(cnt_b) AS BIGINT) AS n2,
             sum(CAST(cnt_a AS HUGEINT)
                 * CAST(2 * (cum - cnt) + cnt + 1 AS HUGEINT)) AS two_ra,
             sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
                 * CAST(cnt AS HUGEINT) - CAST(cnt AS HUGEINT)) AS tie_t
      FROM ranked
    )
    SELECT n1, n2,
           (CAST(two_ra AS DOUBLE)
            - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u_stat,
           ((CAST(two_ra AS DOUBLE)
             - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
            - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
           / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                  * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                     - CAST(tie_t AS DOUBLE)
                       / (CAST(n1 + n2 AS DOUBLE)
                          * (CAST(n1 + n2 AS DOUBLE) - 1.0)))) AS z_stat
    FROM terms
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest`` parity: the U statistic of the
    even-user cohort vs the odd-user cohort over value, with the
    normal-approximation z under the tie-corrected variance. Midranks
    are half-integers, so the DOUBLED rank sum 2R_A = Σ cnt_a·(2·cum_
    before + cnt + 1) stays an exact integer (HUGEINT/DECIMAL(38,0)),
    as does the tie term Σ(t³−t); U, μ_U, σ_U, z are then one identical
    IEEE tree. (The p-value needs erf, which is not correctly rounded
    across libm implementations — deliberately not emitted; z carries
    the same information portably.) Cost: one distinct-value
    aggregation + the bounded-domain prefix + a 1-row finish."""
    r = _rank_table(spark, sf_dir)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    two_mid = (
        F.lit(2).cast("decimal(38,0)") * (dec("cum") - dec("cnt"))
        + dec("cnt")
        + F.lit(1).cast("decimal(38,0)")
    )
    terms = r.agg(
        F.sum("cnt_a").cast("long").alias("n1"),
        F.sum("cnt_b").cast("long").alias("n2"),
        F.sum(dec("cnt_a") * two_mid).cast("decimal(38,0)").alias("two_ra"),
        F.sum(dec("cnt") * dec("cnt") * dec("cnt") - dec("cnt"))
        .cast("decimal(38,0)")
        .alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u = (F.col("two_ra").cast("double") - n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    sigma2 = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("tie_t").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    return terms.select(
        "n1",
        "n2",
        u.alias("u_stat"),
        ((u - n1d * n2d / F.lit(2.0)) / F.sqrt(sigma2)).alias("z_stat"),
    )


@query(
    "q_ks_test",
    oracle=f"""
    WITH {_RANK_CTE},
    cdf AS (
      SELECT vm,
             sum(cnt_a) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             sum(cnt_b) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM ranked
    ),
    tot AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n1,
             CAST(sum(cnt_b) AS BIGINT) AS n2
      FROM ranked
    ),
    scaled AS (
      SELECT vm,
             abs(CAST(cum_a AS HUGEINT) * t.n2
                 - CAST(cum_b AS HUGEINT) * t.n1) AS dn
      FROM cdf CROSS JOIN tot t
    ),
    mx AS (SELECT max(dn) AS max_dn FROM scaled)
    SELECT t.n1, t.n2,
           CAST(min(s.vm) AS BIGINT) AS at_vm,
           CAST(m.max_dn AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) AS d_stat
    FROM scaled s CROSS JOIN mx m CROSS JOIN tot t
    WHERE s.dn = m.max_dn
    GROUP BY t.n1, t.n2, m.max_dn
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest`` parity: the two-sample KS
    statistic D = sup|F_A − F_B| between the even/odd user cohorts,
    plus the smallest value where the supremum is attained. The
    comparison runs ENTIRELY in integers — |cum_a·n2 − cum_b·n1| is the
    CDF gap scaled by n1·n2 — so the argmax is exact; ONE division at
    the end produces D. Per-cohort cumulatives ride the same bounded-
    domain ranged_prefix as q_mann_whitney; the max/filter finish joins
    1-row aggregates (broadcast)."""
    r = _rank_table(spark, sf_dir)
    r = ranged_prefix(
        r.select("vm", "cnt_a", "cnt_b"),
        [F.col("vm")],
        sum_cols={"cum_a": "cnt_a", "cum_b": "cnt_b"},
    )
    tot = r.agg(
        F.sum("cnt_a").cast("long").alias("n1"),
        F.sum("cnt_b").cast("long").alias("n2"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    scaled = r.crossJoin(F.broadcast(tot)).select(
        "vm",
        "n1",
        "n2",
        F.abs(dec("cum_a") * dec("n2") - dec("cum_b") * dec("n1")).alias("dn"),
    )
    mx = scaled.agg(F.max("dn").alias("max_dn"))
    return (
        scaled.crossJoin(F.broadcast(mx))
        .filter(F.col("dn") == F.col("max_dn"))
        .groupBy("n1", "n2", "max_dn")
        .agg(F.min("vm").cast("long").alias("at_vm"))
        .select(
            "n1",
            "n2",
            "at_vm",
            (
                F.col("max_dn").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("d_stat"),
        )
    )


@query(
    "q_avg_weighted",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CAST(event_id % 10 + 1 AS HUGEINT) * CAST({_VM} AS HUGEINT))
                AS DOUBLE)
           / (CAST(sum(event_id % 10 + 1) AS DOUBLE) * 1000.0) AS w_avg,
           CAST(sum(event_id % 10 + 1) AS BIGINT) AS w_total
    FROM events GROUP BY event_type
    """,
)
def q_avg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgWeighted(v, w)`` parity: per event_type, the
    weight-w mean of value with deterministic synthetic weights
    (event_id%10+1). Σ(w·vm) and Σw are exact integers; ONE division
    finishes. Plain mergeable aggregation."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("event_id % 10 + 1").cast("decimal(38,0)").alias("w"),
        F.expr(_VM).cast("decimal(38,0)").alias("vm"),
    )
    s = ev.groupBy("event_type").agg(
        F.sum(F.col("w") * F.col("vm")).cast("decimal(38,0)").alias("swv"),
        F.sum("w").cast("long").alias("w_total"),
    )
    return s.select(
        "event_type",
        (
            F.col("swv").cast("double")
            / (F.col("w_total").cast("double") * F.lit(1000.0))
        ).alias("w_avg"),
        "w_total",
    )


@query(
    "q_bitmap_ops",
    oracle="""
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id
    )
    SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_and,
           CAST(count(*) AS BIGINT) AS n_or,
           CAST(sum(CASE WHEN in_a + in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_xor,
           CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_andnot
    FROM flags
    """,
)
def q_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitmapAnd/Or/Xor`` (+ ``bitmapAndnot``)
    parity: set-algebra cardinalities over the user-id sets of the
    'view' and 'purchase' segments. ClickHouse materializes roaring
    bitmaps; the Spark-first shape is membership FLAGS from one
    filtered aggregation (max-of-indicator per user — mergeable, the
    bitmap-union analogue) and the four cardinalities from a second
    tiny aggregation. The shuffle carries one row per qualifying user,
    never a serialized bitmap, and at 100 TB the first aggregation
    map-side-combines to distinct users per partition."""
    flags = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    return flags.agg(
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_and"),
        F.count(F.lit(1)).alias("n_or"),
        F.sum(F.when(F.col("in_a") + F.col("in_b") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_xor"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_andnot"),
    )


# --------------------------------------------------------------------------
# C124 — arrayAUC (exact ROC AUC with the midrank tie convention)
# --------------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS sv,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
agg AS (
  SELECT sv,
         CAST(count(*) FILTER (WHERE pos = 1) AS BIGINT) AS pos_c,
         CAST(count(*) FILTER (WHERE pos = 0) AS BIGINT) AS neg_c
  FROM scored GROUP BY sv
),
ranked AS (
  SELECT sv, pos_c, neg_c,
         sum(neg_c) OVER (ORDER BY sv
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_neg
  FROM agg
),
t AS (
  SELECT CAST(sum(pos_c) AS BIGINT) AS p,
         CAST(sum(neg_c) AS BIGINT) AS n,
         sum(CAST(pos_c AS HUGEINT)
             * CAST(2 * (cum_neg - neg_c) + neg_c AS HUGEINT)) AS two_w
  FROM ranked
)
SELECT p, n,
       CAST(two_w AS DOUBLE)
         / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE)) AS auc
FROM t
"""


@query("q_roc_auc", oracle=_AUC_ORACLE)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayAUC`` parity — exact ROC AUC of the first
    embedding component as a score for the label ≥ 5 class, with the
    midrank tie convention: 2·P·N·AUC = Σ_v pos(v)·(2·neg_below(v) +
    neg_at(v)) stays an exact integer (the C100 doubled-midrank
    recipe — AUC and Mann-Whitney U are the same statistic), finished
    by ONE IEEE division. Distinct-score table bounded by the
    quantized domain; the cumulative rides ranged_prefix. The eval-
    harness operator for any model-quality score stored as a column."""
    scored = load(spark, sf_dir, "embeddings").select(
        F.expr(
            "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"
        ).alias("sv"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("pos"),
    )
    agg = scored.groupBy("sv").agg(
        F.sum(F.when(F.col("pos") == 1, 1).otherwise(0)).cast("long").alias("pos_c"),
        F.sum(F.when(F.col("pos") == 0, 1).otherwise(0)).cast("long").alias("neg_c"),
    )
    ranked = ranged_prefix(agg, [F.col("sv")], sum_cols={"cum_neg": "neg_c"})
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    two_below_plus_at = (
        F.lit(2).cast("decimal(38,0)") * (dec("cum_neg") - dec("neg_c"))
        + dec("neg_c")
    )
    t = ranked.agg(
        F.sum("pos_c").cast("long").alias("p"),
        F.sum("neg_c").cast("long").alias("n"),
        F.sum(dec("pos_c") * two_below_plus_at).cast("decimal(38,0)").alias("two_w"),
    )
    return t.select(
        "p",
        "n",
        (
            F.col("two_w").cast("double")
            / (F.lit(2.0) * F.col("p").cast("double") * F.col("n").cast("double"))
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# C125 — corrMatrix (the matrix aggregate-combinator family)
# --------------------------------------------------------------------------

# Three integer series per event: value milli-units, seconds into 2024,
# and the props-JSON length — all exact.
_SERIES = [
    ("vm", _VM),
    ("xs", f"epoch_us(ts) // 1000000 - {_X0}"),
    ("pl", "CAST(length(props) AS BIGINT)"),
]
_SERIES_SPARK = {
    "vm": _VM,
    "xs": f"unix_micros(ts) div 1000000 - {_X0}",
    "pl": "CAST(length(props) AS BIGINT)",
}


def _corr_matrix_oracle() -> str:
    sel = ",\n         ".join(f"{expr} AS {n}" for n, expr in _SERIES)
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for n, _ in _SERIES:
        sums.append(f"CAST(sum({n}) AS HUGEINT) AS s_{n}")
    for i, (a, _) in enumerate(_SERIES):
        for b, _ in _SERIES[i:]:
            sums.append(
                f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)) AS s_{a}_{b}"
            )
    # central-moment terms reach ~n^2*var(xs) ~ 1e26 at sf1: name them
    # in a derived CTE and split-cast (portable_math.dcast) — DuckDB's
    # wide-int -> DOUBLE cast is not correctly rounded.
    derived = []
    for i, (a, _) in enumerate(_SERIES):
        for j, (b, _) in enumerate(_SERIES):
            if i > j:
                continue
            derived.append(
                f"CAST(n AS HUGEINT) * s_{a}_{b} - s_{a} * s_{b} AS d_{a}_{b}"
            )
    cells = []
    for i, (a, _) in enumerate(_SERIES):
        for j, (b, _) in enumerate(_SERIES):
            if i > j:
                continue
            cells.append(
                f"""SELECT '{a}' AS series_a, '{b}' AS series_b,
       {dcast(f'd_{a}_{b}', 'duck')}
       / sqrt({dcast(f'd_{a}_{a}', 'duck')}
              * {dcast(f'd_{b}_{b}', 'duck')})
         AS corr
FROM t2"""
            )
    return (
        f"WITH v AS (\n  SELECT {sel}\n  FROM events\n),\n"
        f"t AS (\n  SELECT {', '.join(sums)} FROM v\n),\n"
        f"t2 AS (\n  SELECT {', '.join(derived)} FROM t\n)\n"
        + "\nUNION ALL\n".join(cells)
    )


@query("q_corr_matrix", oracle=_corr_matrix_oracle())
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``corrMatrix`` parity: the full Pearson correlation
    matrix (upper triangle incl. diagonal) of three exact integer
    series — value milli-units, event seconds-into-2024, and props
    length. ONE aggregation computes every Σx, Σx², Σxy exactly
    (DECIMAL(38,0) ↔ HUGEINT); each matrix cell is the textbook
    (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) as one identical IEEE
    tree over exactly-cast integers. The matrix combinator costs the
    same single map-side-combinable pass as one corr — k(k+1)/2
    product sums in the partial state."""
    names = [n for n, _ in _SERIES]
    v = load(spark, sf_dir, "events").select(
        *[F.expr(_SERIES_SPARK[n]).alias(n) for n in names]
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    for n in names:
        aggs.append(F.sum(n).cast("decimal(38,0)").alias(f"s_{n}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(
                F.sum(dec(a) * dec(b)).cast("decimal(38,0)").alias(f"s_{a}_{b}")
            )
    t = v.agg(*aggs)
    nD = F.col("n").cast("decimal(38,0)")
    # split-cast the ~1e26 central-moment terms (see oracle note)
    t = t.select(
        *[
            (nD * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).alias(
                f"d_{a}_{b}"
            )
            for i, a in enumerate(names)
            for b in names[i:]
        ]
    ).localCheckpoint()

    def cell(a: str, b: str):
        num = F.expr(dcast(f"d_{a}_{b}", "spark"))
        da = F.expr(dcast(f"d_{a}_{a}", "spark"))
        db = F.expr(dcast(f"d_{b}_{b}", "spark"))
        return t.select(
            F.lit(a).alias("series_a"),
            F.lit(b).alias("series_b"),
            (num / F.sqrt(da * db)).alias("corr"),
        )

    out = None
    for i, a in enumerate(names):
        for b in names[i:]:
            c = cell(a, b)
            out = c if out is None else out.unionAll(c)
    return out
