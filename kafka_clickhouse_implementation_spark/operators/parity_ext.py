"""Round-6 ClickHouse-parity batch two — the remaining analytic
function families from the public ClickHouse surface, re-expressed
Spark-first (SURVEY §2 C104–C109):

- one-way ANOVA (``analysisOfVariance``)          → q_anova
- ``exponentialTimeDecayedSum/Avg``               → q_exp_decay
- ``sparkbar``                                    → q_sparkbar
- URL function family (``domain``, ``topLevelDomain``, ``path``,
  ``queryString``, ``extractURLParameter``,
  ``cutQueryString``)                             → q_url_funcs
- ``greatCircleDistance``                         → q_geo_distance
- ``multiSearchAny`` / ``countSubstrings`` /
  ``position``                                    → q_multi_search

Reference basis: the ClickHouse function surface the tutorial engine's
dashboard queries draw from (kafka+clickhouse.md:246-258 shows the
aggregation idiom; these families are public ClickHouse API).

Numeric discipline (same as analytics_ext/stats_ext): every
transcendental result (exp, the haversine sin/cos/asin chain) is
quantized to an integer unit immediately after the per-row IEEE tree
(floor(x * 1eK)) so that cross-partition summation happens ONLY over
exact integers (DECIMAL(38,0) ↔ HUGEINT) — accumulation order can
never leak into a hash. The k-group double terms in ANOVA are floored
to integer milli-units² for the same reason. String/URL operators are
exact by construction (integer + codepoint arithmetic only).

Scale: every query here is a scan → narrow projection → one map-side-
combinable hash aggregation (plus a broadcast of a ≤25-row dim or a
1-row global max). No windows, no self-joins, no Python. At 100 TB the
profile is identical to a plain sum(): one shuffle of tiny partial
states per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.functions.portable_math import (
    PI_2,
    PI180,
    dcast,
    pasin,
    pcos,
    pexp_neg,
    psin,
)
from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.registry import query

_VM = "CAST(floor(value * 1000 + 0.5) AS BIGINT)"  # milli-units (C76 recipe)


# --------------------------------------------------------------------------
# C104 — one-way ANOVA (ClickHouse ``analysisOfVariance`` / f-test)
# --------------------------------------------------------------------------

_ANOVA_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum({_VM}) AS HUGEINT) AS s_g,
         sum(CAST({_VM} AS HUGEINT) * CAST({_VM} AS HUGEINT)) AS ss_g
  FROM events GROUP BY event_type
),
g2 AS (
  SELECT n_g, s_g, ss_g, s_g * s_g AS sq_g FROM g
),
q AS (
  SELECT count(*) AS k,
         CAST(sum(n_g) AS BIGINT) AS n_total,
         CAST(sum(s_g) AS HUGEINT) AS s_tot,
         CAST(sum(ss_g) AS HUGEINT) AS ss_tot,
         CAST(sum(CAST(floor({dcast('sq_g', 'duck')} / CAST(n_g AS DOUBLE))
                       AS HUGEINT)) AS HUGEINT) AS t_sum
  FROM g2
),
q2 AS (
  SELECT k, n_total, ss_tot, t_sum, s_tot * s_tot AS sq_tot,
         ss_tot - t_sum AS ssw_i
  FROM q
),
q3 AS (
  SELECT k, n_total, ssw_i,
         t_sum - CAST(floor({dcast('sq_tot', 'duck')}
                            / CAST(n_total AS DOUBLE)) AS HUGEINT) AS ssb_i
  FROM q2
)
SELECT CAST(k AS BIGINT) AS k, n_total,
       {dcast('ssb_i', 'duck')} / 1e6 AS ss_between,
       {dcast('ssw_i', 'duck')} / 1e6 AS ss_within,
       ({dcast('ssb_i', 'duck')} / CAST(k - 1 AS DOUBLE))
       / ({dcast('ssw_i', 'duck')} / CAST(n_total - k AS DOUBLE))
         AS f_stat
FROM q3
"""


@query("q_anova", oracle=_ANOVA_ORACLE)
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``analysisOfVariance(value, group)`` parity: one-way
    ANOVA F-statistic of milli-quantized event value across the
    event_type groups. Per-group n, Σv, Σv² accumulate exactly
    (DECIMAL(38,0) ↔ HUGEINT); each group's between-term s_g²/n_g is
    ONE identical IEEE tree floored to integer milli-units² (so the
    k-term cross-group sum is again exact-integer — group iteration
    order cannot flip a hash); F finishes as one IEEE tree.

    Scale: two chained hash aggregations (group level → 1 row), both
    map-side combinable; Σv² of milli-values stays ~5 orders under the
    128-bit ceiling at 10^12 rows/group. No window, no shuffle beyond
    the k-row partial-state exchange."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_VM).alias("vm")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("vm").cast("decimal(38,0)").alias("s_g"),
        F.sum(dec("vm") * dec("vm")).cast("decimal(38,0)").alias("ss_g"),
    )
    # s_g² (~1e22) and s_tot² pass 2^53: split-cast on both engines
    # (portable_math.dcast) so the floors can never disagree.
    g2 = g.select("n_g", "s_g", "ss_g", (F.col("s_g") * F.col("s_g")).alias("sq_g"))
    term = F.floor(
        F.expr(dcast("sq_g", "spark")) / F.col("n_g").cast("double")
    ).cast("decimal(38,0)")
    q = g2.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("s_g").cast("decimal(38,0)").alias("s_tot"),
        F.sum("ss_g").cast("decimal(38,0)").alias("ss_tot"),
        F.sum(term).cast("decimal(38,0)").alias("t_sum"),
    )
    q2 = q.select(
        "k",
        "n_total",
        "ss_tot",
        "t_sum",
        (F.col("s_tot") * F.col("s_tot")).alias("sq_tot"),
        (F.col("ss_tot") - F.col("t_sum")).alias("ssw_i"),
    )
    q3 = q2.select(
        "k",
        "n_total",
        "ssw_i",
        (
            F.col("t_sum")
            - F.floor(
                F.expr(dcast("sq_tot", "spark")) / F.col("n_total").cast("double")
            ).cast("decimal(38,0)")
        ).alias("ssb_i"),
    )
    ssb = F.expr(dcast("ssb_i", "spark"))
    ssw = F.expr(dcast("ssw_i", "spark"))
    kD = F.col("k").cast("double")
    nD = F.col("n_total").cast("double")
    return q3.select(
        "k",
        "n_total",
        (ssb / F.lit(1e6)).alias("ss_between"),
        (ssw / F.lit(1e6)).alias("ss_within"),
        ((ssb / (kD - F.lit(1.0))) / (ssw / (nD - kD))).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# C105 — exponentialTimeDecayedSum / exponentialTimeDecayedAvg
# --------------------------------------------------------------------------

_TAU_US = 86_400_000_000  # one-day time constant, in microseconds

# the exp weight is computed by the PORTABLE kernel (functions/
# portable_math.pexp_neg): floor(x) / x-n / literal-table exp(-n) /
# 18-term Horner — identical IEEE text on both engines, so the nano
# floor can never disagree no matter how close a weight sits to a
# boundary (tools/guard_band.py found a 4.2e-7 margin at sf0.1 — the
# libm version was one ulp-drift away from a hash flip).
_DECAY_W_SQL = (
    f"CAST(floor({pexp_neg('nn', 'ff')} * 1e9) AS BIGINT)"
)


# shared projection-stage fragments (bound column names, so the Horner
# text references columns, never nested subtrees)
def _decay_x_sql(tus_sql: str) -> str:
    return f"CAST(tmax - {tus_sql} AS DOUBLE) / {float(_TAU_US)!r} AS x"


_DECAY_N_SQL = "CAST(floor(x) AS BIGINT) AS nn"
_DECAY_F_SQL = "x - CAST(floor(x) AS DOUBLE) AS ff"


_DECAY_ORACLE = f"""
WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
x0 AS (
  SELECT event_type, {_VM} AS vm, {_decay_x_sql('epoch_us(ts)')}
  FROM events, t
),
x1 AS (
  SELECT event_type, vm, {_DECAY_N_SQL}, {_DECAY_F_SQL} FROM x0
),
w AS (
  SELECT event_type, vm, {_DECAY_W_SQL} AS wn FROM x1
)
, sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(vm AS HUGEINT) * CAST(wn AS HUGEINT)) AS swv,
         CAST(sum(CAST(wn AS HUGEINT)) AS HUGEINT) AS sw
  FROM w GROUP BY event_type
)
SELECT event_type, n,
       CAST((CASE WHEN swv < 0 THEN -(CAST(abs(CAST(swv AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(swv AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(swv AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(swv AS HUGEINT)) % 1099511627776 AS DOUBLE)) END) / 1e12 AS DOUBLE) AS decayed_sum,
       (CASE WHEN swv < 0 THEN -(CAST(abs(CAST(swv AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(swv AS HUGEINT)) % 1099511627776 AS DOUBLE)) ELSE (CAST(abs(CAST(swv AS HUGEINT)) // 1099511627776 AS DOUBLE) * 1099511627776.0e0 + CAST(abs(CAST(swv AS HUGEINT)) % 1099511627776 AS DOUBLE)) END)
         / CAST(CAST(sw AS DOUBLE) AS DOUBLE) / 1e3
         AS decayed_avg
FROM sums
"""


@query("q_exp_decay", oracle=_DECAY_ORACLE)
def q_exp_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum/Avg(tau)(v, t)`` parity
    at the corpus's latest event time: per event_type, the exp-decayed
    value sum and weighted average with a one-day time constant.

    exp() is not correctly rounded across Java Math.exp and libm —
    and since round 8 it is not ASKED to be: the weight comes from the
    portable polynomial kernel (functions/portable_math.py), a finite
    sequence of correctly-rounded IEEE ops stated identically on both
    engines, so the integer NANO-unit quantization is boundary-proof
    by construction (no guard band needed). vm·w products (≤ 5e14/row)
    and Σw then accumulate exactly in DECIMAL(38,0) ↔ HUGEINT; the two
    emitted doubles are single IEEE divisions. The global max-ts is a
    1-row aggregate broadcast via crossJoin (the cohort-stat pattern,
    analytics_ext C76). Decayed sums are mergeable partial states —
    this is exactly the aggregate a streaming `-State` would keep.
    Cost shape is unchanged: the kernel is one narrow codegen
    projection (a CASE table + 18 fused multiply-adds per row)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr(_VM).alias("vm"), F.expr("unix_micros(ts)").alias("tus")
    )
    tmax = ev.agg(F.max("tus").alias("tmax"))
    w = (
        ev.crossJoin(F.broadcast(tmax))
        .selectExpr("event_type", "vm", _decay_x_sql("tus"))
        .selectExpr("event_type", "vm", _DECAY_N_SQL, _DECAY_F_SQL)
        .selectExpr("event_type", "vm", f"{_DECAY_W_SQL} AS wn")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("vm") * dec("wn")).cast("decimal(38,0)").alias("swv"),
        F.sum("wn").cast("decimal(38,0)").alias("sw"),
    )
    # swv (vm*wn sums) reaches ~1e20 at sf1: split-cast on both engines
    return s.select(
        "event_type",
        "n",
        (F.expr(dcast("swv", "spark")) / F.lit(1e12)).alias("decayed_sum"),
        (
            F.expr(dcast("swv", "spark"))
            / F.col("sw").cast("double")
            / F.lit(1e3)
        ).alias("decayed_avg"),
    )


# --------------------------------------------------------------------------
# C106 — sparkbar
# --------------------------------------------------------------------------

_BLOCKS = "▁▂▃▄▅▆▇█"

_SPARKBAR_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS dom, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, max(cnt) AS mx, CAST(count(*) AS BIGINT) AS n_days,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM d GROUP BY event_type
)
SELECT d.event_type, m.n_days, m.max_cnt,
       translate(string_agg(substr('12345678',
                                   CAST(1 + (d.cnt * 7) // m.mx AS INTEGER), 1),
                            '' ORDER BY d.dom),
                 '12345678', '▁▂▃▄▅▆▇█') AS bar
FROM d JOIN m ON d.event_type = m.event_type
GROUP BY d.event_type, m.n_days, m.max_cnt
"""


@query("q_sparkbar", oracle=_SPARKBAR_ORACLE)
def q_sparkbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sparkbar(buckets)`` parity: per event_type, the
    unicode block-glyph bar of daily event counts over the month.
    Level mapping is pure integer arithmetic (1 + cnt*7 // max → the
    eight U+2581..2588 glyphs via translate), so the bar string is
    exact on both engines. Spark composes the ordered bar with
    sort_array(collect_list(struct(day, glyph))) — per-group state is
    ≤31 day entries regardless of row count; the heavy lifting is the
    day-level count aggregation, which is map-side combinable."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.dayofmonth("ts").cast("long").alias("dom")
    )
    d = ev.groupBy("event_type", "dom").agg(F.count(F.lit(1)).alias("cnt"))
    m = d.groupBy("event_type").agg(
        F.max("cnt").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    j = d.join(F.broadcast(m), "event_type").select(
        "event_type",
        "n_days",
        "max_cnt",
        "dom",
        F.expr("substr('12345678', CAST(1 + (cnt * 7) div mx AS INT), 1)").alias("g"),
    )
    return (
        j.groupBy("event_type", "n_days", "max_cnt")
        .agg(
            F.concat_ws(
                "",
                F.expr("transform(array_sort(collect_list(struct(dom, g))), x -> x.g)"),
            ).alias("digits")
        )
        .select(
            "event_type",
            "n_days",
            "max_cnt",
            F.translate(F.col("digits"), "12345678", _BLOCKS).alias("bar"),
        )
    )


# --------------------------------------------------------------------------
# C107 — URL function family
# --------------------------------------------------------------------------

_URL_EXPR = (
    "concat('https://www.', source, '.example.com/', lang, '/doc-', "
    "CAST(doc_id AS VARCHAR), '?page=', CAST(doc_id % 7 AS VARCHAR), '&ref=feed')"
)
_URL_EXPR_SPARK = (
    "concat('https://www.', source, '.example.com/', lang, '/doc-', "
    "CAST(doc_id AS STRING), '?page=', CAST(doc_id % 7 AS STRING), '&ref=feed')"
)

_URL_ORACLE = f"""
WITH u AS (SELECT source, {_URL_EXPR} AS url FROM documents),
p AS (
  SELECT source,
         split_part(split_part(url, '//', 2), '/', 1) AS host,
         regexp_extract(split_part(split_part(url, '//', 2), '/', 1),
                        '\\.([a-z]+)$', 1) AS tld,
         substr(split_part(url, '?', 1),
                8 + length(split_part(split_part(url, '//', 2), '/', 1)) + 1)
           AS path,
         split_part(url, '?', 2) AS query_string,
         CAST(regexp_extract(url, 'page=([0-9]+)', 1) AS BIGINT) AS page,
         split_part(url, '?', 1) AS cut_url
  FROM u
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n,
       min(host) AS host_min,
       min(tld) AS tld_min,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(sum(page) AS BIGINT) AS page_sum,
       CAST(count(DISTINCT cut_url) AS BIGINT) AS n_cut,
       min(query_string) AS qs_min
FROM p GROUP BY source
"""


@query("q_url_funcs", oracle=_URL_ORACLE)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function family parity: ``domain`` (host),
    ``topLevelDomain``, ``path``, ``queryString``,
    ``extractURLParameter('page')``, ``cutQueryString`` — implemented
    with the portable split/substr/regexp subset that Java regex and
    RE2 agree on (anchored lowercase classes only), over a
    deterministic URL synthesized from documents columns (no
    network). All extractions are exact string/codepoint arithmetic;
    the per-source rollup is one hash aggregation. The two
    count(DISTINCT) share one shuffle under AQE; everything stays in
    whole-stage codegen."""
    docs = load(spark, sf_dir, "documents").selectExpr(
        "source", f"{_URL_EXPR_SPARK} AS url"
    )
    host = F.expr("split_part(split_part(url, '//', 2), '/', 1)")
    p = docs.select(
        "source",
        host.alias("host"),
        F.regexp_extract(host, r"\.([a-z]+)$", 1).alias("tld"),
        F.expr(
            "substr(split_part(url, '?', 1), "
            "8 + length(split_part(split_part(url, '//', 2), '/', 1)) + 1)"
        ).alias("path"),
        F.expr("split_part(url, '?', 2)").alias("query_string"),
        F.regexp_extract("url", "page=([0-9]+)", 1).cast("long").alias("page"),
        F.expr("split_part(url, '?', 1)").alias("cut_url"),
    )
    return p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("host").alias("host_min"),
        F.min("tld").alias("tld_min"),
        F.countDistinct("path").alias("n_paths"),
        F.sum("page").cast("long").alias("page_sum"),
        F.countDistinct("cut_url").alias("n_cut"),
        F.min("query_string").alias("qs_min"),
    )


# --------------------------------------------------------------------------
# C108 — greatCircleDistance
# --------------------------------------------------------------------------

_GEO_R = 6_371_000.0  # ClickHouse's mean-Earth radius, metres

# Deterministic synthetic coordinates (no geo columns in TPC-H):
# customers get a point from their key, nations an anchor from theirs.
_LATC = "(CAST((c_custkey * 37) % 17000 AS DOUBLE) / 100.0 - 85.0)"
_LONC = "(CAST((c_custkey * 73) % 35000 AS DOUBLE) / 100.0 - 175.0)"
_LATN = "(CAST((n_nationkey * 11) % 170 AS DOUBLE) - 85.0)"
_LONN = "(CAST((n_nationkey * 29) % 350 AS DOUBLE) - 175.0)"

_HAVERSINE = (
    "2.0 * {R} * asin(sqrt("
    "  sin(radians(({lat2}) - ({lat1})) / 2.0) * sin(radians(({lat2}) - ({lat1})) / 2.0)"
    "  + cos(radians({lat1})) * cos(radians({lat2}))"
    "    * sin(radians(({lon2}) - ({lon1})) / 2.0)"
    "    * sin(radians(({lon2}) - ({lon1})) / 2.0)))"
)

_GEO_DIST_MM = (
    "CAST(floor(("
    + _HAVERSINE.format(R=_GEO_R, lat1=_LATC, lon1=_LONC, lat2=_LATN, lon2=_LONN)
    + ") * 1000.0) AS BIGINT)"
)

# Portable-haversine projection stages (round 8): every trig value is
# a literal-coefficient polynomial from functions/portable_math.py, so
# the mm floor is boundary-proof by construction — tools/guard_band.py
# measured real 3.8e-6 margins at sf1 under the old libm formulation,
# inside the observed cross-libm disagreement scale.
_GEO_STAGE_RAD = [
    f"(({_LATC}) * {PI180}) AS rlat1",
    f"(({_LATN}) * {PI180}) AS rlat2",
    f"((({_LATN}) - ({_LATC})) * {PI180}) / 2.0 AS hdlat",
    f"((({_LONN}) - ({_LONC})) * {PI180}) / 2.0 AS hdlon",
]
_GEO_STAGE_SQ = [
    "rlat1 * rlat1 AS t1", "rlat2 * rlat2 AS t2",
    "hdlat * hdlat AS td1", "hdlon * hdlon AS td2",
]
_GEO_STAGE_TRIG = [
    f"{psin('hdlat', 'td1')} AS sdlat",
    f"{psin('hdlon', 'td2')} AS sdlon",
    f"{pcos('t1')} AS clat1",
    f"{pcos('t2')} AS clat2",
]
# h <= 1 mathematically; least() guards the ulp-above-1 case so the
# half-angle branch's sqrt((1-z)/2) can never see a negative argument
_GEO_STAGE_Z = [
    "least(sqrt((sdlat * sdlat) + (((clat1 * clat2) * sdlon) * sdlon)), 1.0) AS z",
]
_GEO_STAGE_ZU = [
    "z * z AS tz",
    "sqrt((1.0 - z) / 2.0) AS u",
]
_GEO_STAGE_TU = ["u * u AS tu"]
# t^16 by repeated squaring, each power a bound column (the chunked
# Horner stitches 16-coefficient blocks with these)
_GEO_STAGE_P2 = ["tz * tz AS tz2", "tu * tu AS tu2"]
_GEO_STAGE_P4 = ["tz2 * tz2 AS tz4", "tu2 * tu2 AS tu4"]
_GEO_STAGE_P8 = ["tz4 * tz4 AS tz8", "tu4 * tu4 AS tu8"]
_GEO_STAGE_P16 = ["tz8 * tz8 AS tz16", "tu8 * tu8 AS tu16"]
_GEO_STAGE_DMM = [
    f"CAST(floor(2.0 * {_GEO_R!r} * "
    f"{pasin('z', 'tz', 'tz16', 'u', 'tu', 'tu16')} * 1000.0)"
    " AS BIGINT) AS dmm",
]


def _geo_cte(select_cols: list[str], prev: str, keep: str) -> str:
    return f"SELECT {keep}, {', '.join(select_cols)} FROM {prev}"


_GEO_ORACLE = f"""
WITH g0 AS (
  SELECT n.n_name AS nation, c.c_custkey, c.c_nationkey, n.n_nationkey
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
g1 AS ({_geo_cte(_GEO_STAGE_RAD, 'g0', 'nation')}),
g2 AS ({_geo_cte(_GEO_STAGE_SQ, 'g1', 'nation, rlat1, rlat2, hdlat, hdlon')}),
g3 AS ({_geo_cte(_GEO_STAGE_TRIG, 'g2', 'nation')}),
g4 AS ({_geo_cte(_GEO_STAGE_Z, 'g3', 'nation')}),
g5 AS ({_geo_cte(_GEO_STAGE_ZU, 'g4', 'nation, z')}),
g5b AS ({_geo_cte(_GEO_STAGE_TU, 'g5', 'nation, z, tz, u')}),
p2 AS ({_geo_cte(_GEO_STAGE_P2, 'g5b', 'nation, z, tz, u, tu')}),
p4 AS ({_geo_cte(_GEO_STAGE_P4, 'p2', 'nation, z, tz, u, tu')}),
p8 AS ({_geo_cte(_GEO_STAGE_P8, 'p4', 'nation, z, tz, u, tu')}),
p16 AS ({_geo_cte(_GEO_STAGE_P16, 'p8', 'nation, z, tz, u, tu')}),
g6 AS ({_geo_cte(_GEO_STAGE_DMM, 'p16', 'nation')})
, g7 AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(CAST(dmm AS HUGEINT)) AS HUGEINT) AS smm
  FROM g6 GROUP BY nation
)
SELECT nation, n_cust,
       CAST({dcast('smm', 'duck')}
            / n_cust / 1000.0 AS DOUBLE) AS avg_dist_m
FROM g7
"""


@query("q_geo_distance", oracle=_GEO_ORACLE)
def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``greatCircleDistance`` parity: haversine distance
    (R = 6 371 000 m, ClickHouse's constant) from each customer's
    deterministic synthetic coordinate to its nation's anchor,
    averaged per nation. Since round 8 the whole sin/cos/asin chain is
    the PORTABLE polynomial kernel (functions/portable_math.py): both
    engines evaluate the identical finite IEEE op sequence, so the
    integer-millimetre quantization before the exact per-nation sum
    can never flip across engines — no data-margin guard required
    (the libm formulation measured margins as low as 3.8e-6 mm at sf1).
    Broadcast 25-row nation join; the kernel stages are narrow
    projections; one hash aggregation."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .selectExpr("n_name AS nation", "c_custkey", "c_nationkey", "n_nationkey")
        .selectExpr("nation", *_GEO_STAGE_RAD)
        .selectExpr("nation", "rlat1", "rlat2", "hdlat", "hdlon", *_GEO_STAGE_SQ)
        .selectExpr("nation", *_GEO_STAGE_TRIG)
        .selectExpr("nation", *_GEO_STAGE_Z)
        .selectExpr("nation", "z", *_GEO_STAGE_ZU)
        .selectExpr("nation", "z", "tz", "u", *_GEO_STAGE_TU)
        .selectExpr("nation", "z", "tz", "u", "tu", *_GEO_STAGE_P2)
        .selectExpr("nation", "z", "tz", "u", "tu", *_GEO_STAGE_P4)
        .selectExpr("nation", "z", "tz", "u", "tu", *_GEO_STAGE_P8)
        .selectExpr("nation", "z", "tz", "u", "tu", *_GEO_STAGE_P16)
        .selectExpr("nation", *_GEO_STAGE_DMM)
    )
    return (
        j.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("dmm").cast("decimal(38,0)")).alias("smm"),
        )
        .select(
            "nation",
            F.col("n_cust").cast("long").alias("n_cust"),
            # smm ~ 1.5e15 at sf1 — within 6x of 2^53: split-cast
            (
                F.expr(dcast("smm", "spark"))
                / F.col("n_cust").cast("double")
                / F.lit(1000.0)
            ).alias("avg_dist_m"),
        )
    )


# --------------------------------------------------------------------------
# C109 — multiSearchAny / countSubstrings / position
# --------------------------------------------------------------------------

_NEEDLES = ("table", "spark", "merge", "window")


def _cnt_expr(needle: str) -> str:
    ln = len(needle)
    return (
        f"CAST((length(text) - length(replace(text, '{needle}', ''))) / {ln} AS BIGINT)"
    )


_MULTI_ORACLE = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN strpos(text, 'table') > 0 OR strpos(text, 'spark') > 0
                       OR strpos(text, 'merge') > 0 OR strpos(text, 'window') > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
       CAST(sum({_cnt_expr("table")}) AS BIGINT) AS cnt_table,
       CAST(sum({_cnt_expr("spark")}) AS BIGINT) AS cnt_spark,
       CAST(sum({_cnt_expr("merge")}) AS BIGINT) AS cnt_merge,
       CAST(sum({_cnt_expr("window")}) AS BIGINT) AS cnt_window,
       CAST(sum(strpos(text, 'spark')) AS BIGINT) AS pos_spark_sum
FROM documents GROUP BY source
"""


@query("q_multi_search", oracle=_MULTI_ORACLE)
def q_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``multiSearchAny`` / ``countSubstrings`` /
    ``position`` parity over the documents corpus: per source, the
    count of docs matching ANY of four needles, per-needle substring
    occurrence totals (the length-difference identity — exact integer
    arithmetic, no regex), and the 1-based first-position sum for one
    needle (Spark instr ≡ DuckDB strpos, both 0 when absent). One
    projection + one hash aggregation, all in whole-stage codegen —
    the multi-needle scan costs one pass over the text bytes."""
    d = load(spark, sf_dir, "documents")
    any_flag = None
    cols = [F.count(F.lit(1)).alias("n_docs")]
    for nd in _NEEDLES:
        flag = F.instr(F.col("text"), nd) > 0
        any_flag = flag if any_flag is None else (any_flag | flag)
    d2 = d.select(
        "source",
        "text",
        F.when(any_flag, 1).otherwise(0).alias("any_hit"),
        *[
            (
                (F.length("text") - F.length(F.replace(F.col("text"), F.lit(nd))))
                / F.lit(len(nd))
            )
            .cast("long")
            .alias(f"c_{nd}")
            for nd in _NEEDLES
        ],
        F.instr(F.col("text"), "spark").alias("pos_spark"),
    )
    return d2.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("any_hit").cast("long").alias("n_any"),
        F.sum("c_table").cast("long").alias("cnt_table"),
        F.sum("c_spark").cast("long").alias("cnt_spark"),
        F.sum("c_merge").cast("long").alias("cnt_merge"),
        F.sum("c_window").cast("long").alias("cnt_window"),
        F.sum("pos_spark").cast("long").alias("pos_spark_sum"),
    )


# ---------------------------------------------------------------------
# Tukey-fence outlier detection — round 10 (C156): ClickHouse
# ``seriesOutliersDetectTukey`` parity, grouped. Fences are the classic
# Q1 - 1.5*IQR / Q3 + 1.5*IQR over EXACT interpolated quartiles.
#
# Portability rides the C38 argument: the measure (document length in
# characters) is INTEGER-valued and the quantile fractions are
# quarters, so Q1/Q3 are exact binary rationals (denominator 4) and
# identical doubles on both engines; 1.5*IQR and both fences then stay
# exact binary rationals (denominator 8) under correctly-rounded IEEE
# ops — the fence comparison against integer lengths is deterministic,
# no guard band needed. The fence dag is interpolated VERBATIM into
# both engines' SQL.
#
# Scale shape: percentile is a partial aggregate (value histogram per
# partition, one final interpolation per group); the per-group fence
# table is group-cardinality-sized and BROADCASTS back onto the scan
# for the outlier count — two passes, no row-level window.
# ---------------------------------------------------------------------

_FENCE_LO_SQL = "p25 - 1.5e0 * (p75 - p25)"
_FENCE_HI_SQL = "p75 + 1.5e0 * (p75 - p25)"

_TUKEY_ORACLE = f"""
WITH v AS (
  SELECT source, CAST(length(text) AS BIGINT) AS x FROM documents
), q AS (
  SELECT source,
         quantile_cont(x, 0.25) AS p25,
         quantile_cont(x, 0.75) AS p75,
         CAST(count(*) AS BIGINT) AS n
  FROM v GROUP BY source
), f AS (
  SELECT source, p25, p75, n,
         {_FENCE_LO_SQL} AS lo_fence, {_FENCE_HI_SQL} AS hi_fence
  FROM q
)
SELECT f.source, f.n, f.p25, f.p75, f.lo_fence, f.hi_fence,
       CAST(sum(CASE WHEN v.x < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(sum(CASE WHEN v.x > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high
FROM v JOIN f USING (source)
GROUP BY f.source, f.n, f.p25, f.p75, f.lo_fence, f.hi_fence
"""


def tukey_outliers(vals: DataFrame) -> DataFrame:
    """(source, n, p25, p75, lo_fence, hi_fence, n_low, n_high) over a
    (source, x) frame with INTEGER-valued x — see section comment for
    why the fences are engine-exact."""
    q = vals.groupBy("source").agg(
        F.expr("percentile(x, 0.25D)").alias("p25"),
        F.expr("percentile(x, 0.75D)").alias("p75"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    f = q.selectExpr(
        "source", "p25", "p75", "n",
        f"{_FENCE_LO_SQL} AS lo_fence", f"{_FENCE_HI_SQL} AS hi_fence",
    )
    return (
        vals.join(F.broadcast(f), "source")
        .groupBy("source", "n", "p25", "p75", "lo_fence", "hi_fence")
        .agg(
            F.sum(F.when(F.col("x") < F.col("lo_fence"), 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("x") > F.col("hi_fence"), 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .select("source", "n", "p25", "p75", "lo_fence", "hi_fence",
                "n_low", "n_high")
    )


@query("q_tukey_outliers", oracle=_TUKEY_ORACLE)
def q_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C156: per-source Tukey-fence outlier detection over document
    lengths (ClickHouse ``seriesOutliersDetectTukey`` semantics,
    grouped). The hash certifies the exact quartiles, the fence dag,
    and both tail counts."""
    docs = load(spark, sf_dir, "documents")
    vals = docs.select(
        "source", F.length("text").cast("long").alias("x")
    )
    return tukey_outliers(vals)


# ---------------------------------------------------------------------
# uniqUpTo — round 10 (C159): ClickHouse ``uniqUpTo(N)(x)`` parity —
# the exact distinct count while it is <= N, saturating at N + 1 (the
# "more than N" signal dashboards use for cheap cardinality gates).
# Semantically least(count(distinct x), N+1); Spark's count_distinct
# already runs as a partial-aggregated two-stage plan. A 100 TB
# deployment at very high cardinality would swap in a true bounded
# (N+1)-element set-union aggregate — state O(N) instead of O(d) —
# with identical output; at that point C31's HLL sketch is usually the
# better answer, which is why this stays the exact formulation.
# ---------------------------------------------------------------------

UNIQ_UPTO_N = (10, 50)


@query(
    "q_uniq_upto",
    oracle=f"""
    SELECT event_type,
           least(CAST(count(DISTINCT user_id) AS BIGINT), {UNIQ_UPTO_N[0] + 1})
             AS u_upto_{UNIQ_UPTO_N[0]},
           least(CAST(count(DISTINCT user_id) AS BIGINT), {UNIQ_UPTO_N[1] + 1})
             AS u_upto_{UNIQ_UPTO_N[1]},
           CAST(count(DISTINCT user_id) AS BIGINT) AS u_exact
    FROM events GROUP BY event_type
    """,
)
def q_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C159: saturating distinct counts per event type at two
    thresholds next to the exact count — one saturated (N=10) and one
    exact (N=50) at every bench sf, so both sides of the clamp are
    exercised."""
    ev = load(spark, sf_dir, "events")
    u = F.count_distinct(F.col("user_id")).cast("long")
    return ev.groupBy("event_type").agg(
        F.least(u, F.lit(UNIQ_UPTO_N[0] + 1)).alias(f"u_upto_{UNIQ_UPTO_N[0]}"),
        F.least(u, F.lit(UNIQ_UPTO_N[1] + 1)).alias(f"u_upto_{UNIQ_UPTO_N[1]}"),
        u.alias("u_exact"),
    )


# ---------------------------------------------------------------------
# Equal-width histogram with DATA-DERIVED geometry — round 10 (C160):
# the deterministic variant of ClickHouse ``histogram(bins)(x)`` (which
# takes a bin COUNT and derives boundaries from the data — unlike the
# r1 q_histogram whose width is a fixed literal) (whose adaptive streaming-merge
# bins are merge-order-dependent BY DESIGN — same determinism trade as
# C29's one-shot MG sketch, documented not hidden). Bin geometry is
# pure integer arithmetic over the measure's min/max:
#     width = (max - min + bins) div bins   (ceil division, >= 1)
#     bin   = (x - min) div width
# so boundaries, assignment and counts are all exact BIGINTs. The
# 1-row (min, max) aggregate broadcasts back onto the scan — two
# passes, the same shape ClickHouse's two-level hash agg uses.
# ---------------------------------------------------------------------

HIST_BINS = 10


@query(
    "q_histogram_eqw",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem
    ), mm AS (
      SELECT CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx
      FROM v
    ), g AS (
      SELECT CAST((mx - mn + {HIST_BINS}) // {HIST_BINS} AS BIGINT) AS w, mn
      FROM mm
    )
    SELECT v.l_returnflag,
           CAST((v.x - g.mn) // g.w AS BIGINT) AS bin,
           CAST(g.mn + ((v.x - g.mn) // g.w) * g.w AS BIGINT) AS lo,
           CAST(g.mn + ((v.x - g.mn) // g.w + 1) * g.w - 1 AS BIGINT) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM v, g
    GROUP BY v.l_returnflag, bin, lo, hi
    """,
)
def q_histogram_eqw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C160: per-returnflag equal-width histogram of order quantities —
    HIST_BINS bins over the GLOBAL [min, max] so bins align across
    groups (the dashboard overlay convention). All-integer geometry;
    value-hashed bins, boundaries and counts."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select("l_returnflag", F.col("l_quantity").cast("long").alias("x"))
    g = v.agg(
        F.min("x").cast("long").alias("mn"), F.max("x").cast("long").alias("mx")
    ).selectExpr(f"CAST((mx - mn + {HIST_BINS}) div {HIST_BINS} AS BIGINT) AS w", "mn")
    return (
        v.crossJoin(F.broadcast(g))
        .selectExpr(
            "l_returnflag",
            "CAST((x - mn) div w AS BIGINT) AS bin",
            "CAST(mn + ((x - mn) div w) * w AS BIGINT) AS lo",
            "CAST(mn + ((x - mn) div w + 1) * w - 1 AS BIGINT) AS hi",
        )
        .groupBy("l_returnflag", "bin", "lo", "hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------
# C173 — quantileTiming (round 11): ClickHouse's fixed-resolution
# timing quantile (the sketch latency dashboards actually run): exact
# to 1 unit below 1024, rounded DOWN to a multiple of 16 from 1024 to
# the 30000 cap, everything above counted AS the cap — the documented
# TimingCounter binning. Because the binning is pure integer
# arithmetic, the whole sketch is ORACLE-EXACT here (unlike
# quantileTDigest, which stays rows-only by design): states are
# (bin, count) tables — mergeable map-side partials bounded by ~3k
# bins — and the quantile is the smallest bin whose cumulative count
# reaches ceil(q * n), i.e. the discrete (lower) quantile ClickHouse's
# timing family returns.
#
# Timing values are synthesized from the events fact: centi-units of
# `value` (CAST(floor(value * 100) AS BIGINT)) — non-negative
# integers spanning all three resolution regimes at every test SF.
#
# Scale shape: one scan → per-(type, bin) counts with map-side
# combine (bin cardinality <= 1024 + 1813 + 1); the cumulative scan is
# a per-type window over those bins. At 100 TB this is the same
# profile as any grouped count.
# ---------------------------------------------------------------------

_TIMING_V = "CAST(floor(value * 100) AS BIGINT)"
_TIMING_BIN = (
    f"CASE WHEN {_TIMING_V} < 1024 THEN {_TIMING_V}"
    f" WHEN {_TIMING_V} <= 30000 THEN ({_TIMING_V} // 16) * 16"
    " ELSE 30000 END"
)
_TIMING_QS = (50, 90, 99)  # percent levels reported


@query(
    "q_quantile_timing",
    oracle=f"""
    WITH bins AS (
      SELECT event_type, CAST({_TIMING_BIN} AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, b,
             sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM bins
    )
    SELECT event_type,
           {", ".join(
               f"CAST(min(CASE WHEN cc * 100 >= {q} * n THEN b END) AS BIGINT)"
               f" AS p{q}_timing" for q in _TIMING_QS)},
           CAST(max(n) AS BIGINT) AS n
    FROM cum GROUP BY event_type
    """,
)
def q_quantile_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C173: quantileTiming(0.5/0.9/0.99) per event type over
    centi-unit timings — the ClickHouse TimingCounter binning (exact
    < 1024, 16-unit steps to the 30000 cap, cap above) replayed
    bin-exactly: the hash certifies the binning rules, the mergeable
    counts, and the discrete cumulative-threshold quantile (cc*100 >=
    q*n — pure integer compare, no float anywhere)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    # Spark div for the 16-step (values are non-negative, so div == //)
    bin_sql = _TIMING_BIN.replace("//", "div")
    bins = (
        ev.selectExpr("event_type", f"CAST({bin_sql} AS BIGINT) AS b")
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wc = W.partitionBy("event_type").orderBy("b")
    wn = W.partitionBy("event_type")
    cum = bins.select(
        "event_type",
        "b",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wn).alias("n"),
    )
    aggs = [
        F.min(F.when(F.col("cc") * 100 >= q * F.col("n"), F.col("b")))
        .cast("long")
        .alias(f"p{q}_timing")
        for q in _TIMING_QS
    ]
    return cum.groupBy("event_type").agg(*aggs, F.max("n").cast("long").alias("n"))
