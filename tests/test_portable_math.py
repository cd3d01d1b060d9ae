"""Kernel pinning for functions/portable_math.py: the portable
polynomial exp/sin/cos/asin must (a) track stdlib libm truth to 1e-13
relative over dense grids covering the full input domains the geo /
exp-decay queries can produce, and (b) round-trip their SQL text
through BOTH engines bit-identically against the CPython replay — the
property the whole boundary-proof design rests on (three independent
IEEE implementations of the same op sequence must agree exactly).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_clickhouse_implementation_spark.functions.portable_math import (
    ASIN_COEFFS,
    PI_2,
    pasin,
    pasin_py,
    pcos,
    pcos_py,
    pexp_neg,
    pexp_neg_py,
    psin,
    psin_py,
)


def test_exp_kernel_tracks_libm():
    xs = [k * 0.0137 for k in range(0, 3300)]  # 0 .. 45.2 (past the table end)
    worst = 0.0
    for x in xs:
        truth = math.exp(-x)
        got = pexp_neg_py(x)
        if truth > 1e-18 and x < 45.0:
            worst = max(worst, abs(got - truth) / truth)
        elif x >= 45.0:
            assert got == 0.0
    assert worst < 1e-13, worst


def test_sin_cos_kernels_track_libm():
    worst_s = worst_c = 0.0
    for k in range(-3141, 3142):
        x = k / 1000.0
        worst_s = max(worst_s, abs(psin_py(x) - math.sin(x)))
        if abs(x) <= math.pi / 2:
            worst_c = max(worst_c, abs(pcos_py(x) - math.cos(x)))
    assert worst_s < 1e-13, worst_s
    assert worst_c < 1e-13, worst_c


def test_asin_kernel_tracks_libm():
    worst = 0.0
    for k in range(0, 10001):
        z = k / 10000.0
        worst = max(worst, abs(pasin_py(z) - math.asin(z)))
    assert pasin_py(1.0) == float(PI_2)
    assert worst < 5e-14, worst


def test_asin_series_is_monotone_and_bounded():
    last = -1.0
    for k in range(0, 101):
        z = k / 100.0
        v = pasin_py(z)
        assert 0.0 <= v <= float(PI_2) + 1e-15
        assert v >= last
        last = v


@pytest.fixture(scope="module")
def _duck():
    return duckdb.connect()


def test_sql_kernels_bit_identical_across_engines(spark, _duck):
    """The SAME generated SQL text, evaluated by Spark codegen, DuckDB,
    and the CPython replay, must produce bit-identical doubles for a
    grid of inputs — this is the exact property that makes the floor
    quantizations in q_exp_decay / q_geo_distance engine-invariant."""
    xs = [0.0, 1e-9, 0.1237, 0.5, 0.69999, 0.7, 0.70001, 0.9, 0.99999, 1.0]
    exp_xs = [0.0, 0.001, 0.5, 1.0, 2.7, 13.9, 29.99, 44.5, 47.0]
    sin_xs = [-3.1, -1.5, -0.001, 0.0, 0.3, 1.49, 3.05]

    # asin: bind z, tz, u, tu, and the t^16 powers exactly as the query does
    prelude = """
    WITH z0 AS (SELECT CAST(v AS DOUBLE) AS z FROM grid),
    z1 AS (SELECT z, z * z AS tz, sqrt((1.0 - z) / 2.0) AS u FROM z0),
    z2 AS (SELECT z, tz, u, u * u AS tu FROM z1),
    p2 AS (SELECT z, tz, u, tu, tz * tz AS tz2, tu * tu AS tu2 FROM z2),
    p4 AS (SELECT z, tz, u, tu, tz2 * tz2 AS tz4, tu2 * tu2 AS tu4 FROM p2),
    p8 AS (SELECT z, tz, u, tu, tz4 * tz4 AS tz8, tu4 * tu4 AS tu8 FROM p4),
    p16 AS (SELECT z, tz, u, tu, tz8 * tz8 AS tz16, tu8 * tu8 AS tu16 FROM p8)
    SELECT z, {expr} AS asz FROM p16 ORDER BY z
    """.format(expr=pasin("z", "tz", "tz16", "u", "tu", "tu16"))

    _duck.execute("CREATE OR REPLACE TABLE grid(v DOUBLE)")
    _duck.executemany("INSERT INTO grid VALUES (?)", [(x,) for x in xs])
    duck_rows = _duck.execute(prelude).fetchall()

    sdf = spark.createDataFrame([(x,) for x in xs], "v double")
    sdf.createOrReplaceTempView("grid")
    spark_rows = [tuple(r) for r in spark.sql(prelude).collect()]

    py_rows = [(x, pasin_py(x)) for x in sorted(xs)]
    assert [r[1] for r in duck_rows] == [r[1] for r in spark_rows] == [
        r[1] for r in py_rows
    ]

    # exp kernel
    eprel = """
    WITH x0 AS (SELECT CAST(v AS DOUBLE) AS x FROM egrid),
    x1 AS (SELECT x, CAST(floor(x) AS BIGINT) AS nn,
                  x - CAST(floor(x) AS DOUBLE) AS ff FROM x0)
    SELECT x, {expr} AS e FROM x1 ORDER BY x
    """.format(expr=pexp_neg("nn", "ff"))
    _duck.execute("CREATE OR REPLACE TABLE egrid(v DOUBLE)")
    _duck.executemany("INSERT INTO egrid VALUES (?)", [(x,) for x in exp_xs])
    duck_e = [r[1] for r in _duck.execute(eprel).fetchall()]
    edf = spark.createDataFrame([(x,) for x in exp_xs], "v double")
    edf.createOrReplaceTempView("egrid")
    spark_e = [r[1] for r in spark.sql(eprel).collect()]
    py_e = [pexp_neg_py(x) for x in sorted(exp_xs)]
    assert duck_e == spark_e == py_e

    # sin / cos kernels
    sprel = """
    WITH s0 AS (SELECT CAST(v AS DOUBLE) AS x FROM sgrid),
    s1 AS (SELECT x, x * x AS t FROM s0)
    SELECT x, {s} AS sv, {c} AS cv FROM s1 ORDER BY x
    """.format(s=psin("x", "t"), c=pcos("t"))
    _duck.execute("CREATE OR REPLACE TABLE sgrid(v DOUBLE)")
    _duck.executemany("INSERT INTO sgrid VALUES (?)", [(x,) for x in sin_xs])
    duck_s = _duck.execute(sprel).fetchall()
    sdf2 = spark.createDataFrame([(x,) for x in sin_xs], "v double")
    sdf2.createOrReplaceTempView("sgrid")
    spark_s = [tuple(r) for r in spark.sql(sprel).collect()]
    py_s = [(x, psin_py(x), pcos_py(x)) for x in sorted(sin_xs)]
    assert [(r[1], r[2]) for r in duck_s] == [(r[1], r[2]) for r in spark_s] == [
        (r[1], r[2]) for r in py_s
    ]


def test_asin_coefficient_integrity():
    """Spot-pin the Gauss series coefficients against exact rationals
    (c_k = C(2k,k) / (4^k (2k+1))) — a wrong comb/factorial would shift
    every distance by a consistent, oracle-invisible amount."""
    assert float(ASIN_COEFFS[0]) == 1.0
    assert float(ASIN_COEFFS[1]) == 1.0 / 6.0
    assert float(ASIN_COEFFS[2]) == 3.0 / 40.0
    assert float(ASIN_COEFFS[3]) == 15.0 / 336.0


def test_pln_kernel_tracks_libm():
    """pln accuracy vs math.log across the [2^-64, 1] domain."""
    import random

    from kafka_clickhouse_implementation_spark.functions.portable_math import (
        pln_py,
    )

    rng = random.Random(7)
    pts = [math.exp(rng.uniform(math.log(2**-64), 0.0)) for _ in range(5000)]
    pts += [1.0, 0.5, 2**-64, 2**-63, 1 - 2**-52, 1e-6, 1 / 3]
    for p in pts:
        assert abs(pln_py(p) - math.log(p)) <= 1e-12 * max(
            1.0, abs(math.log(p))
        ), p


def test_pln_sql_bit_identical_across_engines(spark, _duck):
    """The pln SQL text must evaluate to bit-identical doubles on
    Spark, DuckDB, and the CPython replay — the property that makes
    the unigram-LM Viterbi's nano-floor scores engine-invariant (a
    last-ulp ln disagreement there flips a DISCRETE argmax, so the
    guard-band recipe is not acceptable)."""
    import random

    from kafka_clickhouse_implementation_spark.functions.portable_math import (
        ln_exp_case,
        ln_scale_case,
        pln,
        pln_py,
    )

    rng = random.Random(11)
    xs = [math.exp(rng.uniform(math.log(2**-64), 0.0)) for _ in range(500)]
    xs += [1.0, 0.5, 0.25, 2**-64, 2**-63, 1 - 2**-52, 1 / 3, 0.7, 1e-6]
    prelude = """
    WITH a AS (SELECT CAST(v AS DOUBLE) AS p FROM lgrid),
    b AS (SELECT p, {e} AS e, p * {s} AS m FROM a),
    c AS (SELECT p, e, (m - 1.0) / (m + 1.0) AS t FROM b),
    d AS (SELECT p, e, t, t * t AS t2 FROM c)
    SELECT p, {lnp} AS lnp FROM d ORDER BY p
    """.format(e=ln_exp_case("p"), s=ln_scale_case("p"), lnp=pln("e", "t", "t2"))
    _duck.execute("CREATE OR REPLACE TABLE lgrid(v DOUBLE)")
    _duck.executemany("INSERT INTO lgrid VALUES (?)", [(x,) for x in xs])
    duck_rows = [r[1] for r in _duck.execute(prelude).fetchall()]
    sdf = spark.createDataFrame([(x,) for x in xs], "v double")
    sdf.createOrReplaceTempView("lgrid")
    spark_rows = [r[1] for r in spark.sql(prelude).collect()]
    py_rows = [pln_py(x) for x in sorted(xs)]
    assert duck_rows == spark_rows == py_rows


def test_dcast_is_correctly_rounded_on_both_engines(spark, _duck):
    """The split cast must equal CPython's correctly-rounded int->float
    on DECIMAL and HUGEINT inputs across 50-92 bits, both signs — the
    property DuckDB's native wide-int -> DOUBLE cast LACKS (which this
    test also pins, so a fixed upstream cast would be noticed)."""
    import random

    from kafka_clickhouse_implementation_spark.functions.portable_math import (
        dcast,
    )

    rng = random.Random(17)
    vals = [
        rng.getrandbits(rng.randint(50, 92)) * rng.choice([1, -1])
        for _ in range(800)
    ] + [0, 1, -1, 2**53, 2**53 + 1, -(2**92), 2**40, 2**40 - 1]
    _duck.execute("CREATE OR REPLACE TABLE dcg(v HUGEINT, w DECIMAL(38,0))")
    _duck.executemany("INSERT INTO dcg VALUES (?, ?)", [(v, v) for v in vals])
    duck_rows = _duck.execute(
        f"SELECT v, {dcast('v', 'duck')}, {dcast('w', 'duck')} FROM dcg"
    ).fetchall()
    for v, dv, dw in duck_rows:
        assert dv == float(int(v)) and dw == float(int(v)), v
    sdf = spark.createDataFrame([(str(v),) for v in vals], "s string").selectExpr(
        "CAST(s AS DECIMAL(38,0)) AS v"
    )
    for r in sdf.selectExpr("v", f"{dcast('v', 'spark')} AS d").collect():
        assert r.d == float(int(r.v)), r
    # and the naive DuckDB cast really is broken (the reason dcast exists)
    naive = _duck.execute("SELECT v, CAST(v AS DOUBLE) FROM dcg").fetchall()
    assert any(d != float(int(v)) for v, d in naive)
