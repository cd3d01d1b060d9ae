"""Independent plain-Python reimplementations of the round-6 parity
batch (operators/parity_ext.py) — the C76/C84 testing convention: the
DuckDB oracle catches engine-vs-engine drift, these catch
shared-formula mistakes (both engines computing the same wrong
thing)."""

from __future__ import annotations

import math

import pytest

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.parity_ext import (
    _BLOCKS,
    _GEO_R,
    _NEEDLES,
    _TAU_US,
    q_anova,
    q_exp_decay,
    q_geo_distance,
    q_multi_search,
    q_sparkbar,
    q_url_funcs,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .selectExpr("event_type", "value", "unix_micros(ts) AS tus", "day(ts) AS dom")
        .collect()
    )
    return [
        (r.event_type, int(math.floor(r.value * 1000 + 0.5)), r.tus, r.dom)
        for r in rows
    ]


def test_anova_matches_python(spark, sf_dir, events):
    got = q_anova(spark, sf_dir).collect()[0]
    by: dict[str, list[int]] = {}
    for et, vm, _, _ in events:
        by.setdefault(et, []).append(vm)
    k = len(by)
    n_total = sum(len(v) for v in by.values())
    ss_tot = sum(vm * vm for v in by.values() for vm in v)
    s_tot = sum(sum(v) for v in by.values())
    t_sum = sum(
        int(math.floor(float(sum(v)) ** 2 / float(len(v)))) for v in by.values()
    )
    grand = int(math.floor(float(s_tot) * float(s_tot) / float(n_total)))
    ssb, ssw = t_sum - grand, ss_tot - t_sum
    f = (float(ssb) / (k - 1)) / (float(ssw) / (n_total - k))
    assert got.k == k and got.n_total == n_total
    assert got.ss_between == pytest.approx(ssb / 1e6, rel=1e-12)
    assert got.ss_within == pytest.approx(ssw / 1e6, rel=1e-12)
    assert got.f_stat == pytest.approx(f, rel=1e-12)
    # sanity: the event types genuinely differ in mean, so F is positive
    assert got.f_stat > 0.0


def test_exp_decay_matches_python(spark, sf_dir, events):
    """Replays the PORTABLE exp kernel (pexp_neg_py — CPython doubles,
    a third IEEE implementation alongside JVM codegen and DuckDB), so
    the integer nano weights and both emitted doubles must now match
    BIT-EXACTLY; a separate grid test pins the kernel against libm
    truth (test_portable_math.py)."""
    from kafka_clickhouse_implementation_spark.functions.portable_math import (
        pexp_neg_py,
    )

    got = {r.event_type: r for r in q_exp_decay(spark, sf_dir).collect()}
    tmax = max(t for _, _, t, _ in events)
    agg: dict[str, list[int]] = {}
    for et, vm, tus, _ in events:
        x = float(tmax - tus) / float(_TAU_US)
        wn = int(math.floor(pexp_neg_py(x) * 1e9))
        agg.setdefault(et, []).append(vm * wn)
        agg.setdefault(et + "#w", []).append(wn)
    for et in {e for e, _, _, _ in events}:
        swv, sw = sum(agg[et]), sum(agg[et + "#w"])
        assert got[et].n == len(agg[et])
        assert got[et].decayed_sum == float(swv) / 1e12
        assert got[et].decayed_avg == float(swv) / float(sw) / 1e3
    # weights decay: at least one event type must have decayed_sum far
    # below its raw sum (the month-long tail decays to ~0)
    raw = {}
    for et, vm, _, _ in events:
        raw[et] = raw.get(et, 0) + vm
    assert all(got[et].decayed_sum < raw[et] / 1e3 for et in got)


def test_sparkbar_matches_python(spark, sf_dir, events):
    got = {r.event_type: r for r in q_sparkbar(spark, sf_dir).collect()}
    counts: dict[str, dict[int, int]] = {}
    for et, _, _, dom in events:
        counts.setdefault(et, {})[dom] = counts.setdefault(et, {}).get(dom, 0) + 1
    for et, per_day in counts.items():
        mx = max(per_day.values())
        bar = "".join(
            _BLOCKS[(per_day[d] * 7) // mx] for d in sorted(per_day)
        )
        assert got[et].bar == bar
        assert got[et].n_days == len(per_day)
        assert got[et].max_cnt == mx
        assert set(got[et].bar) <= set(_BLOCKS)


def test_geo_distance_matches_python(spark, sf_dir):
    """Replays the PORTABLE haversine kernel (psin/pcos/pasin_py —
    CPython doubles, a third IEEE implementation), so the integer mm
    distances and the per-nation averages must match BIT-EXACTLY (the
    old libm replay needed a one-quantum slack; the kernel removed the
    boundary dependence entirely)."""
    from kafka_clickhouse_implementation_spark.functions.portable_math import (
        PI180,
        pasin_py,
        pcos_py,
        psin_py,
    )

    got = {r.nation: r for r in q_geo_distance(spark, sf_dir).collect()}
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").collect()
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    names = {r.n_nationkey: r.n_name for r in n}
    rad = float(PI180)
    sums: dict[str, list[int]] = {}
    for r in c:
        lat1 = ((r.c_custkey * 37) % 17000) / 100.0 - 85.0
        lon1 = ((r.c_custkey * 73) % 35000) / 100.0 - 175.0
        lat2 = float((r.c_nationkey * 11) % 170) - 85.0
        lon2 = float((r.c_nationkey * 29) % 350) - 175.0
        sdlat = psin_py(((lat2 - lat1) * rad) / 2.0)
        sdlon = psin_py(((lon2 - lon1) * rad) / 2.0)
        clat1, clat2 = pcos_py(lat1 * rad), pcos_py(lat2 * rad)
        h = (sdlat * sdlat) + (((clat1 * clat2) * sdlon) * sdlon)
        z = min(math.sqrt(h), 1.0)
        d = 2.0 * _GEO_R * pasin_py(z)
        sums.setdefault(names[r.c_nationkey], []).append(int(math.floor(d * 1000.0)))
    for nation, dists in sums.items():
        assert got[nation].n_cust == len(dists)
        smm = sum(dists)
        assert got[nation].avg_dist_m == float(smm) / float(len(dists)) / 1000.0
        assert 0.0 < got[nation].avg_dist_m < math.pi * _GEO_R


def test_multi_search_matches_python(spark, sf_dir):
    got = {r.source: r for r in q_multi_search(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    agg: dict[str, dict[str, int]] = {}
    for r in docs:
        a = agg.setdefault(
            r.source, {"n_docs": 0, "n_any": 0, "pos": 0, **{n: 0 for n in _NEEDLES}}
        )
        a["n_docs"] += 1
        a["n_any"] += int(any(nd in r.text for nd in _NEEDLES))
        a["pos"] += r.text.find("spark") + 1  # find is 0-based, -1 absent
        for nd in _NEEDLES:
            a[nd] += r.text.count(nd)
    for src, a in agg.items():
        g = got[src]
        assert (g.n_docs, g.n_any, g.pos_spark_sum) == (
            a["n_docs"],
            a["n_any"],
            a["pos"],
        )
        assert (g.cnt_table, g.cnt_spark, g.cnt_merge, g.cnt_window) == (
            a["table"],
            a["spark"],
            a["merge"],
            a["window"],
        )


def test_url_funcs_matches_python(spark, sf_dir):
    got = {r.source: r for r in q_url_funcs(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select(
        "source", "lang", "doc_id"
    ).collect()
    agg: dict[str, dict] = {}
    for r in docs:
        url = (
            f"https://www.{r.source}.example.com/{r.lang}/doc-{r.doc_id}"
            f"?page={r.doc_id % 7}&ref=feed"
        )
        host = url.split("//")[1].split("/")[0]
        path = url.split("?")[0][8 + len(host) :]
        a = agg.setdefault(
            r.source, {"n": 0, "paths": set(), "pages": 0, "cut": set(), "host": host}
        )
        a["n"] += 1
        a["paths"].add(path)
        a["pages"] += r.doc_id % 7
        a["cut"].add(url.split("?")[0])
    for src, a in agg.items():
        g = got[src]
        assert g.n == a["n"]
        assert g.host_min == a["host"]
        assert g.tld_min == "com"
        assert g.n_paths == len(a["paths"])
        assert g.page_sum == a["pages"]
        assert g.n_cut == len(a["cut"])
        assert g.qs_min.startswith("page=")


def test_roc_auc_matches_python(spark, sf_dir):
    import math

    from kafka_clickhouse_implementation_spark.operators.stats_ext import q_roc_auc

    got = q_roc_auc(spark, sf_dir).collect()[0]
    rows = (
        load(spark, sf_dir, "embeddings").select("embedding", "label").collect()
    )
    pts = [
        (int(math.floor(float(r.embedding[0]) * 1e6 + 0.5)), int(r.label >= 5))
        for r in rows
    ]
    pos = [s for s, p in pts if p]
    neg = [s for s, p in pts if not p]
    # O(P*N) ground truth with the midrank tie convention
    w = sum(1.0 if sp > sn else 0.5 if sp == sn else 0.0 for sp in pos for sn in neg)
    auc = w / (len(pos) * len(neg))
    assert (got.p, got.n) == (len(pos), len(neg))
    assert got.auc == pytest.approx(auc, abs=1e-12)
    assert 0.0 <= got.auc <= 1.0


def test_corr_matrix_matches_python(spark, sf_dir):
    from kafka_clickhouse_implementation_spark.operators.stats_ext import (
        _X0,
        q_corr_matrix,
    )

    got = {(r.series_a, r.series_b): r.corr for r in q_corr_matrix(spark, sf_dir).collect()}
    rows = (
        load(spark, sf_dir, "events")
        .selectExpr("value", "unix_micros(ts) AS tus", "length(props) AS pl")
        .collect()
    )
    series = {
        "vm": [int(math.floor(r.value * 1000 + 0.5)) for r in rows],
        "xs": [r.tus // 1000000 - _X0 for r in rows],
        "pl": [r.pl for r in rows],
    }
    names = ["vm", "xs", "pl"]
    n = len(rows)
    for i, a in enumerate(names):
        for b in names[i:]:
            sa, sb = sum(series[a]), sum(series[b])
            sab = sum(x * y for x, y in zip(series[a], series[b]))
            saa = sum(x * x for x in series[a])
            sbb = sum(y * y for y in series[b])
            want = (n * sab - sa * sb) / math.sqrt(
                (n * saa - sa * sa) * (n * sbb - sb * sb)
            )
            assert got[(a, b)] == pytest.approx(want, rel=1e-12)
    # the diagonal is exactly 1 and every cell is a valid correlation
    for a in names:
        assert got[(a, a)] == pytest.approx(1.0, abs=1e-12)
    assert all(-1.0 <= v <= 1.0 for v in got.values())


# The former guard-band test (margins of libm exp/haversine values from
# their floor boundaries) is retired: round 8 found real sub-ULP-scale
# margins in the data (4.2e-7 at sf0.1 exp, 3.8e-6 at sf1 geo) and
# replaced the libm formulations with the portable polynomial kernels
# (functions/portable_math.py), which are boundary-proof by
# construction. The kernels themselves are pinned against libm truth in
# tests/test_portable_math.py, and tools/guard_band.py now monitors
# kernel-vs-libm accuracy over full datasets (invoked by
# make_scale_data and the sf1 sweep).


def test_tukey_fences_on_known_distribution(spark):
    """C156: a crafted group where the quartiles and outliers are known
    by hand — values 1..8 plus outliers 100 and -50. Q1 of
    [-50,1..8,100] (n=10, quantile_cont): p25 = 2.25, p75 = 6.75,
    IQR = 4.5 -> fences [-4.5, 13.5] -> one low, one high."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_clickhouse_implementation_spark.operators.parity_ext import (
        tukey_outliers,
    )

    rows = [("g", v) for v in list(range(1, 9)) + [100, -50]]
    vals = spark.createDataFrame(rows, "source string, x long")
    got = tukey_outliers(vals).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.p25, r.p75) == (10, 2.25, 6.75)
    assert (r.lo_fence, r.hi_fence) == (-4.5, 13.5)
    assert (r.n_low, r.n_high) == (1, 1)


def test_tukey_no_outliers_in_tight_group(spark):
    """A constant group has IQR 0 -> fences collapse to the value ->
    zero outliers (boundary values are NOT outliers: strict <, >)."""
    from kafka_clickhouse_implementation_spark.operators.parity_ext import (
        tukey_outliers,
    )

    vals = spark.createDataFrame(
        [("c", 7)] * 9, "source string, x long"
    )
    r = tukey_outliers(vals).collect()[0]
    assert (r.lo_fence, r.hi_fence, r.n_low, r.n_high) == (7.0, 7.0, 0, 0)


def test_uniq_upto_saturation(spark):
    """C159: clamps exactly at N+1 above the threshold, exact below."""
    from kafka_clickhouse_implementation_spark.operators.parity_ext import (
        q_uniq_upto,
    )
    from tests.conftest import SF_DIR

    for r in q_uniq_upto(spark, SF_DIR).collect():
        assert r.u_upto_10 == min(r.u_exact, 11)
        assert r.u_upto_50 == min(r.u_exact, 51)
        assert r.u_exact > 11  # the N=10 clamp actually engages


def test_histogram_eqw_geometry(spark):
    """C160: bins partition [min, max] with equal integer width; per
    group the counts sum to the group size; every value lands in
    [lo, hi] of its bin."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_implementation_spark.io import load
    from kafka_clickhouse_implementation_spark.operators.parity_ext import (
        HIST_BINS,
        q_histogram_eqw,
    )
    from tests.conftest import SF_DIR

    rows = q_histogram_eqw(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    mn, mx, total = li.select(
        F.min(F.col("l_quantity").cast("long")),
        F.max(F.col("l_quantity").cast("long")),
        F.count(F.lit(1)),
    ).first()
    w = (mx - mn + HIST_BINS) // HIST_BINS
    for r in rows:
        assert 0 <= r.bin < HIST_BINS
        assert r.lo == mn + r.bin * w and r.hi == r.lo + w - 1
    assert sum(r.n for r in rows) == total
