"""Independent plain-Python reimplementations of the round-6
statistical aggregates (operators/stats_ext.py) — the C76/C84 testing
convention: the DuckDB oracle catches engine-vs-engine drift, these
catch shared-formula mistakes (both engines computing the same wrong
thing)."""

from __future__ import annotations

import math

import pytest

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.stats_ext import (
    _A,
    _X0,
    q_avg_weighted,
    q_bitmap_ops,
    q_ks_test,
    q_linreg,
    q_mann_whitney,
    q_skew_kurt,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    ).collect()
    return [
        (
            r.user_id,
            r.event_id,
            r.event_type,
            int(math.floor(r.value * 1000 + 0.5)),
            r.ts,
        )
        for r in rows
    ]


def test_linreg_matches_python(spark, sf_dir, events):
    got = {r.event_type: r for r in q_linreg(spark, sf_dir).collect()}
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    by_type: dict[str, list[tuple[int, int]]] = {}
    for _, _, et, vm, ts in events:
        x = int((ts - epoch).total_seconds()) - _X0
        by_type.setdefault(et, []).append((x, vm))
    for et, pts in by_type.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope_milli = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        slope = slope_milli / 1000.0
        intercept = (float(sy) - slope_milli * float(sx)) / (float(n) * 1000.0)
        assert got[et].n == n
        assert got[et].slope_per_sec == pytest.approx(slope, rel=1e-12)
        assert got[et].intercept_at_origin == pytest.approx(intercept, rel=1e-12)


def test_skew_kurt_matches_python(spark, sf_dir, events):
    got = {r.cohort: r for r in q_skew_kurt(spark, sf_dir).collect()}
    by_cohort: dict[int, list[int]] = {}
    for uid, _, _, vm, _ in events:
        by_cohort.setdefault(uid % 5, []).append(vm - _A)
    for c, ds in by_cohort.items():
        n = len(ds)
        m1 = sum(ds) / n
        m2r = sum(d * d for d in ds) / n
        m3r = sum(d**3 for d in ds) / n
        m4r = sum(d**4 for d in ds) / n
        c2 = m2r - m1 * m1
        c3 = m3r - 3 * m1 * m2r + 2 * m1**3
        c4 = m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1**4
        assert got[c].n == n
        assert got[c].skew_pop == pytest.approx(c3 / (c2 * math.sqrt(c2)), rel=1e-9)
        assert got[c].kurt_pop == pytest.approx(c4 / (c2 * c2), rel=1e-9)
        # sanity: kurtosis of any real distribution >= skew^2 + 1
        assert got[c].kurt_pop >= got[c].skew_pop ** 2 + 1 - 1e-9


def _rank_stats(events):
    """Distinct-value table with per-cohort counts + cumulative."""
    agg: dict[int, list[int]] = {}
    for uid, _, _, vm, _ in events:
        cnts = agg.setdefault(vm, [0, 0])
        cnts[uid % 2] += 1
    out, cum = [], 0
    for vm in sorted(agg):
        a, b = agg[vm]
        cum += a + b
        out.append((vm, a, b, a + b, cum))
    return out


def test_mann_whitney_matches_python(spark, sf_dir, events):
    row = q_mann_whitney(spark, sf_dir).collect()[0]
    ranked = _rank_stats(events)
    n1 = sum(a for _, a, _, _, _ in ranked)
    n2 = sum(b for _, _, b, _, _ in ranked)
    two_ra = sum(a * (2 * (cum - cnt) + cnt + 1) for _, a, _, cnt, cum in ranked)
    tie_t = sum(cnt**3 - cnt for _, _, _, cnt, _ in ranked)
    n = n1 + n2
    u = (two_ra - n1 * (n1 + 1)) / 2.0
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie_t / (n * (n - 1)))
    assert row.n1 == n1 and row.n2 == n2
    assert row.u_stat == pytest.approx(u, rel=1e-12)
    assert row.z_stat == pytest.approx((u - n1 * n2 / 2.0) / math.sqrt(sigma2), rel=1e-9)


def test_ks_matches_python(spark, sf_dir, events):
    row = q_ks_test(spark, sf_dir).collect()[0]
    ranked = _rank_stats(events)
    n1 = sum(a for _, a, _, _, _ in ranked)
    n2 = sum(b for _, _, b, _, _ in ranked)
    cum_a = cum_b = 0
    best, best_vm = -1, None
    for vm, a, b, _, _ in ranked:
        cum_a += a
        cum_b += b
        dn = abs(cum_a * n2 - cum_b * n1)
        if dn > best:
            best, best_vm = dn, vm
    assert row.n1 == n1 and row.n2 == n2
    assert row.at_vm == best_vm
    assert row.d_stat == pytest.approx(best / (n1 * n2), rel=1e-12)
    assert 0.0 <= row.d_stat <= 1.0


def test_avg_weighted_matches_python(spark, sf_dir, events):
    got = {r.event_type: r for r in q_avg_weighted(spark, sf_dir).collect()}
    by_type: dict[str, list[tuple[int, int]]] = {}
    for _, eid, et, vm, _ in events:
        by_type.setdefault(et, []).append((eid % 10 + 1, vm))
    for et, ws in by_type.items():
        swv = sum(w * v for w, v in ws)
        wt = sum(w for w, _ in ws)
        assert got[et].w_total == wt
        assert got[et].w_avg == pytest.approx(swv / (wt * 1000.0), rel=1e-12)


def test_bitmap_ops_matches_python(spark, sf_dir, events):
    row = q_bitmap_ops(spark, sf_dir).collect()[0]
    views = {uid for uid, _, et, _, _ in events if et == "view"}
    buys = {uid for uid, _, et, _, _ in events if et == "purchase"}
    assert row.n_and == len(views & buys)
    assert row.n_or == len(views | buys)
    assert row.n_xor == len(views ^ buys)
    assert row.n_andnot == len(views - buys)
    assert row.n_and + row.n_xor == row.n_or
