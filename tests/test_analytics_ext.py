"""Semantics tests for the ClickHouse statistical/behavioral aggregate
batch (operators/analytics_ext.py): each operator is re-computed by an
INDEPENDENT plain-Python implementation over the same sf0.001 events
and must agree exactly — a second differential alongside the DuckDB
oracle, with none of the SQL shared."""

from __future__ import annotations

import math

import pytest

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
    q_bounding_ratio,
    q_entropy,
    q_interval_length_sum,
    q_max_intersections,
    q_rank_corr,
    q_sequence_next_node,
    q_welch_ttest,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    rows = load(spark, sf_dir, "events").collect()
    return [
        (r.event_id, r.ts, r.user_id, r.event_type, r.value) for r in rows
    ]


def _intervals(events):
    by_user: dict[int, list[tuple[int, int, int]]] = {}
    for eid, ts, uid, _etype, _v in events:
        s = int(ts.timestamp() * 1_000_000)
        e = s + (eid % 7 + 1) * 60_000_000
        by_user.setdefault(uid, []).append((s, e, eid))
    return by_user


def test_interval_length_sum_matches_python(spark, sf_dir, events):
    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in q_interval_length_sum(spark, sf_dir).collect()
    }
    for uid, ivals in _intervals(events).items():
        islands = []
        for s, e, _ in sorted(ivals):
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expect = (len(islands), sum(e - s for s, e in islands))
        assert got[uid] == expect, uid


def test_max_intersections_matches_python(spark, sf_dir, events):
    got = {
        r.user_id: (r.max_open, r.first_peak_us)
        for r in q_max_intersections(spark, sf_dir).collect()
    }
    for uid, ivals in _intervals(events).items():
        pts = [(s, 1, eid) for s, e, eid in ivals] + [
            (e, -1, eid) for s, e, eid in ivals
        ]
        run = best = 0
        first_peak = None
        for t, d, _eid in sorted(pts):
            run += d
            if run > best:
                best = run
                first_peak = t
            elif run == best and best > 0:
                pass  # min(t) among peak rows: first reach wins
        assert got[uid] == (best, first_peak), uid


def test_bounding_ratio_matches_python(spark, sf_dir, events):
    got = {
        r.event_type: (r.bounding_ratio, r.n)
        for r in q_bounding_ratio(spark, sf_dir).collect()
    }
    by_type: dict[str, list] = {}
    for eid, ts, _uid, etype, v in events:
        by_type.setdefault(etype, []).append((ts, eid, v))
    for etype, rows in by_type.items():
        rows.sort()
        (t0, _, v0), (t1, _, v1) = rows[0], rows[-1]
        us0 = int(t0.timestamp() * 1_000_000)
        us1 = int(t1.timestamp() * 1_000_000)
        expect = (v1 - v0) / ((us1 - us0) / 1_000_000.0)
        assert got[etype] == (expect, len(rows)), etype


def test_rank_corr_matches_python(spark, sf_dir, events):
    got = {r.event_type: r.spearman_rho for r in q_rank_corr(spark, sf_dir).collect()}
    by_type: dict[str, list] = {}
    for eid, ts, _uid, etype, v in events:
        by_type.setdefault(etype, []).append((eid, ts, v))
    for etype, rows in by_type.items():
        n = len(rows)
        rv = {eid: i + 1 for i, (eid, _, _) in enumerate(sorted(rows, key=lambda r: (r[2], r[0])))}
        rt = {eid: i + 1 for i, (eid, _, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))}
        sumd2 = sum((rv[eid] - rt[eid]) ** 2 for eid, _, _ in rows)
        expect = 1.0 - (6.0 * float(sumd2)) / (float(n) * (float(n) * float(n) - 1.0))
        assert abs(got[etype] - expect) < 1e-12, etype
        assert -1.0 <= got[etype] <= 1.0


def test_welch_ttest_matches_python(spark, sf_dir, events):
    row = q_welch_ttest(spark, sf_dir).collect()[0]
    cohorts: dict[int, list[int]] = {0: [], 1: []}
    for _eid, _ts, uid, _etype, v in events:
        cohorts[uid % 2].append(int(math.floor(v * 1000 + 0.5)))
    stats = {}
    for c, vs in cohorts.items():
        n = len(vs)
        s1 = sum(vs)
        s2 = sum(v * v for v in vs)
        mean = float(s1) / 1000.0 / float(n)
        var = (float(s2) - float(s1) * float(s1) / float(n)) / 1e6 / (float(n) - 1.0)
        stats[c] = (n, mean, var)
    (n0, m0, v0), (n1, m1, v1) = stats[0], stats[1]
    se = v0 / float(n0) + v1 / float(n1)
    t = (m0 - m1) / math.sqrt(se)
    df = se * se / (
        (v0 / n0) * (v0 / n0) / (n0 - 1.0) + (v1 / n1) * (v1 / n1) / (n1 - 1.0)
    )
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.mean_diff - (m0 - m1)) < 1e-12
    assert abs(row.t_stat - t) < 1e-12
    assert abs(row.welch_df - df) < 1e-9


def test_entropy_matches_python_and_bounds(spark, sf_dir, events):
    got = {r.cohort: (r.n_events, r.entropy_nats) for r in q_entropy(spark, sf_dir).collect()}
    counts: dict[int, dict[str, int]] = {}
    for _eid, _ts, uid, etype, _v in events:
        counts.setdefault(uid % 10, {}).setdefault(etype, 0)
        counts[uid % 10][etype] += 1
    for cohort, dist in counts.items():
        total = sum(dist.values())
        acc = sum(c * math.floor(math.log(c / total) * 1e9) for c in dist.values())
        expect = -float(acc) / (float(total) * 1e9)
        n, h = got[cohort]
        assert n == total
        assert h == expect
        assert 0.0 <= h <= math.log(len(dist)) + 1e-9


def test_sequence_next_node_matches_python(spark, sf_dir, events):
    got = {r.next_node: r.n_users for r in q_sequence_next_node(spark, sf_dir).collect()}
    by_user: dict[int, list] = {}
    for eid, ts, uid, etype, _v in events:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    expect: dict[str, int] = {}
    for _uid, rows in by_user.items():
        rows.sort()
        types = [t for _, _, t in rows]
        for i in range(len(types) - 1):
            if types[i] == "view" and types[i + 1] == "click":
                nxt = types[i + 2] if i + 2 < len(types) else "(end)"
                expect[nxt] = expect.get(nxt, 0) + 1
                break
    assert got == expect


def test_ip_funcs_roundtrip_and_format(spark, sf_dir):
    from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
        q_ip_funcs,
    )
    import re

    rows = q_ip_funcs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.roundtrip_num == r.ip_num
        assert re.fullmatch(r"(\d{1,3}\.){3}\d{1,3}", r.ip_str)
        octets = [int(x) for x in r.ip_str.split(".")]
        assert all(0 <= o <= 255 for o in octets)
        assert r.in_10_slash_8 == (octets[0] == 10)
        assert r.net_24 == f"{octets[0]}.{octets[1]}.{octets[2]}.0/24"
        assert r.ip_num == (r.user_id * 2654435761) % 4294967296


def test_bigram_surprisal_matches_python(spark, sf_dir):
    """Independent plain-Python interpolated-bigram LM over the same
    corpus must reproduce every per-doc mean exactly (the nano-
    quantized ln terms make the float path deterministic)."""
    from kafka_clickhouse_implementation_spark.io import load
    from kafka_clickhouse_implementation_spark.operators.quality_ext import (
        q_bigram_surprisal,
    )

    got = {
        r.doc_id: (r.n_bigrams, r.mean_interp_surprisal)
        for r in q_bigram_surprisal(spark, sf_dir).collect()
    }
    docs = [
        (r.doc_id, r.text.split(" "))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    bgc: dict[tuple[str, str], int] = {}
    ug: dict[str, int] = {}
    n_tok = 0
    for _did, toks in docs:
        for t in toks:
            ug[t] = ug.get(t, 0) + 1
            n_tok += 1
        for a, b in zip(toks, toks[1:]):
            bgc[(a, b)] = bgc.get((a, b), 0) + 1
    hdc: dict[str, int] = {}
    for (a, _b), c in bgc.items():
        hdc[a] = hdc.get(a, 0) + c
    for did, toks in docs:
        if did >= 300 or len(toks) < 2:
            continue
        acc = 0
        nbg = 0
        for a, b in zip(toks, toks[1:]):
            p = 0.5 * (bgc[(a, b)] / hdc[a]) + 0.5 * (ug[b] / n_tok)
            acc += math.floor(math.log(p) * 1e9)
            nbg += 1
        expect = -float(acc) / (float(nbg) * 1e9)
        g_n, g_m = got[did]
        assert g_n == nbg, did
        assert g_m == expect, did


def test_stream_entropy_equals_batch(spark, sf_dir):
    """The streamed (state-store-accumulated) entropy must equal the
    batch operator row-for-row — counts are order-independent sums, so
    any difference means lost or duplicated state."""
    from kafka_clickhouse_implementation_spark.streaming.analytics_stream import (
        q_stream_entropy,
    )

    streamed = {
        r.cohort: (r.n_events, r.entropy_nats)
        for r in q_stream_entropy(spark, sf_dir).collect()
    }
    batch = {
        r.cohort: (r.n_events, r.entropy_nats)
        for r in q_entropy(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_cramers_v_bounds_and_python(spark, sf_dir):
    """Independent check of the association stats: rebuild the
    contingency table in Python with the same quantization rules;
    chi2, V and U must match exactly and respect their ranges."""
    from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
        q_cramers_v,
    )

    row = q_cramers_v(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    cells: dict[tuple[int, str], int] = {}
    for r in ev:
        k = (r.user_id % 5, r.event_type)
        cells[k] = cells.get(k, 0) + 1
    rows = sorted({k[0] for k in cells})
    cols = sorted({k[1] for k in cells})
    n = sum(cells.values())
    rown = {r: sum(v for (rr, _), v in cells.items() if rr == r) for r in rows}
    coln = {c: sum(v for (_, cc), v in cells.items() if cc == c) for c in cols}
    chi_acc = 0
    hrc_acc = 0
    for (r, c), o in cells.items():
        e = rown[r] * coln[c] / n
        chi_acc += math.floor((o - e) * (o - e) / e * 1e12)
        hrc_acc += o * math.floor(math.log(o / coln[c]) * 1e9)
    hr_acc = sum(
        rown[r] * math.floor(math.log(rown[r] / n) * 1e9) for r in rows
    )
    chi2 = float(chi_acc) / 1e12
    v = math.sqrt(chi2 / (float(n) * float(min(len(rows), len(cols)) - 1)))
    u = (float(-hr_acc) - float(-hrc_acc)) / float(-hr_acc)
    assert row.n == n
    assert row.chi2 == chi2
    assert row.cramers_v == v
    assert row.theils_u == u
    assert 0.0 <= row.cramers_v <= 1.0
    assert 0.0 <= row.theils_u <= 1.0


def test_lttb_structure_and_python(spark, sf_dir):
    """Independent plain-Python LTTB (exact integer triangle areas)
    must select the SAME points; plus structural invariants: first and
    last kept, one point per bucket, x strictly increasing."""
    from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
        LTTB_NB,
        q_lttb,
    )

    got: dict[str, list] = {}
    for r in q_lttb(spark, sf_dir).collect():
        got.setdefault(r.event_type, []).append((r.seq, r.x, r.y))
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in ev:
        series.setdefault(r.event_type, []).append(
            (r.ts, r.event_id, int(r.ts.timestamp()), int(math.floor(r.value * 1000 + 0.5)))
        )
    for et, rows in series.items():
        rows.sort()
        xs = [x for _, _, x, _ in rows]
        ys = [y for _, _, _, y in rows]
        eids = [e for _, e, _, _ in rows]
        n = len(rows)
        buckets: list[list[int]] = [[] for _ in range(LTTB_NB)]
        for i in range(1, n - 1):
            buckets[((i - 1) * LTTB_NB) // (n - 2)].append(i)
        expect = [(0, xs[0], ys[0])]
        px, py = xs[0], ys[0]
        for b in range(LTTB_NB):
            if b < LTTB_NB - 1:
                nxt = buckets[b + 1]
                sx, sy, cnt = sum(xs[i] for i in nxt), sum(ys[i] for i in nxt), len(nxt)
            else:
                sx, sy, cnt = xs[n - 1], ys[n - 1], 1
            best = None
            for i in buckets[b]:
                a = abs((xs[i] - px) * (sy - cnt * py) - (sx - cnt * px) * (ys[i] - py))
                key = (a, -xs[i], -eids[i])
                if best is None or key > best[0]:
                    best = (key, i)
            i = best[1]
            expect.append((b + 1, xs[i], ys[i]))
            px, py = xs[i], ys[i]
        expect.append((LTTB_NB + 1, xs[n - 1], ys[n - 1]))
        sel = sorted(got[et])
        assert sel == expect, et
        assert [s for s, _, _ in sel] == list(range(LTTB_NB + 2))
        assert all(sel[i][1] <= sel[i + 1][1] for i in range(len(sel) - 1))


def test_stream_interval_length_equals_batch(spark, sf_dir):
    """The incrementally-folded interval union must equal the batch
    island detection per user exactly — the fold's correctness rests
    on starts arriving time-ordered, so any wire-order slip shows up
    here as a split or merged island."""
    from kafka_clickhouse_implementation_spark.streaming.analytics_stream import (
        q_stream_interval_length,
    )

    streamed = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in q_stream_interval_length(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in q_interval_length_sum(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_kn_quality_matches_python_replay(spark, sf_dir):
    """C142: pure-Python interpolated Kneser-Ney (d = 3/4 exact
    fractions) over the even-doc train split, scoring the odd held-out
    split, must reproduce every per-source counter bit-for-bit —
    including the integer micro-quantization and the unseen pair/
    context backoff accounting."""
    import collections

    import pyarrow.parquet as pq

    from kafka_clickhouse_implementation_spark.registry import all_queries

    tab = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    rows = list(
        zip(tab["doc_id"].to_pylist(), tab["source"].to_pylist(),
            tab["text"].to_pylist())
    )
    bgc: dict = collections.Counter()
    for did, _src, text in rows:
        toks = text.split(" ")
        if did % 2 == 0 and len(toks) >= 2:
            bgc.update(zip(toks, toks[1:]))
    c1 = collections.Counter()
    n1 = collections.Counter()
    ncont = collections.Counter()
    for (w1, w2), c in bgc.items():
        c1[w1] += c
        n1[w1] += 1
        ncont[w2] += 1
    nt = len(bgc)

    agg: dict = collections.defaultdict(lambda: [set(), 0, 0, 0, 0])
    for did, src, text in rows:
        toks = text.split(" ")
        if did % 2 != 1 or len(toks) < 2:
            continue
        a = agg[src]
        a[0].add(did)
        for w1, w2 in zip(toks, toks[1:]):
            if w1 in c1:
                num = (max(4 * bgc.get((w1, w2), 0) - 3, 0) * nt
                       + 3 * n1[w1] * ncont.get(w2, 0))
                p = (1_000_000 * num) // (4 * c1[w1] * nt)
            else:
                p = (1_000_000 * ncont.get(w2, 0)) // nt
            a[1] += 1
            a[2] += p
            a[3] += 0 if (w1, w2) in bgc else 1
            a[4] += 0 if w1 in c1 else 1

    got = {r.source: r for r in all_queries()["q_kn_quality"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, a in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_bigrams, r.sum_p_micro) == (len(a[0]), a[1], a[2])
        assert r.mean_p_micro == a[2] // a[1]
        assert (r.n_unseen_pairs, r.n_unseen_ctx) == (a[3], a[4])
    # the held-out split genuinely exercises the backoff at some SF?
    # (not guaranteed at every SF; assert only non-negative)
    assert all(r.n_unseen_pairs >= 0 for r in got.values())
