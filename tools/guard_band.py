#!/usr/bin/env python
"""Portable-kernel accuracy monitor, runnable at ANY sf_dir.

History: q_exp_decay and q_geo_distance originally floor-quantized
libm exp/haversine outputs and relied on a data-margin guard band.
Round 8 found real margins INSIDE the cross-libm disagreement scale
(exp 4.2e-7 at sf0.1; geo 3.8e-6 mm at sf1), so both queries now use
the portable polynomial kernels (functions/portable_math.py), which
make the floors boundary-proof by construction — cross-engine equality
no longer depends on the data at all.

What still deserves monitoring at scale is kernel ACCURACY: the
polynomials must track libm truth to ~1e-11 relative over the actual
input ranges a dataset produces (wider at bigger SFs — longer time
spans, new synthetic coordinates). This tool replays both kernels over
every row of the given dataset in vectorized numpy (elementwise IEEE,
bit-identical to the engines' scalar evaluation) and fails loudly if
the worst relative error vs numpy's libm exceeds the bound.

tools/make_scale_data.py invokes it after generating a scaled dataset;
the sf1 full-surface sweep runs it too. Exit code 1 on violation.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kafka_clickhouse_implementation_spark.functions.portable_math import (  # noqa: E402
    ASIN_COEFFS,
    COS_COEFFS,
    EXP_COEFFS,
    PI180,
    SIN_COEFFS,
    _EXP_N_MAX,
    _EXP_TABLE,
    PI_2,
)

TAU_US = 86_400_000_000  # mirrors parity_ext._TAU_US
GEO_R = 6_371_000.0  # mirrors parity_ext._GEO_R
REL_BOUND = 1e-11


def _pq(sf_dir: str, table: str) -> str:
    """Parquet path that works for both layouts: a single file (driver
    testdata) or a Spark-written directory (scaled datasets)."""
    import os

    p = f"{sf_dir}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _horner_np(t: np.ndarray, coeffs: list[str]) -> np.ndarray:
    acc = np.full_like(t, float(coeffs[-1]))
    for c in reversed(coeffs[:-1]):
        acc = float(c) + t * acc
    return acc


def _chunked_horner_np(t: np.ndarray, coeffs: list[str]) -> np.ndarray:
    t2 = t * t
    t4 = t2 * t2
    t8 = t4 * t4
    t16 = t8 * t8
    chunks = [coeffs[i : i + 16] for i in range(0, len(coeffs), 16)]
    acc = _horner_np(t, chunks[-1])
    for ch in reversed(chunks[:-1]):
        acc = _horner_np(t, ch) + t16 * acc
    return acc


def check_exp(sf_dir: str) -> float:
    con = duckdb.connect()
    events_pq = _pq(sf_dir, "events")
    tus = np.asarray(
        con.execute(
            f"SELECT epoch_us(ts) AS tus FROM '{events_pq}'"
        ).fetchnumpy()["tus"],
        dtype=np.int64,
    )
    x = (tus.max() - tus).astype(np.float64) / float(TAU_US)
    n = np.floor(x)
    f = x - n
    poly = _horner_np(f, EXP_COEFFS)
    table = np.array([float(v) for v in _EXP_TABLE] + [0.0])
    idx = np.minimum(n.astype(np.int64), _EXP_N_MAX)
    kernel = table[idx] * poly
    kernel[idx >= _EXP_N_MAX] = 0.0
    truth = np.exp(-x)
    live = truth > 1e-18
    rel = np.abs(kernel[live] - truth[live]) / truth[live]
    worst = float(rel.max()) if live.any() else 0.0
    if worst > REL_BOUND:
        raise SystemExit(f"pexp_neg kernel drift {worst:.3e} > {REL_BOUND} at {sf_dir}")
    return worst


def check_geo(sf_dir: str) -> float:
    con = duckdb.connect()
    cust_pq = _pq(sf_dir, "customer")
    res = con.execute(
        f"SELECT c_custkey, c_nationkey FROM '{cust_pq}'"
    ).fetchnumpy()
    ck = np.asarray(res["c_custkey"], dtype=np.int64)
    nk = np.asarray(res["c_nationkey"], dtype=np.int64)
    lat1 = ((ck * 37) % 17000).astype(np.float64) / 100.0 - 85.0
    lon1 = ((ck * 73) % 35000).astype(np.float64) / 100.0 - 175.0
    lat2 = ((nk * 11) % 170).astype(np.float64) - 85.0
    lon2 = ((nk * 29) % 350).astype(np.float64) - 175.0
    rad = float(PI180)
    hdlat = ((lat2 - lat1) * rad) / 2.0
    hdlon = ((lon2 - lon1) * rad) / 2.0
    sdlat = hdlat * _horner_np(hdlat * hdlat, SIN_COEFFS)
    sdlon = hdlon * _horner_np(hdlon * hdlon, SIN_COEFFS)
    clat1 = _horner_np((lat1 * rad) ** 2, COS_COEFFS)
    clat2 = _horner_np((lat2 * rad) ** 2, COS_COEFFS)
    h = (sdlat * sdlat) + (((clat1 * clat2) * sdlon) * sdlon)
    z = np.minimum(np.sqrt(h), 1.0)
    u = np.sqrt((1.0 - z) / 2.0)
    asz = np.where(
        z > 0.7,
        float(PI_2) - 2.0 * (u * _chunked_horner_np(u * u, ASIN_COEFFS)),
        z * _chunked_horner_np(z * z, ASIN_COEFFS),
    )
    kernel = 2.0 * GEO_R * asz
    truth = 2.0 * GEO_R * np.arcsin(z)
    live = truth > 1.0  # metres; sub-metre distances are boundary cases
    rel = np.abs(kernel[live] - truth[live]) / truth[live]
    worst = float(rel.max()) if live.any() else 0.0
    if worst > REL_BOUND:
        raise SystemExit(f"geo kernel drift {worst:.3e} > {REL_BOUND} at {sf_dir}")
    return worst


def main(sf_dir: str) -> None:
    we = check_exp(sf_dir)
    wg = check_geo(sf_dir)
    print(
        f"portable kernels OK at {sf_dir}: exp rel err {we:.3e}, "
        f"geo rel err {wg:.3e} (bound {REL_BOUND})"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
