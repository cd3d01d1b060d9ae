"""Quantitative contract for the rows-only p-value companions
(operators/pvalues.py): every emitted p is re-derived here by an
INDEPENDENT numerical method and must agree to 1e-6 (the production
path uses stdlib erfc / a Lentz continued fraction for the incomplete
beta; nothing below reuses those code paths).

Independent methods:
- normal two-sided p: Taylor series for erf (x < 3) / backward-evaluated
  continued fraction for erfc (x >= 3) — no math.erf/erfc.
- Student-t two-sided p: Gauss-Legendre quadrature of the unnormalized
  t density with a tan substitution mapping the real line to a finite
  interval — no lgamma, no incomplete beta.
- KS tail Q(lambda): the conjugate Jacobi-theta representation
  Q = 1 - sqrt(2*pi)/lam * sum exp(-(2k-1)^2 pi^2 / (8 lam^2)) — a
  different series than the production alternating form.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from kafka_clickhouse_implementation_spark.registry import all_queries
from tests.conftest import SF_DIR as SF


def erfc_indep(x: float) -> float:
    """erfc via Taylor series (small x) or continued fraction (large)."""
    ax = abs(x)
    if ax < 3.0:
        # erf(x) = 2/sqrt(pi) * sum (-1)^n x^(2n+1) / (n! (2n+1))
        s, term = 0.0, ax
        for n in range(0, 120):
            s += term / (2 * n + 1)
            term *= -ax * ax / (n + 1)
            if abs(term) < 1e-20:
                break
        e = 1.0 - 2.0 / math.sqrt(math.pi) * s
    else:
        # erfc(x) = exp(-x^2)/sqrt(pi) / (x + 1/2/(x + 1/(x + 3/2/(x + ...))))
        t = 0.0
        for k in range(60, 0, -1):
            t = (k / 2.0) / (ax + t)
        e = math.exp(-ax * ax) / math.sqrt(math.pi) / (ax + t)
    return e if x >= 0 else 2.0 - e


def t_sf2_indep(t: float, df: float) -> float:
    """Two-sided t p-value by quadrature: integrate the unnormalized
    density g(u) = (1 + u^2/df)^(-(df+1)/2) via u = tan(theta)."""
    nodes, weights = np.polynomial.legendre.leggauss(4000)

    def integral(theta_lo: float, theta_hi: float) -> float:
        mid, half = (theta_hi + theta_lo) / 2.0, (theta_hi - theta_lo) / 2.0
        th = mid + half * nodes
        u = np.tan(th)
        # log-space for large df: exp(-(df+1)/2 * log1p(u^2/df)) * sec^2
        logg = -(df + 1.0) / 2.0 * np.log1p(u * u / df) - 2.0 * np.log(np.cos(th))
        return float(half * np.sum(weights * np.exp(logg)))

    total = integral(-math.pi / 2 + 1e-12, math.pi / 2 - 1e-12)
    tail = integral(math.atan(abs(t)), math.pi / 2 - 1e-12)
    return 2.0 * tail / total


def ks_q_indep(lam: float) -> float:
    """Kolmogorov tail via the conjugate theta series (fast for small
    lam, exact identity for all lam > 0)."""
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 200):
        s += math.exp(-((2 * k - 1) ** 2) * math.pi**2 / (8.0 * lam * lam))
    return min(1.0, max(0.0, 1.0 - math.sqrt(2.0 * math.pi) / lam * s))


def test_mwu_pvalue_matches_independent_erfc(spark):
    row = all_queries()["q_mwu_pvalue"](spark, SF).head()
    ref = erfc_indep(abs(row.z_stat) / math.sqrt(2.0))
    assert 0.0 <= row.p_two_sided <= 1.0
    assert abs(row.p_two_sided - ref) <= 1e-6, (row.p_two_sided, ref)


def test_welch_pvalue_matches_quadrature(spark):
    row = all_queries()["q_welch_pvalue"](spark, SF).head()
    ref = t_sf2_indep(row.t_stat, row.welch_df)
    assert 0.0 <= row.p_two_sided <= 1.0
    assert abs(row.p_two_sided - ref) <= 1e-6, (row.p_two_sided, ref)


def test_student_pvalue_matches_quadrature(spark):
    row = all_queries()["q_student_pvalue"](spark, SF).head()
    ref = t_sf2_indep(row.t_stat, float(row.df))
    assert 0.0 <= row.p_two_sided <= 1.0
    assert abs(row.p_two_sided - ref) <= 1e-6, (row.p_two_sided, ref)


def test_ks_pvalue_matches_conjugate_theta(spark):
    row = all_queries()["q_ks_pvalue"](spark, SF).head()
    ne = row.n1 * row.n2 / float(row.n1 + row.n2)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * row.d_stat
    ref = ks_q_indep(lam)
    assert 0.0 <= row.p_two_sided <= 1.0
    assert abs(row.p_two_sided - ref) <= 1e-6, (row.p_two_sided, ref)


@pytest.mark.parametrize(
    "t,df",
    [(0.0, 5.0), (1.0, 1.0), (2.5, 3.0), (-1.7, 12.0), (4.0, 2.0), (0.3, 5000.0)],
)
def test_betainc_t_sf_against_quadrature_grid(t, df):
    """The production incomplete-beta path vs quadrature on a grid of
    (t, df) pairs including the df=1 (Cauchy) and huge-df (≈normal)
    extremes — catches CF parameterization bugs data can't reach."""
    from kafka_clickhouse_implementation_spark.functions.special import student_t_sf2

    assert abs(student_t_sf2(t, df) - t_sf2_indep(t, df)) <= 1e-9


@pytest.mark.parametrize("lam", [0.3, 0.5, 1.0, 1.5, 2.5])
def test_ks_series_identity(lam):
    """Alternating series (production) == conjugate theta series (here)
    — a nontrivial Jacobi identity, so agreement to 1e-12 is a strong
    correctness signal for both."""
    from kafka_clickhouse_implementation_spark.functions.special import ks_q

    assert abs(ks_q(lam) - ks_q_indep(lam)) <= 1e-12
