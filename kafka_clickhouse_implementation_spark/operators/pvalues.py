"""p-value companions for the statistical-test tier (round-8 verdict
item: the most user-visible gap in the statistical queries).

Each query below re-runs its oracle-checked statistic twin (shared
callable, so the statistic can never diverge from the hash-certified
definition) and appends a two-sided p-value computed SPARK-SIDE ONLY
from stdlib/portable special functions (functions/special.py):

- q_mwu_pvalue      <- q_mann_whitney   p = erfc(|z| / sqrt(2))
- q_welch_pvalue    <- q_welch_ttest    p = I_x(df/2, 1/2), x = df/(df+t^2)
- q_student_pvalue  <- q_student_ttest  same, with pooled integer df
- q_ks_pvalue       <- q_ks_test        p = Q_KS(stephens_lambda(D, n1, n2))

These are declared ROWS-ONLY by design: erf / lgamma are not correctly
rounded across libm implementations (JVM vs DuckDB vs glibc), so a
driver value-hash over p would be flaky at the last ulp — exactly the
reason the statistic queries themselves stop at z / t / D (see
stats_ext.q_mann_whitney's docstring). The quantitative contract lives
in tests/test_pvalues.py instead: every p is re-derived by an
INDEPENDENT numerical method (series erfc, Gauss-Legendre quadrature
of the t density, the conjugate theta-series form of Q_KS) and must
agree to 1e-6.

The statistic DataFrames are all single-row finishes, so the p append
is a one-row mapInPandas — nothing here touches the distributed part
of the plan.

Reference parity: ClickHouse mannWhitneyUTest / studentTTest /
welchTTest / kolmogorovSmirnovTest return (statistic, p-value) tuples;
with these companions every tuple member is now covered (SURVEY §2
C76/C80/C100/C101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_clickhouse_implementation_spark.functions.special import (
    ks_two_sample_p,
    normal_sf2,
    student_t_sf2,
)
from kafka_clickhouse_implementation_spark.operators.analytics_ext import (
    q_student_ttest,
    q_welch_ttest,
)
from kafka_clickhouse_implementation_spark.operators.stats_ext import (
    q_ks_test,
    q_mann_whitney,
)
from kafka_clickhouse_implementation_spark.registry import query


def _append_p(df: DataFrame, out_schema: str, pfn) -> DataFrame:
    """Append p_two_sided to a one-row statistic frame via mapInPandas
    (row -> float), keeping every original column untouched."""

    def fin(batches):
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf["p_two_sided"] = [pfn(row) for row in pdf.itertuples(index=False)]
            yield pdf

    return df.mapInPandas(fin, out_schema)


@query("q_mwu_pvalue")  # rows-only BY DESIGN: p uses libm erfc (see module doc)
def q_mwu_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U with the normal-approximation two-sided p-value
    (tie-corrected z from the oracle-checked q_mann_whitney)."""
    stat = q_mann_whitney(spark, sf_dir)
    return _append_p(
        stat,
        "n1 long, n2 long, u_stat double, z_stat double, p_two_sided double",
        lambda r: normal_sf2(r.z_stat),
    )


@query("q_welch_pvalue")  # rows-only BY DESIGN: p uses libm lgamma/exp (see module doc)
def q_welch_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test with the two-sided p from the t distribution at
    the (fractional) Welch-Satterthwaite df."""
    stat = q_welch_ttest(spark, sf_dir)
    return _append_p(
        stat,
        "n0 long, n1 long, mean_diff double, t_stat double,"
        " welch_df double, p_two_sided double",
        lambda r: student_t_sf2(r.t_stat, r.welch_df),
    )


@query("q_student_pvalue")  # rows-only BY DESIGN: p uses libm lgamma/exp (see module doc)
def q_student_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Student's pooled-variance t-test with the two-sided p at the
    exact integer df = n0 + n1 - 2."""
    stat = q_student_ttest(spark, sf_dir)
    return _append_p(
        stat,
        "n0 long, n1 long, df long, t_stat double, p_two_sided double",
        lambda r: student_t_sf2(r.t_stat, float(r.df)),
    )


@query("q_ks_pvalue")  # rows-only BY DESIGN: p uses libm exp (see module doc)
def q_ks_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test with the asymptotic p-value
    (Stephens-corrected lambda over the exact integer-argmax D from
    the oracle-checked q_ks_test)."""
    stat = q_ks_test(spark, sf_dir)
    return _append_p(
        stat,
        "n1 long, n2 long, at_vm long, d_stat double, p_two_sided double",
        lambda r: ks_two_sample_p(r.d_stat, int(r.n1), int(r.n2)),
    )
