"""Registry-window guard: the driver's correctness harness records only
the FIRST 50 registered queries. Round 6 re-curated the window as the
stale-cohort rotation the r5 verdict asked for: (a) the five queries
whose code or oracle changed this round (ADVICE fixes + result
capping), (b) all 38 oracle-backed queries whose most-recent driver row
dated from round 1, (c) seven round-2-cohort picks (the reference-parity
Tier-A five + TPC-H Q3/Q6). The window is an explicit name list in
registry._WINDOW_50; this test pins the exact 50 so any registry change
that perturbs the driver's view fails loudly.

If you intentionally re-curate the window, update registry._WINDOW_50
AND this pin together, and say so in the commit message."""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import (
    _WINDOW_50,
    all_oracles,
    all_queries,
)

WINDOW_50 = [
    # (a) changed this round (5)
    "q_schema_evolution", "q_interval_length_sum",
    "q_stream_interval_length", "q_moving_sum", "q_window_range_frame",
    # (b) the full round-1-stale oracle-backed cohort (38)
    "q_agg_suite", "q_argmax_segment", "q_argmin_first_event",
    "q_array_funcs", "q_case_bucket", "q_cond_agg", "q_corr_cov",
    "q_cross_join", "q_cte_reuse", "q_cube", "q_date_funcs",
    "q_distinct_users", "q_exact_distinct", "q_exists_correlated",
    "q_full_outer", "q_having", "q_in_subquery",
    "q_join_broadcast_nation", "q_join_orders_customer",
    "q_left_join_orders", "q_math_funcs", "q_null_funcs", "q_pagination",
    "q_percentiles", "q_pivot", "q_regex_funcs", "q_revenue_by_nation",
    "q_rollup_day_type", "q_scalar_subquery", "q_semi_anti", "q_setops",
    "q_string_funcs", "q_topk_spenders", "q_union_by_name",
    "q_window_analytics", "q_window_lag", "q_window_rank",
    "q_window_runsum",
    # (c) round-2-cohort picks (7)
    "q_opens_for_campaign", "q_level_totals", "q_summing_reaggregate",
    "q_enum_encode", "q_default_coalesce", "q_tpch_q3", "q_tpch_q6",
]


def test_first_50_registrations_are_the_curated_window():
    assert list(all_queries())[:50] == WINDOW_50
    assert _WINDOW_50 == WINDOW_50


def test_window_is_exactly_50_known_names():
    qs = all_queries()
    assert len(WINDOW_50) == 50
    assert len(set(WINDOW_50)) == 50
    missing = [q for q in WINDOW_50 if q not in qs]
    assert missing == []


def test_window_oracle_coverage():
    """The round-6 window is all-oracle-backed by construction — the six
    rows-only-by-design stale queries were deliberately excluded (a
    rows-only row buys no hash signal)."""
    oracles = all_oracles()
    missing = [q for q in WINDOW_50 if q not in oracles]
    assert missing == []
