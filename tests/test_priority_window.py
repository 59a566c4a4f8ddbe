"""Driver-window audit (invariant 8): the CORRECTNESS gate checks only the FIRST 50
entries of ``queries()``, pinned by ``queries.PRIORITY``. A careless re-order or rename
could silently drop a SURVEY-declared operator out of the driver's checked window —
these tests make that a loud failure instead.
"""

from __future__ import annotations

from rubix_spark.queries import PRIORITY, load_all

REG = load_all()

# SURVEY §2.B declared component families → the id prefix their canonical window row
# carries. Every family must keep at least one driver-checked row; Q1-Q20 must each
# keep exactly their canonical entry.
_CANONICAL_Q = (
    "q1_scan_filter", "q2_max_all", "q3_agg_having", "q4_star_join", "q5_theta_join",
    "q6_left_join", "q7_semi_join", "q8_anti_join", "q9_cte_self_join",
    "q10_window_rank", "q11_window_frame", "q12_rollup", "q13_distinct_buckets",
    "q14_scalar_fan", "q15_union_all", "q16_topk", "q17_scalar_funcs",
    "q18_correlated", "q19_composed", "q20_time_bucket",
)
_FAMILY_PREFIXES = ("x1_", "x2_", "x3_", "x4_", "x5_", "x7_", "x9_", "s", "c1_", "c2_")


def test_window_is_exactly_fifty():
    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50


def test_window_is_the_head_of_queries():
    """The driver takes the first 50 in dict order — PRIORITY must BE that head."""
    assert tuple(REG)[:50] == PRIORITY


def test_every_declared_operator_keeps_a_window_row():
    for name in _CANONICAL_Q:
        assert name in PRIORITY, f"declared {name} fell out of the driver window"
    for prefix in _FAMILY_PREFIXES:
        assert any(n.startswith(prefix) for n in PRIORITY), f"family {prefix}* has no window row"


def test_window_rows_are_all_sql_checked():
    """Invariant 8: every window slot must carry a DuckDB oracle (rows-only entries
    would waste a driver-checked slot on the weaker gate)."""
    missing = [n for n in PRIORITY if REG[n].oracle is None]
    assert not missing, f"window rows without oracles: {missing}"
