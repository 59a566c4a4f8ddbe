"""Bench stdout-line contract (r13 verdict #1): the driver keeps the LAST 2000
chars of bench.py's stdout and compares every PRIORITY query timing on the
printed JSON line against the previous round. A PRIORITY key missing from the
line makes the round REGRESSED regardless of speed — r13 lost q13/s6/x4 to the
old trimmer when minhash_density pushed the line past budget.

These tests drive bench.shrink_printed_line with a synthetic `out` dict shaped
exactly like the r13 artifact (50 timings + stall + minhash_density + all four
scenario blocks) and pin the contract: <=1800 chars, parses, every PRIORITY
timing present; diagnostic blocks and non-priority timings are the only
droppable ballast.
"""

from __future__ import annotations

import json

import pytest

import bench
from rubix_spark.queries import PRIORITY, load_all

REG = load_all()


def _r13_shaped_out(extra_queries=()):
    queries = {n: 0.123 for n in PRIORITY}
    for n in extra_queries:
        queries[n] = 0.456
    return {
        "metric": "suite_avg_sec_per_query",
        "value": 0.5255,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "stall": {"pass_spread": 1.652, "requeried": 15},
        "minhash_density": {"pairs": 255, "docs": 5000, "pairs_per_doc": 0.051},
        "concurrent": {"query": "q4_star_join_sql", "n": 8, "avg_sec": 1.0233, "max_sec": 1.0413},
        "cache": {
            "query": "c1_cached_star_join",
            "cold_sec": 3.0932,
            "warm_sec": 0.9582,
            "speedup": 3.23,
            "hit_rate": 1.0,
        },
        "cache_slow": {"latency_s": 0.15, "cold_sec": 7.05, "warm_sec": 0.67, "speedup": 10.52},
        "stress": {"budget_frac": 0.5, "reads": 100, "evictions": 3, "mismatches": 0, "sec": 4.2},
    }


def test_r13_shape_keeps_every_priority_timing():
    out = _r13_shaped_out()
    line = bench.shrink_printed_line(out, PRIORITY)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert set(parsed["queries"]) >= set(PRIORITY), "PRIORITY timing dropped from bench line"
    # the r13 victims specifically (the three longest PRIORITY names)
    for victim in ("q13_distinct_buckets", "s6_stream_durable_sink", "x4_udf_grouped_median"):
        assert victim in parsed["queries"]


def test_minhash_density_never_printed_when_tight():
    """The density block lives in BENCH_DETAIL.json / the scale artifacts; it is the
    first ballast overboard whenever the line is over budget."""
    out = _r13_shaped_out()
    if len(json.dumps(out)) > 1800:
        line = bench.shrink_printed_line(out, PRIORITY)
        assert "minhash_density" not in json.loads(line)


def test_non_priority_rows_drop_before_any_block_matters():
    """Full-registry runs (no subset) time ~130 rows; the non-priority ones are
    droppable, the PRIORITY ones never."""
    extra = [n for n in sorted(REG) if n not in set(PRIORITY)]
    out = _r13_shaped_out(extra_queries=extra)
    line = bench.shrink_printed_line(out, PRIORITY)
    parsed = json.loads(line)
    assert len(line) <= 1800
    assert set(parsed["queries"]) >= set(PRIORITY)


def test_raises_rather_than_dropping_priority():
    out = _r13_shaped_out()
    with pytest.raises(RuntimeError, match="PRIORITY"):
        bench.shrink_printed_line(out, PRIORITY, limit=500)


def test_small_line_untouched():
    out = {
        "metric": "suite_avg_sec_per_query",
        "value": 0.1,
        "unit": "sec",
        "queries": {"q1_scan_filter": 0.1},
        "sf": 0.1,
        "stall": {"pass_spread": 1.0, "requeried": 0},
    }
    line = bench.shrink_printed_line(out, PRIORITY)
    parsed = json.loads(line)
    assert parsed["stall"] == {"pass_spread": 1.0, "requeried": 0}
    assert parsed["queries"] == {"q1_scan_filter": 0.1}
