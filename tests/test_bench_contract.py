"""Bench driver-contract test: bench.py must print EXACTLY ONE stdout line, valid JSON,
small enough to survive the driver's 2000-char stdout tail (round 1 lost its BENCH
record to a 3.3 KB line), with the required metric fields present.

Runs in a subprocess (bench stops its SparkSession) on sf0.001 with a 2-query subset —
exercises every phase (cache cold/warm, per-query loop, concurrency, stress) end to end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_parseable_line_under_budget():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q1_scan_filter,q4_star_join",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_CONCURRENCY="2",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be one line, got {len(lines)}: {lines[:3]}"
    assert len(lines[0]) <= 1800, f"line too long for the driver's 2000-char tail: {len(lines[0])}"
    out = json.loads(lines[0])
    assert out["metric"] == "suite_avg_sec_per_query" and out["unit"] == "sec"
    assert set(out["queries"]) == {"q1_scan_filter", "q4_star_join"}
    assert out["cache"]["speedup"] is not None
    assert out["stress"]["mismatches"] == 0 and out["stress"]["evictions"] >= 0
    # full detail file is refreshed alongside
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    assert detail["queries"] == out["queries"]
