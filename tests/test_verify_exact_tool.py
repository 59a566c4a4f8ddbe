"""tools/verify_exact.py — the committed-exactness artifact writer (EXACT_SF30.json).
Smoke the tool end-to-end at the tiny fixture so a refactor can't silently break the
evidence pipeline (it runs in-process: argv + main, no subprocess Spark spin-up cost
beyond the shared session... it builds its own session, so keep it to ONE tiny query).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_verify_exact_writes_match_artifact(tmp_path):
    out = tmp_path / "exact.json"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_exact.py"),
         "--sf-dir", "/root/testdata/sf0.001",
         "--queries", "q3_agg_having", "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-500:]
    art = json.loads(out.read_text())
    assert art["all_match"] is True
    q = art["queries"]["q3_agg_having"]
    assert q["oracle"] and q["match"] and q["rows"] > 0
    assert q["spark_sec"] > 0 and q["oracle_sec"] > 0
    assert q["max_abs_numeric"] > 0
