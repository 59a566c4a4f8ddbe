"""Dump formatted physical plans for the round-13 optimization deliverable.

Writes plans/r13/<query>_<suffix>.txt for each query whose plan round 13
changed.  Run once at the r12 boundary commit (suffix=before, from a worktree)
and once at HEAD (suffix=after):

    python tools/plans_r13.py /root/testdata/sf0.1 after  /root/repo/plans/r13
    python tools/plans_r13.py /root/testdata/sf0.1 before /root/repo/plans/r13

sf0.1 so every size branch that matters is ON the optimized body
(x4 layout branch: events 100k >= RUBIX_X4_LAYOUT_MIN_ROWS=50k; the q31
materialized rollup serves at every SF at HEAD, while the r12 body at sf0.1
took the strkey ablation branch -- that IS the honest before).
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rubix_spark import get_session  # noqa: E402
from rubix_spark.queries import load_all  # noqa: E402

QUERIES = [
    "x4_udf_grouped_median",
    "q31_grouping_sets",
    "x1_semantic_dedup",
]


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    outdir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)),
                             check=True).stdout.strip()
    except Exception:
        sha = "unknown"
    registry = load_all()
    spark = get_session(app_name=f"plans-r13-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        if name not in registry:
            continue
        parts = [f"# {name} ({suffix}) -- commit {sha}, input {sf_dir}\n"]
        df = registry[name].builder(spark, sf_dir)
        parts.append(_explain(df))
        # q31 at HEAD finalizes a driver-collected ~25-row base, so the
        # registered df's plan is a LocalTableScan; the plan that carries the
        # cost story is the base-table read (materialized rollup artifact at
        # HEAD vs the live aggregate before).  Append it when present.
        if name == "q31_grouping_sets":
            try:
                from rubix_spark.queries.extended import _q31_base_table
                parts.append("\n\n## q31 base-table plan (the per-query cost)\n")
                parts.append(_explain(_q31_base_table(spark, sf_dir)))
            except ImportError:
                pass
        dest = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(dest, "w") as f:
            f.write("\n".join(parts) + "\n")
        print(f"wrote {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
