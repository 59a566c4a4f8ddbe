"""Paired Spark/DuckDB ratios from the scale artifacts — the BASELINE §4 tables.

Reads BENCH_SF<k>.json + DUCK_SF<k>.json and prints per-row seconds, the ratio
(spark/duck, <1 = Spark faster), TIMEOUT/absent markers, and the paired-suite
ratio over rows both engines finished. This is the arithmetic every round-close
BASELINE refresh has recomputed by hand.

    python tools/ratios.py 1 10 30 60
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name):
    p = os.path.join(REPO, name)
    return json.load(open(p)) if os.path.exists(p) else None


def main(rungs):
    for k in rungs:
        b, d = load(f"BENCH_SF{k}.json"), load(f"DUCK_SF{k}.json")
        if not b or not d:
            print(f"sf{k}: missing artifact(s)")
            continue
        bq, dq = b["queries"], d["queries"]
        print(f"\n== sf{k} ==  bench avg {b.get('value')} s/query"
              f"  stall={b.get('stall')}  density={b.get('minhash_density')}")
        paired_s = paired_d = 0.0
        n = 0
        rows = []
        for name in sorted(bq):
            s = bq[name]
            dd = dq.get(name)
            if isinstance(dd, dict):  # isolate mode rows: {"sec": ...} or timeout
                dd = dd.get("sec", dd.get("status"))
            if isinstance(dd, (int, float)):
                paired_s += s
                paired_d += dd
                n += 1
                rows.append((s / dd if dd else float("inf"), name, s, dd))
            else:
                rows.append((None, name, s, dd))
        for r, name, s, dd in sorted(rows, key=lambda t: -(t[0] or 1e9)):
            tag = f"{r:6.2f}x" if r is not None else f"{str(dd):>7}"
            print(f"  {tag}  {name:42s} spark {s:9.3f}  duck {dd if isinstance(dd,(int,float)) else '-'}")
        if n:
            print(f"  paired ratio over {n} rows: {paired_s / paired_d:.3f}x"
                  f" (spark {paired_s:.1f} s vs duck {paired_d:.1f} s)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["1", "10", "30", "60"])
