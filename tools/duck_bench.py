"""DuckDB reference timings for the registered oracle SQL — the BASELINE.md protocol.

Runs every registered query's DuckDB oracle against a fixture directory and prints one
JSON line {name: min_sec}. Mirrors bench.py's protocol choices so the ratio is
apples-to-apples: min-of-N runs (noise-resistant on this host), results materialized
column-wise via ``.arrow()`` (the analog of bench.py's noop sink, which materializes
every output column), warm process (one untimed pass per query first).

Usage:
    python tools/duck_bench.py [--sf-dir /root/testdata/sf0.1] [--runs 2] [--out FILE]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from rubix_spark.queries import load_all  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")


def _isolated(args, names) -> None:
    """--isolate: one subprocess per oracle with a wall timeout, results written
    incrementally. Required at sf>=10, where a single pathological oracle
    (x1_dedup_components' recursive CTE: >45 min observed) would otherwise pin the
    whole run with no progress signal; timeouts are recorded, not fatal."""
    import subprocess

    out_path = args.out or "/tmp/duck_bench_isolated.json"
    timings: dict = {}
    if os.path.exists(out_path):  # resumable
        timings = json.load(open(out_path)).get("queries", {})
    for n in names:
        if n in timings:
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--sf-dir", args.sf_dir,
               "--runs", str(args.runs), "--queries", n]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True, timeout=args.timeout)
            line = [l for l in p.stdout.splitlines() if l.strip().startswith("{")]
            timings[n] = json.loads(line[-1])["queries"][n] if p.returncode == 0 and line else {
                "err": p.stderr[-200:]}
        except subprocess.TimeoutExpired:
            timings[n] = {"timeout_s": args.timeout}
        ok = [v for v in timings.values() if isinstance(v, (int, float))]
        json.dump({"metric": "duckdb_suite_avg_sec_per_query",
                   "value": round(sum(ok) / len(ok), 4) if ok else None,
                   "unit": "sec", "queries": timings, "sf_dir": args.sf_dir,
                   "runs": args.runs, "isolate_timeout_s": args.timeout},
                  open(out_path, "w"), indent=1)
        print(n, timings[n], flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--isolate", action="store_true",
                    help="one subprocess + timeout per oracle (mandatory at sf>=10)")
    ap.add_argument("--timeout", type=int, default=900, help="per-oracle seconds with --isolate")
    args = ap.parse_args()

    registry = load_all()
    names = [n for n, q in registry.items() if q.oracle]
    if args.queries:
        # rows-only queries have no oracle to time — record them as such instead of
        # crashing the isolated subprocess with an empty timing set (round-8 fix)
        asked = [n.strip() for n in args.queries.split(",")]
        names = [n for n in asked if registry[n].oracle]
        skipped = [n for n in asked if not registry[n].oracle]
        if skipped:
            print(f"# no oracle (rows-only), skipped: {skipped}", file=sys.stderr)

    if args.isolate:
        _isolated(args, names)
        return

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir.rstrip('/')}/{t}.parquet"
        # generated fixtures are directories of part-files; driver fixtures are single files
        src = f"{path}/*.parquet" if glob.glob(f"{path}/*.parquet") else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    timings: dict[str, float] = {}
    for name in names:
        sql = registry[name].oracle
        try:
            con.execute(sql).arrow()  # warmup (buffer cache, plan)
            best = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                con.execute(sql).arrow()
                best.append(time.perf_counter() - t0)
            timings[name] = round(min(best), 4)
        except Exception as exc:  # e.g. recursive-CTE oracle variants
            timings[name] = None
            print(f"# {name}: {type(exc).__name__}: {str(exc)[:120]}", file=sys.stderr)

    ok = [v for v in timings.values() if v is not None]
    out = {
        "metric": "duckdb_suite_avg_sec_per_query",
        "value": round(sum(ok) / len(ok), 4) if ok else None,
        "unit": "sec",
        "queries": timings,
        "sf_dir": args.sf_dir,
        "runs": args.runs,
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
