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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir.rstrip('/')}/{t}.parquet"
        # generated fixtures are directories of part-files; driver fixtures are single files
        src = f"{path}/*.parquet" if glob.glob(f"{path}/*.parquet") else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    registry = load_all()
    names = [n for n, q in registry.items() if q.oracle]
    if args.queries:
        names = [n.strip() for n in args.queries.split(",")]

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
        "value": round(sum(ok) / len(ok), 4),
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
