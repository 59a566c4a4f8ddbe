"""Record Spark-vs-DuckDB exactness for a query subset at any SF — committed evidence.

The oracle gate (tests/test_queries.py) proves correctness at the driver's scales;
this tool re-runs the SAME comparison (tests/oracle_utils.compare — pandas fetch,
canonical sort, full-precision repr) at an arbitrary fixture and writes a JSON
artifact, so claims like "q4 matches DuckDB exactly at sf30 with group sums at
3.7e15 units" are reproducible from a checked-in file instead of a narrative.

    python tools/verify_exact.py --sf-dir /tmp/rubix_testdata/sf30 \
        --queries q4_star_join,q13_distinct_buckets,... --out EXACT_SF30.json

Per query it records match/problems, row count, wall seconds for each engine
(informational — run idle, but this is NOT the timing artifact; BENCH_SF*/DUCK_SF*
carry the perf claims), and the max |numeric| in the Spark output (the magnitude
that stresses the integer-money path past the old double cliff — fns.py round_det
contract, SURVEY round-8 section).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True, help="comma-separated registry names")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from rubix_spark import get_session
    from rubix_spark.queries import load_all
    from tests.oracle_utils import compare, run_oracle

    registry = load_all()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session(app_name="rubix-verify-exact")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        entry: dict = {"oracle": q.oracle is not None}
        t0 = time.perf_counter()
        df = q.builder(spark, args.sf_dir)
        pdf = df.toPandas()
        entry["spark_sec"] = round(time.perf_counter() - t0, 3)
        entry["rows"] = len(pdf)
        mx = 0.0
        for col in pdf.columns:
            try:
                v = float(pdf[col].abs().max())
                if math.isfinite(v):
                    mx = max(mx, v)
            except (TypeError, ValueError):
                continue
        entry["max_abs_numeric"] = mx
        if q.oracle is not None:
            t0 = time.perf_counter()
            run_oracle(q.oracle, args.sf_dir)  # timed standalone, like duck_bench
            entry["oracle_sec"] = round(time.perf_counter() - t0, 3)
            problems = compare(df, q.oracle, args.sf_dir)
            entry["match"] = not problems
            if problems:
                entry["problems"] = [p[:400] for p in problems]
        results[name] = entry
        status = "MATCH" if entry.get("match") else ("rows-only" if q.oracle is None else "MISMATCH")
        print(f"{name}: {status} rows={entry['rows']} spark={entry['spark_sec']}s", flush=True)

    # all_match speaks ONLY for entries that were actually compared (have an
    # oracle); rows-only entries must not inflate the headline bool (ADVICE r8).
    compared = [e for e in results.values() if "match" in e]
    out = {
        "sf_dir": args.sf_dir,
        "queries": results,
        "n_compared": len(compared),
        "n_rows_only": len(results) - len(compared),
        "all_match": bool(compared) and all(e["match"] for e in compared),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"all_match": out["all_match"], "n": len(results),
                      "n_compared": out["n_compared"]}))
    spark.stop()


if __name__ == "__main__":
    main()
