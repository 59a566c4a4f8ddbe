"""Prototype (round-10, r9 verdict #3): x7_range_join over the user-bucketed
events layout (events_user_layout) vs the current shuffle-per-run window form.

Usage: python tools/proto_x7_layout.py [--sf DIR] [--n 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/rubix_testdata/sf10")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from rubix_spark import catalog
    from rubix_spark.fns import money_from_units
    from rubix_spark.ops.asof import _WINDOW_US
    from rubix_spark.queries import load_all
    from rubix_spark.sources.bucketing import events_user_layout

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf

    t0 = time.time()
    ev = events_user_layout(spark, sf)
    ev.count()
    print(f"events_user layout ready in {time.time()-t0:.1f}s")

    def x7_layout():
        base = ev.where(
            F.col("event_type").isin("click", "purchase") & F.col("us").isNotNull()
        ).select(
            "event_id", "user_id", "us", "event_type",
            F.when(
                F.col("event_type") == "click",
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"),
            ).otherwise(0).alias("cv"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("cf"),
        )
        w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-_WINDOW_US, -1)
        return (
            base.select(
                "event_id", "event_type",
                F.sum("cf").over(w).alias("n_clicks"),
                F.sum("cv").over(w).alias("sv"),
            )
            .where((F.col("event_type") == "purchase") & (F.col("n_clicks") > 0))
            .select("event_id", "n_clicks", money_from_units(F.col("sv"), "click_v"))
        )

    current = load_all()["x7_range_join"].builder

    a = sorted(map(tuple, x7_layout().collect()))
    b = sorted(map(tuple, current(spark, sf).collect()))
    print("rows match:", a == b, f"({len(a)} rows)")
    if a != b:
        for x, y in list(zip(a, b))[:5]:
            if x != y:
                print("L:", x, "R:", y)
        sys.exit(1)

    cur_t, dn_t = [], []
    for _ in range(args.n):
        t0 = time.time(); current(spark, sf).collect(); cur_t.append(time.time() - t0)
        t0 = time.time(); x7_layout().collect(); dn_t.append(time.time() - t0)
    print(f"current: min={min(cur_t):.3f}  samples={[round(t,3) for t in cur_t]}")
    print(f"layout : min={min(dn_t):.3f}  samples={[round(t,3) for t in dn_t]}")
    if args.explain:
        x7_layout().explain("formatted")
    plan = x7_layout()._jdf.queryExecution().executedPlan().toString()
    print("Exchange in plan:", "Exchange" in plan, "| Sort nodes:",
          sum(1 for l in plan.splitlines() if l.strip().startswith(("+- Sort", ":- Sort", "Sort "))))


if __name__ == "__main__":
    main()
