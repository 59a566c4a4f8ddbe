"""Prototype (round-11, r10 verdict #3): x9_pack without the eager checkpoint and
without the second full shuffle of the narrow counts table.

Current shape: checkpoint(t) -> window(blk) cumsum  AND  t.groupBy(blk) totals —
two full exchanges of t plus an eager localCheckpoint materialization.

Candidate: ONE Exchange(blk). The block totals derive from the window output as
max(lcum) (aggregation on blk consumes the window's hash(blk) partitioning — no
new exchange), and the join's two sides share the identical Exchange subtree, so
ReuseExchange runs the scan + Arrow regex kernel ONCE with no checkpoint.

Usage: python tools/proto_x9_pack.py [--sf DIR] [--n 5]
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
    from rubix_spark.ops.pipeline import PACK_BLOCK, PACK_BUDGET, _ntok_df
    from rubix_spark.queries import load_all

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

    def x9_pack_new():
        t = _ntok_df(spark, sf).withColumn(
            "blk", (F.col("doc_id") / PACK_BLOCK).cast("bigint")
        )
        w_in = (
            Window.partitionBy("blk").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # checkpoint AFTER the window: LogicalRDD preserves the hash(blk)
        # partitioning + (doc_id) ordering, so the totals aggregate below plans
        # with NO exchange, and the kernel + the one full shuffle run ONCE
        local = t.withColumn("lcum", F.sum("n_tok").over(w_in)).localCheckpoint(
            eager=True
        )
        # block totals from the SAME window output: max(lcum) == sum(n_tok) per blk
        totals = local.groupBy("blk").agg(F.max("lcum").alias("btot"))
        w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
        offs = totals.withColumn(
            "boff", F.coalesce(F.sum("btot").over(w_blk), F.lit(0))
        ).select("blk", "boff")
        c = local.join(F.broadcast(offs), "blk").withColumn(
            "cum", F.col("lcum") + F.col("boff")
        )
        start = F.col("cum") - F.col("n_tok")
        binned = c.withColumn("bin_id", F.floor(start / F.lit(float(PACK_BUDGET))))
        return binned.groupBy("bin_id").agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )

    def x9_pack_layout():
        from rubix_spark.sources.bucketing import persisted_bucketed

        def build():
            # ingest-time GLOBAL cumsum (budget-independent): the same two-level
            # prefix sum the query used to run per-invocation, paid once at write
            t = (
                _ntok_df(spark, sf)
                .withColumn("blk", (F.col("doc_id") / PACK_BLOCK).cast("bigint"))
                .localCheckpoint(eager=True)
            )
            w_in = (
                Window.partitionBy("blk").orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            local = t.withColumn("lcum", F.sum("n_tok").over(w_in))
            totals = t.groupBy("blk").agg(F.sum("n_tok").alias("btot"))
            w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
            offs = totals.withColumn(
                "boff", F.coalesce(F.sum("btot").over(w_blk), F.lit(0))
            ).select("blk", "boff")
            return (
                local.join(F.broadcast(offs), "blk")
                .select("doc_id", "blk", "n_tok",
                        (F.col("lcum") + F.col("boff")).alias("cum"))
            )

        lay = persisted_bucketed(
            spark, "docs_ntok", f"{sf.rstrip('/')}/documents.parquet", build,
            bucket_col="blk", n_buckets=32, sort_col=("blk", "doc_id"),
        )
        start = F.col("cum") - F.col("n_tok")
        binned = lay.withColumn("bin_id", F.floor(start / F.lit(float(PACK_BUDGET))))
        return binned.groupBy("bin_id").agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )

    current = load_all()["x9_pack"].builder

    t0 = time.time()
    x9_pack_layout().count()
    print(f"layout ready in {time.time()-t0:.1f}s")
    la = sorted(map(tuple, x9_pack_layout().collect()))
    lb = sorted(map(tuple, current(spark, sf).collect()))
    print("layout rows match:", la == lb, f"({len(la)} rows)")
    lplan = x9_pack_layout()._jdf.queryExecution().executedPlan().toString()
    print("layout: exchanges:",
          sum(1 for l in lplan.splitlines() if "Exchange hashpartitioning" in l),
          "| Sort nodes:",
          sum(1 for l in lplan.splitlines()
              if l.strip().startswith(("+- Sort", ":- Sort", "Sort "))))
    lay_t = []
    for _ in range(args.n):
        t0 = time.time(); x9_pack_layout().collect(); lay_t.append(time.time() - t0)
    print(f"layout : min={min(lay_t):.3f}  samples={[round(t,3) for t in lay_t]}")

    a = sorted(map(tuple, x9_pack_new().collect()))
    b = sorted(map(tuple, current(spark, sf).collect()))
    print("rows match:", a == b, f"({len(a)} rows)")
    if a != b:
        bad = [(x, y) for x, y in zip(a, b) if x != y][:5]
        print("mismatches:", bad)
        sys.exit(1)

    plan = x9_pack_new()._jdf.queryExecution().executedPlan().toString()
    n_ex = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    print("hash exchanges:", n_ex, "| ReusedExchange:", "ReusedExchange" in plan)
    if args.explain:
        print(plan)

    cur_t, new_t = [], []
    for _ in range(args.n):
        t0 = time.time(); current(spark, sf).collect(); cur_t.append(time.time() - t0)
        t0 = time.time(); x9_pack_new().collect(); new_t.append(time.time() - t0)
    print(f"current: min={min(cur_t):.3f}  samples={[round(t,3) for t in cur_t]}")
    print(f"new    : min={min(new_t):.3f}  samples={[round(t,3) for t in new_t]}")


if __name__ == "__main__":
    main()
