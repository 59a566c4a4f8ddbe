"""Round-14 measurement (r13 verdict #4): decompose x1_substring_dedup by stage
and A/B the count shuffle's row width.

Stages timed with the noop sink (guide §1.4):
  kernel   — mapInPandas window kernel + xxhash pair projection only
  hits     — kernel + count window over (h1,h2) + c>=2 filter
  full     — the registered query (adds the per-doc islands merge)

Variants on the count shuffle (guide §2.3, narrower types / fewer bytes):
  narrow   — pos as INT (token offsets are < 2^31 at any realistic doc length):
             4 bytes off every shuffled/sorted row in BOTH stage-2 and stage-3
  preagg   — hash-agg dup-key set + semi-join (re-probe of the r12-rejected
             stage-2 form, for the record at this corpus generation)

Usage: python -u tools/proto_substring_decomp.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/rubix_testdata/sf1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    from rubix_spark import catalog

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    from rubix_spark.ops import dedup as dd
    from rubix_spark.queries import load_all

    reg = load_all()
    K = dd._SUBSTR_K

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def kernel():
        noop(dd._substring_wins_frame(spark, args.sf))

    def hits():
        wins = dd._substring_wins_frame(spark, args.sf)
        h = (
            wins.withColumn("c", F.count("*").over(Window.partitionBy("h1", "h2")))
            .where(F.col("c") >= 2)
            .select("doc_id", "pos")
        )
        noop(h)

    def full():
        noop(reg["x1_substring_dedup"].builder(spark, args.sf))

    def narrow_full():
        docs = catalog.table(spark, args.sf, "documents").select("doc_id", "text")
        wins = docs.mapInPandas(
            dd._substring_win_kernel, "doc_id bigint, pos int, sh string"
        ).select(
            "doc_id", "pos",
            F.xxhash64(F.col("sh")).alias("h1"),
            F.xxhash64(F.lit(1), F.col("sh")).alias("h2"),
        )
        h = (
            wins.withColumn("c", F.count("*").over(Window.partitionBy("h1", "h2")))
            .where(F.col("c") >= 2)
            .select("doc_id", "pos")
        )
        by_doc = Window.partitionBy("doc_id").orderBy("pos")
        grp = (
            h.withColumn(
                "brk",
                F.when(F.col("pos") - F.lag("pos").over(by_doc) <= K, F.lit(0)).otherwise(F.lit(1)),
            )
            .withColumn("g", F.sum("brk").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)))
        )
        out = grp.groupBy("doc_id", "g").agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + K).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        ).select("doc_id", "span_start", "span_end", "n_windows")
        noop(out)

    def timed(name, fn):
        best = None
        for i in range(args.n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name} run {i}: {dt:.3f}s", flush=True)
        print(f"{name}: min={best:.3f}s", flush=True)
        return best

    # warm the kernel path once (python workers, JIT)
    kernel()
    k = timed("kernel", kernel)
    h = timed("hits", hits)
    f = timed("full", full)
    nf = timed("narrow_full", narrow_full)
    print(
        f"RESULT kernel={k:.3f} count_stage={h - k:.3f} islands_stage={f - h:.3f} "
        f"full={f:.3f} narrow_full={nf:.3f}"
    )


if __name__ == "__main__":
    main()
