"""A/B: x1_substring_dedup stage 2 — count WINDOW (exchange + full sort of all
window rows by (h1,h2)) vs hash-agg dup-key set + shuffle-hash LEFT SEMI join
(two exchanges, ZERO sorts of the big side).

The r11 decomposition named the sort-bound shuffles as the row's cost; the count
itself never needed an ordering — only the islands stage (per-doc pos) does.

    python -u tools/proto_substring_stage2.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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

    def window_form():
        return reg["x1_substring_dedup"].builder(spark, args.sf)

    def semi_form():
        docs = catalog.table(spark, args.sf, "documents").select("doc_id", "text")
        # replicate stage 1 by calling the registered builder up to wins: inline
        from pyspark.sql import functions as F
        wins = dd._substring_wins_frame(spark, args.sf)
        dup_keys = (
            wins.groupBy("h1", "h2").count().where(F.col("count") >= 2)
            .select("h1", "h2")
        )
        hits = wins.join(dup_keys.hint("shuffle_hash"), ["h1", "h2"], "leftsemi").select("doc_id", "pos")
        by_doc = Window.partitionBy("doc_id").orderBy("pos")
        grp = (
            hits.withColumn(
                "brk",
                F.when(F.col("pos") - F.lag("pos").over(by_doc) <= K, F.lit(0)).otherwise(F.lit(1)),
            )
            .withColumn("g", F.sum("brk").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)))
        )
        return grp.groupBy("doc_id", "g").agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + K).alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        ).select("doc_id", "span_start", "span_end", "n_windows")

    variants = {"window": window_form, "semi": semi_form}
    res = {n: sorted(map(tuple, b().collect())) for n, b in variants.items()}
    assert res["window"] == res["semi"], "results differ"
    print(f"results identical: {len(res['semi'])} spans")

    for name, b in variants.items():
        ts = []
        for _ in range(args.n):
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(f"{name:7s} min={min(ts):.3f} runs={['%.3f' % t for t in ts]}")


if __name__ == "__main__":
    main()
