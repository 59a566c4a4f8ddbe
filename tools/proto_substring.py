"""Prototype (round-11, r10 verdict #7): x1_substring_dedup shuffle-width cut.

The current form shuffles the 32-char md5 HEX STRING as the duplicate-count key
(stage 1) after transferring the full K-token window string out of the Arrow
kernel. Candidate: drop md5 for a PAIR of independent xxhash64 longs
(h1=xxhash64(sh), h2=xxhash64(sh, 1) — 128 bits total, same birthday bound as
md5), computed JVM-side right after the kernel; the count window partitions on
(h1, h2) and the shuffle moves 16 bytes of key instead of ~40. The hash is
internal (both engines only compare duplicate POSITION SETS), so the oracle is
untouched.

Usage: python tools/proto_substring.py [--sf DIR] [--n 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rubix_spark import catalog
    from rubix_spark.ops import dedup
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
    K = dedup._SUBSTR_K

    def substring_new():
        docs = catalog.table(spark, sf, "documents").select("doc_id", "text")
        wins = docs.mapInPandas(
            # reuse the exact shipped kernel
            _kernel_of(dedup), "doc_id bigint, pos long, sh string"
        ).select(
            "doc_id", "pos",
            F.xxhash64(F.col("sh")).alias("h1"),
            F.xxhash64(F.col("sh"), F.lit(1)).alias("h2"),
        )
        hits = (
            wins.withColumn("c", F.count("*").over(Window.partitionBy("h1", "h2")))
            .where(F.col("c") >= 2)
            .select("doc_id", "pos")
        )
        by_doc = Window.partitionBy("doc_id").orderBy("pos")
        grp = (
            hits.withColumn(
                "brk",
                F.when(F.col("pos") - F.lag("pos").over(by_doc) <= K,
                       F.lit(0)).otherwise(F.lit(1)),
            )
            .withColumn("g", F.sum("brk").over(
                by_doc.rowsBetween(Window.unboundedPreceding, 0)))
        )
        return grp.groupBy("doc_id", "g").agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + K).alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        ).select("doc_id", "span_start", "span_end", "n_windows")

    current = load_all()["x1_substring_dedup"].builder

    a = sorted(map(tuple, substring_new().collect()))
    b = sorted(map(tuple, current(spark, sf).collect()))
    print("rows match:", a == b, f"({len(a)} rows)")
    if a != b:
        print("mismatches:", [(x, y) for x, y in zip(a, b) if x != y][:5])
        sys.exit(1)

    cur_t, new_t = [], []
    for _ in range(args.n):
        t0 = time.time(); current(spark, sf).collect(); cur_t.append(time.time() - t0)
        t0 = time.time(); substring_new().collect(); new_t.append(time.time() - t0)
    print(f"current: min={min(cur_t):.3f}  samples={[round(t,3) for t in cur_t]}")
    print(f"new    : min={min(new_t):.3f}  samples={[round(t,3) for t in new_t]}")


def _kernel_of(dedup_mod):
    """Extract the shipped win_kernel by rebuilding it with the module's K."""
    K = dedup_mod._SUBSTR_K

    def win_kernel(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            if not len(pdf):
                continue
            text = pa.array(pdf["text"], pa.string())
            norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
            norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(norm, " +", " "))
            toks = pc.split_pattern(norm, " ")
            flat = toks.values
            offs = toks.offsets.to_numpy()
            n = len(flat)
            if n < K:
                continue
            sh_all = pc.binary_join_element_wise(
                *[flat.slice(j, n - K + 1) for j in range(K)], " "
            )
            idx = np.arange(n - K + 1)
            doc_of = np.searchsorted(offs, idx, side="right") - 1
            valid = idx <= offs[doc_of + 1] - K
            if not valid.any():
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_of[valid]],
                    "pos": (idx - offs[doc_of])[valid],
                    "sh": sh_all.to_numpy(zero_copy_only=False)[valid],
                }
            )

    return win_kernel


if __name__ == "__main__":
    main()
