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
        wins = docs.mapInArrow(
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

    def np_count_kernel(batches):
        # partition == all occurrences of its keys (hash-partitioned on h1,h2):
        # a within-partition count IS the global count. Buffer the partition,
        # count via lexsort-free unique on the packed key, emit dup rows only.
        import numpy as np
        import pandas as pd

        parts = [b for b in batches if len(b)]
        if not parts:
            return
        doc = np.concatenate([p["doc_id"].to_numpy() for p in parts])
        pos = np.concatenate([p["pos"].to_numpy() for p in parts])
        h1 = np.concatenate([p["h1"].to_numpy() for p in parts])
        h2 = np.concatenate([p["h2"].to_numpy() for p in parts])
        # exact pair comparison: sort by (h1,h2) to group, then segment counts
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        new = np.empty(len(h1s), dtype=bool)
        new[0] = True
        np.not_equal(h1s[1:], h1s[:-1], out=new[1:])
        np.logical_or(new[1:], h2s[1:] != h2s[:-1], out=new[1:])
        seg = np.cumsum(new) - 1
        cnt = np.bincount(seg)
        dup = cnt[seg] >= 2
        keep = order[dup]
        yield pd.DataFrame({"doc_id": doc[keep], "pos": pos[keep]})

    def np_islands_kernel(batches):
        import numpy as np
        import pandas as pd

        parts = [b for b in batches if len(b)]
        if not parts:
            return
        doc = np.concatenate([p["doc_id"].to_numpy() for p in parts])
        pos = np.concatenate([p["pos"].to_numpy() for p in parts])
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        brk = np.empty(len(doc), dtype=bool)
        brk[0] = True
        np.not_equal(doc[1:], doc[:-1], out=brk[1:])
        np.logical_or(brk[1:], pos[1:] - pos[:-1] > K, out=brk[1:])
        seg = np.cumsum(brk) - 1
        n = seg[-1] + 1
        starts = pos[brk]
        ends = np.zeros(n, dtype=pos.dtype)
        np.maximum.at(ends, seg, pos)
        counts = np.bincount(seg)
        yield pd.DataFrame(
            {
                "doc_id": doc[brk],
                "span_start": starts.astype("int64"),
                "span_end": (ends + K).astype("int64"),
                "n_windows": counts.astype("int64"),
            }
        )

    def np_wins(narrow=True):
        docs = catalog.table(spark, args.sf, "documents").select("doc_id", "text")
        return docs.mapInArrow(
            dd._substring_win_kernel, f"doc_id bigint, pos {'int' if narrow else 'long'}, sh string"
        ).select(
            "doc_id", "pos",
            F.xxhash64(F.col("sh")).alias("h1"),
            F.xxhash64(F.lit(1), F.col("sh")).alias("h2"),
        )

    def np_full():
        wins = np_wins()
        hits = wins.repartition("h1", "h2").mapInPandas(
            np_count_kernel, "doc_id bigint, pos int"
        )
        out = hits.repartition("doc_id").mapInPandas(
            np_islands_kernel,
            "doc_id bigint, span_start long, span_end long, n_windows long",
        )
        noop(out)

    def np_islands_only():
        # engine count window + numpy islands (isolates the two replacements)
        wins = np_wins()
        h = (
            wins.withColumn("c", F.count("*").over(Window.partitionBy("h1", "h2")))
            .where(F.col("c") >= 2)
            .select("doc_id", "pos")
        )
        out = h.repartition("doc_id").mapInPandas(
            np_islands_kernel,
            "doc_id bigint, span_start long, span_end long, n_windows long",
        )
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

    # correctness: np pipeline output must equal the registered query's rows
    def np_full_df():
        wins = np_wins()
        hits_df = wins.repartition("h1", "h2").mapInPandas(np_count_kernel, "doc_id bigint, pos int")
        return hits_df.repartition("doc_id").mapInPandas(
            np_islands_kernel,
            "doc_id bigint, span_start long, span_end long, n_windows long",
        )

    variants = os.environ.get(
        "SUBSTR_VARIANTS", "kernel,hits,full,narrow_full,np_islands_only,np_full"
    ).split(",")

    if "check" in variants:
        ref = sorted(map(tuple, reg["x1_substring_dedup"].builder(spark, args.sf).collect()))
        got = sorted(map(tuple, np_full_df().collect()))
        print(f"CHECK np_full rows_equal={ref == got} n={len(ref)}", flush=True)

    # warm the kernel path once (python workers, JIT)
    kernel()
    fns = {
        "kernel": kernel, "hits": hits, "full": full, "narrow_full": narrow_full,
        "np_islands_only": np_islands_only, "np_full": np_full,
    }
    res = {v: timed(v, fns[v]) for v in variants if v in fns}
    print("RESULT " + " ".join(f"{k}={v:.3f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
