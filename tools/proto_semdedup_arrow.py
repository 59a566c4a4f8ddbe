"""Round-14 probe: x1_semantic_dedup_np's Python boundary (guide §4.2).

The tiled kernel ships ~nb replicated copies of every embedding through a
groupBy().applyInPandas exchange; Arrow->pandas turns each array<double> cell
into a Python list and `_sem_split` re-materializes it per task
(`rows["embedding"].tolist()` + np.array(list-of-lists)) — a per-row object
round-trip the matmul never needed. Variant: applyInArrow + a vectorized
split that gathers the tile matrix straight from the ListArray's contiguous
values buffer (one fancy-index per tile, NaN for null elements, same
degradation contract: NULL/off-width rows leave the matrix and come back
kept).

Also prints the cluster-size distribution (sum n_c^2 is the intrinsic pair
work — data-dependent; moved between corpus generations).

Usage: python -u tools/proto_semdedup_arrow.py [--sf DIR] [--n 3] [--check]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arrow_split(tbl):
    """Arrow twin of ops.dedup._sem_split: (normalized matrix | None, ok ids,
    n_rows, ok_mask) from an applyInArrow tile table."""
    import numpy as np
    import pyarrow as pa

    emb = tbl.column("embedding").combine_chunks()
    ids = tbl.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(emb)
    offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offs[1:] - offs[:-1]
    if emb.null_count:
        valid = emb.is_valid().to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, -1)
    good = lens[lens >= 0]
    if not len(good):
        return None, ids[:0], ids, np.zeros(n, dtype=bool)
    width = int(np.bincount(good).argmax())
    ok = lens == width
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    idx = offs[:-1][ok][:, None] + np.arange(width)[None, :]
    m = flat[idx]
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(nrm == 0, 1.0, nrm), ids[ok], ids, ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/rubix_testdata/sf10")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    from pyspark.sql import SparkSession, functions as F

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
    from rubix_spark.ops import similarity as _sim
    from rubix_spark.queries import load_all
    from rubix_spark.sources.stats import parquet_row_count

    reg = load_all()
    SEM_TAU = dd.SEM_TAU

    # cluster balance: the intrinsic pair work is sum n_c^2 (data-dependent)
    emb = catalog.table(spark, args.sf, "embeddings")
    cents, _ = _sim._ivf_codebook(emb, (), memo_key=args.sf)
    assign = _sim._ivf_assign(emb, cents)
    sizes = [r["count"] for r in assign.groupBy("cid").count().collect()]
    n = parquet_row_count(f"{args.sf.rstrip('/')}/embeddings.parquet")
    print(
        f"clusters={len(sizes)} n={n} max={max(sizes)} min={min(sizes)} "
        f"sum_sq={sum(s * s for s in sizes):.3e} balanced_sum_sq={len(sizes) * (n / len(sizes)) ** 2:.3e}",
        flush=True,
    )

    def _tile_arrow(tbl):
        diag = tbl.column("ti")[0].as_py() == tbl.column("tj")[0].as_py()
        side = tbl.column("side").combine_chunks().to_numpy(zero_copy_only=False)
        if diag:
            sub = tbl.filter(pa.array(side == 0))
            m, ids, _, _ = _arrow_split(sub)
            if m is None or len(ids) < 2:
                return pa.table({"vec_id": pa.array([], pa.int64())})
            ii, jj = np.triu_indices(len(ids), k=1)
            s = (m @ m.T)[ii, jj]
            mask = (s >= SEM_TAU) | np.isnan(s)
            dropped = np.maximum(ids[ii[mask]], ids[jj[mask]])
        else:
            ta = tbl.filter(pa.array(side == 0))
            tb = tbl.filter(pa.array(side == 1))
            if not (len(ta) and len(tb)):
                return pa.table({"vec_id": pa.array([], pa.int64())})
            ma, ida, _, _ = _arrow_split(ta)
            mb, idb, _, _ = _arrow_split(tb)
            if ma is None or mb is None or not (len(ida) and len(idb)):
                return pa.table({"vec_id": pa.array([], pa.int64())})
            s = ma @ mb.T
            ii, jj = np.nonzero((s >= SEM_TAU) | np.isnan(s))
            dropped = np.maximum(ida[ii], idb[jj])
        return pa.table({"vec_id": pa.array(np.unique(dropped), pa.int64())})

    def _block_arrow(tbl):
        m, ids_ok, all_ids, _ = _arrow_split(tbl)
        kept = np.ones(len(all_ids), dtype=np.int32)
        if m is not None and len(ids_ok) >= 2:
            sims = m @ m.T
            ii, jj = np.triu_indices(len(ids_ok), k=1)
            s = sims[ii, jj]
            mask = (s >= SEM_TAU) | np.isnan(s)
            dropped = set(np.maximum(ids_ok[ii[mask]], ids_ok[jj[mask]]).tolist())
            kept = np.array([0 if i in dropped else 1 for i in all_ids], dtype=np.int32)
        cid = tbl.column("cid").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"vec_id": pa.array(all_ids, pa.int64()), "cid": pa.array(cid, pa.int64()),
             "kept": pa.array(kept, pa.int32())}
        )

    def arrow_form():
        tile = int(os.environ.get("RUBIX_SEM_TILE_ROWS", 4096))
        nb = max(1, math.ceil(n / _sim.N_CENTROIDS / tile))
        a = _sim._ivf_assign(emb, cents)
        if nb == 1:
            return a.groupBy("cid").applyInArrow(
                _block_arrow, schema="vec_id bigint, cid bigint, kept int"
            )
        rows = a.withColumn("cid", F.col("cid").cast("long")).withColumn(
            "bi", F.pmod(F.xxhash64("vec_id"), F.lit(nb)).cast("int")
        )
        left = rows.select(
            "vec_id", "cid", "embedding", F.lit(0).alias("side"),
            F.col("bi").alias("ti"),
            F.explode(F.sequence(F.col("bi"), F.lit(nb - 1))).alias("tj"),
        )
        right_tiles = F.when(
            F.col("bi") > 0, F.sequence(F.lit(0), F.col("bi") - 1)
        ).otherwise(F.array().cast("array<int>"))
        right = rows.select(
            "vec_id", "cid", "embedding", F.lit(1).alias("side"),
            F.explode(right_tiles).alias("ti"), F.col("bi").alias("tj"),
        )
        dropped = (
            left.unionByName(right)
            .groupBy("cid", "ti", "tj")
            .applyInArrow(_tile_arrow, schema="vec_id bigint")
            .distinct()
        )
        return a.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left").select(
            "vec_id", "cid", F.col("_d").isNull().cast("int").alias("kept")
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if args.check:
        ref = sorted(map(tuple, reg["x1_semantic_dedup_np"].builder(spark, args.sf).collect()))
        got = sorted(map(tuple, arrow_form().collect()))
        print(f"CHECK rows_equal={ref == got} n={len(ref)}", flush=True)

    def timed(name, fn):
        best = None
        for i in range(args.n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            print(f"  {name} run {i}: {dt:.3f}s", flush=True)
            best = dt if best is None else min(best, dt)
        return best

    if os.environ.get("SEM_GATED"):
        # canary-gated alternating A/B: keep only runs bracketed by healthy
        # canaries (this box degrades SIMD work ~50x in bad windows — see
        # tools/host_canary.py); stop at >=4 healthy samples per side
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from host_canary import canary, healthy

        kept = {"current": [], "arrow": []}
        fns2 = {
            "current": lambda: noop(reg["x1_semantic_dedup_np"].builder(spark, args.sf)),
            "arrow": lambda: noop(arrow_form()),
        }
        fns2["current"]()  # warm both plans once
        fns2["arrow"]()
        for round_i in range(20):
            for name in ("current", "arrow"):
                s0, c0 = canary()
                t0 = time.time()
                fns2[name]()
                dt = time.time() - t0
                s1, c1 = canary()
                ok = healthy(s0, c0) and healthy(s1, c1)
                print(
                    f"  gated {name} {round_i}: {dt:.3f}s canary={s0}/{s1}ms "
                    f"{'KEPT' if ok else 'DISCARDED'}", flush=True,
                )
                if ok:
                    kept[name].append(dt)
            if len(kept["current"]) >= 4 and len(kept["arrow"]) >= 4:
                break
        c = min(kept["current"]) if kept["current"] else float("nan")
        a = min(kept["arrow"]) if kept["arrow"] else float("nan")
        print(
            f"RESULT gated current={c:.3f} arrow={a:.3f} "
            f"kept={len(kept['current'])}/{len(kept['arrow'])}"
        )
        return

    cur = timed("current", lambda: noop(reg["x1_semantic_dedup_np"].builder(spark, args.sf)))
    arw = timed("arrow", lambda: noop(arrow_form()))
    cur2 = timed("current2", lambda: noop(reg["x1_semantic_dedup_np"].builder(spark, args.sf)))
    arw2 = timed("arrow2", lambda: noop(arrow_form()))
    print(f"RESULT current={min(cur, cur2):.3f} arrow={min(arw, arw2):.3f}")


if __name__ == "__main__":
    main()
