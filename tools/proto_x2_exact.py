"""A/B: interpreted HOF-fold cosine (x2_ann_bruteforce) vs a numpy kernel that
reproduces the fold BIT-IDENTICALLY.

The SQL form evaluates, per row, ``aggregate(zip_with(v,q,x*y), 0.0, acc+x)`` —
a strict left fold in element order.  numpy can replicate that exact order
vectorized ACROSS rows by accumulating one dimension at a time::

    acc = zeros(n); for d in range(D): acc += m[:, d] * q[d]

Each row's sum then sees the identical sequence of IEEE adds, so cosine values
are bit-equal to the interpreted fold (asserted here over every row), and the
DuckDB oracle carries over unchanged.

    python -u tools/proto_x2_exact.py [--sf DIR] [--n 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_np_exact(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F
    from rubix_spark import catalog
    from rubix_spark.fns import round_det
    from rubix_spark.ops.similarity import QUERY_VEC_ID, TOP_K, _py_dot

    emb = catalog.table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    row = emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    q = np.asarray(row.embedding, dtype=np.float64)
    q_norm = float(_py_dot(row.embedding, row.embedding)) ** 0.5
    k = TOP_K

    def score(batches):
        import numpy as np
        import pyarrow as pa

        ids = np.empty(0, dtype=np.int64)
        sims = np.empty(0, dtype=np.float64)
        for b in batches:
            col = b.column(1)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            if n == 0:
                continue
            offs = col.offsets.to_numpy(zero_copy_only=False)
            flat = col.values.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            d = int(widths[0])
            if not (widths == d).all():
                raise ValueError("ragged embedding column")
            m = flat[offs[0]:offs[-1]].astype(np.float64).reshape(n, d)
            dq = np.zeros(n)
            dv = np.zeros(n)
            for j in range(d):
                c = m[:, j]
                dq += c * q[j]
                dv += c * c
            s = dq / (np.sqrt(dv) * q_norm)
            ids = np.concatenate([ids, b.column(0).to_numpy(zero_copy_only=False)])
            sims = np.concatenate([sims, s])
            if len(ids) > 8 * k:
                key = -np.where(np.isnan(sims), np.inf, sims)
                sel = np.lexsort((ids, key))[:k]
                ids, sims = ids[sel], sims[sel]
        if len(ids):
            key = -np.where(np.isnan(sims), np.inf, sims)
            sel = np.lexsort((ids, key))[:k]
            yield pa.record_batch({"vec_id": pa.array(ids[sel], pa.int64()),
                                   "_sim": pa.array(sims[sel], pa.float64())})

    part = emb.mapInArrow(score, "vec_id bigint, _sim double")
    return (
        part.orderBy(F.col("_sim").desc(), "vec_id")
        .limit(k)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from rubix_spark import catalog
    from rubix_spark.queries import load_all

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
    reg = load_all()

    # bit-identity check over EVERY row, not just the top-k: compare the raw
    # cosine of the HOF fold vs the dim-loop kernel
    import numpy as np
    from pyspark.sql import functions as F
    from rubix_spark.ops.similarity import QUERY_VEC_ID, cosine_lit, _py_dot

    emb = catalog.table(spark, args.sf, "embeddings")
    qrow = emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    hof = {r.vec_id: r.s for r in emb.select(
        "vec_id", cosine_lit("embedding", list(qrow.embedding)).alias("s")).collect()}
    q = np.asarray(qrow.embedding, dtype=np.float64)
    q_norm = float(_py_dot(qrow.embedding, qrow.embedding)) ** 0.5
    rows = emb.select("vec_id", "embedding").collect()
    bad = 0
    for r in rows:
        m = np.asarray(r.embedding, dtype=np.float64)
        dq = 0.0
        dv = 0.0
        for j in range(len(m)):
            dq += m[j] * q[j]
            dv += m[j] * m[j]
        s = dq / (np.sqrt(dv) * q_norm)
        if not (s == hof[r.vec_id] or (np.isnan(s) and np.isnan(hof[r.vec_id]))):
            bad += 1
    print(f"bit-identity: {len(rows) - bad}/{len(rows)} rows equal")
    assert bad == 0

    variants = {
        "hof_fold": lambda: reg["x2_ann_bruteforce"].builder(spark, args.sf),
        "np_exact": lambda: build_np_exact(spark, args.sf),
    }
    res = {n: sorted((r.vec_id, r.sim) for r in b().collect()) for n, b in variants.items()}
    assert res["hof_fold"] == res["np_exact"], (res["hof_fold"], res["np_exact"])
    print("top-k identical")

    for name, b in variants.items():
        ts = []
        for _ in range(args.n):
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(f"{name:9s} min={min(ts):.3f} runs={['%.3f' % t for t in ts]}")


if __name__ == "__main__":
    main()
