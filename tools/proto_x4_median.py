"""A/B: per-group applyInArrow median vs ONE vectorized mapInArrow pass.

The applyInArrow form (r12 session 1) pays one Python dispatch + one tiny Arrow
table per GROUP (~150k groups at sf10).  The mapInArrow form pays one dispatch per
PARTITION and reduces every group in the partition with a single lexsort +
segmented gather — the per-group Python cost goes to zero.

    python -u tools/proto_x4_median.py [--sf DIR] [--n 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_map(batches):
    import numpy as np
    import pyarrow as pa

    us, vs = [], []
    sentinel = np.iinfo(np.int64).min
    for b in batches:
        ucol, vcol = b.column(0), b.column(1)
        if ucol.null_count:
            import pyarrow.compute as pc
            ucol = pc.fill_null(ucol, sentinel)
        us.append(ucol.to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        vs.append(vcol.to_numpy(zero_copy_only=False))
    if not us:
        return
    u = np.concatenate(us)
    v = np.concatenate(vs)
    all_u = np.unique(u)
    valid = ~np.isnan(v)
    uv, vv = u[valid], v[valid]
    order = np.lexsort((vv, uv))
    uv, vv = uv[order], vv[order]
    grp_u, starts, counts = np.unique(uv, return_index=True, return_counts=True)
    med = (vv[starts + (counts - 1) // 2] + vv[starts + counts // 2]) / 2.0
    out = np.full(len(all_u), np.nan)
    out[np.searchsorted(all_u, grp_u)] = med
    ua = pa.array(all_u, pa.int64())
    if all_u.size and all_u[0] == sentinel:
        ua = pa.array(np.where(all_u == sentinel, 0, all_u), pa.int64(),
                      mask=(all_u == sentinel))
    yield pa.record_batch({"user_id": ua,
                           "med_raw": pa.array(out, pa.float64(), from_pandas=True)})


def build_map(spark, sf_dir):
    from pyspark.sql import functions as F
    from rubix_spark import catalog
    from rubix_spark.fns import round_det

    events = catalog.table(spark, sf_dir, "events")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        events.select("user_id", "value")
        .repartition(n, "user_id")
        .mapInArrow(_median_map, schema="user_id bigint, med_raw double")
        .select("user_id", round_det(F.col("med_raw")).alias("med"))
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

    variants = {
        "applyInArrow": lambda: reg["x4_udf_grouped_median_arrow"].builder(spark, args.sf),
        "mapInArrow": lambda: build_map(spark, args.sf),
    }
    # correctness first: sorted collect equality
    rows = {}
    for name, b in variants.items():
        rows[name] = sorted((r.user_id, r.med) for r in b().collect())
    assert rows["applyInArrow"] == rows["mapInArrow"], "results differ"
    print(f"results identical: {len(rows['mapInArrow'])} groups")

    for name, b in variants.items():
        ts = []
        for _ in range(args.n):
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(f"{name:14s} min={min(ts):.3f} runs={['%.3f' % t for t in ts]}")


if __name__ == "__main__":
    main()
