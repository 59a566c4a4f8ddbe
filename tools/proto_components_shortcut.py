"""Prototype (round-11, r10 verdict #6): connected components with POINTER
JUMPING (label shortcutting) added to the hash-min propagation round.

The shipped loop needs #rounds ~ graph DIAMETER (each round a node learns only
its direct neighbors' labels). The amplified fixtures' rotated replicas build
doc -> rot(doc) -> rot2(doc) chains, so diameter grows with the replication
factor — the r8 sf30 probe ran 13x sf10's time on 3x the data. Shortcutting
composes label[x] <- label[label[x]] each round (one extra self-join of the
LABELS table, much narrower than the edge join), which doubles the effective
pointer length per round: O(log diameter) rounds total. This is the
large-star/small-star family (Kiveris et al., "Connected Components in
MapReduce and Beyond") — the 100 TB-correct shape.

Usage: python tools/proto_components_shortcut.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shortcut_components(edges, src="src", dst="dst", max_iter=20, log=print):
    from pyspark.sql import functions as F

    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").unionByName(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        prop = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
            (F.coalesce("nmin", "label") < F.col("label")).alias("moved"),
        )
        # pointer jump: label <- label(label). The parent side is the SAME frame
        # aliased to fresh names (invariant 12: self-derived join sides).
        parent = prop.select(
            F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
        )
        updated = (
            prop.join(parent, prop["label"] == parent["p_id"], "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("p_label", "label")).alias("label"),
                (
                    F.col("moved")
                    | (F.coalesce("p_label", "label") < F.col("label"))
                ).alias("moved"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.where("moved").count()
        labels = updated.select("doc_id", "label")
        if changed == 0:
            break
    log(f"shortcut rounds: {rounds}")
    return labels.select("doc_id", F.col("label").alias("component"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/rubix_testdata/sf1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from rubix_spark import catalog
    from rubix_spark.ops import dedup
    from rubix_spark.queries import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # bench.py sizes shuffle partitions by input bytes; a fixed 32 OOM'd the sf30
    # probe (per-task shuffle state x 32 threads in one heap) — allow an override
    parts = os.environ.get("RUBIX_PROTO_SHUFFLE_PARTS", cpus)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf

    # same candidate edges the graded row uses (x1_minhash_lsh pairs)
    pairs = dedup.minhash_lsh(spark, sf).localCheckpoint(eager=True)

    a = sorted(map(tuple, shortcut_components(pairs, "doc_a", "doc_b").collect()))
    b = sorted(map(tuple,
                   dedup.connected_components(pairs, "doc_a", "doc_b").collect()))
    print("labels match:", a == b, f"({len(a)} nodes)")
    if a != b:
        bad = [(x, y) for x, y in zip(a, b) if x != y][:5]
        print("mismatches:", bad)
        sys.exit(1)

    current = load_all()["x1_dedup_components"].builder
    cur_t, new_t = [], []
    for _ in range(args.n):
        t0 = time.time(); current(spark, sf).collect(); cur_t.append(time.time() - t0)
        t0 = time.time()
        shortcut_components(pairs, "doc_a", "doc_b", log=lambda *_: None).collect()
        new_t.append(time.time() - t0)
    print(f"current : min={min(cur_t):.3f}  samples={[round(t,3) for t in cur_t]}")
    print(f"shortcut: min={min(new_t):.3f}  samples={[round(t,3) for t in new_t]}")


if __name__ == "__main__":
    main()
