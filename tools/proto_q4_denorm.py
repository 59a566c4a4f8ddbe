"""Prototype (round-10, r9 verdict #2): q4 over DENORMALIZED fact layouts.

Hypothesis: q4's residual cost is the two dimension probes (customer map into
15M orders rows, supplier map into the 11.8M-row SMJ output) — not the scans or
the merge. Materializing the FK->dimension-key closure INTO the fact layouts at
ingest (l_suppkey -> s_nationkey onto lineitem, o_custkey -> c_nationkey onto
orders, both still bucketed+sorted by orderkey) removes both probes AND both
broadcasts: the ASIA membership filters push to the scans (lineitem side shrinks
5x BEFORE the merge), the agg groups by the materialized int.

100 TB story: at sf1000 the customer broadcast (~150M rows) is infeasible and the
current plan would fall off a cliff to a shuffled join; the denormalized int
column keeps it a local scan filter forever. Storage cost: +8 B/row at ingest.

Usage: python tools/proto_q4_denorm.py [--sf DIR] [--n 5]
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rubix_spark import catalog
    from rubix_spark.fns import money_sum_fast
    from rubix_spark.queries import load_all
    from rubix_spark.sources.bucketing import bucketed_table, persisted_bucketed

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

    # ---- one-time artifacts (untimed) -------------------------------------
    bucketed_table(spark, sf, "lineitem", "l_orderkey")
    bucketed_table(spark, sf, "orders", "o_orderkey")

    def build_li_dn():
        li = catalog.table(spark, sf, "lineitem")
        supp = catalog.table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
        return (
            li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left")
            .drop("s_suppkey")
            .withColumnRenamed("s_nationkey", "l_supp_natkey")
        )

    def build_ord_dn():
        o = catalog.table(spark, sf, "orders")
        cust = catalog.table(spark, sf, "customer").select("c_custkey", "c_nationkey")
        return (
            o.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"), "left")
            .drop("c_custkey")
            .withColumnRenamed("c_nationkey", "o_cust_natkey")
        )

    t0 = time.time()
    li_dn = persisted_bucketed(spark, "lineitem_dn", f"{sf}/lineitem.parquet",
                               build_li_dn, "l_orderkey")
    ord_dn = persisted_bucketed(spark, "orders_dn", f"{sf}/orders.parquet",
                                build_ord_dn, "o_orderkey")
    print(f"denorm artifacts ready in {time.time()-t0:.1f}s")

    nr = (
        catalog.table(spark, sf, "nation")
        .join(F.broadcast(catalog.table(spark, sf, "region").where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    asia = [r[0] for r in nr.select("n_nationkey").collect()]
    print("ASIA nationkeys:", asia)

    def q4_denorm():
        li = (
            li_dn.select("l_orderkey", "l_supp_natkey", "l_extendedprice", "l_discount")
            .where(F.col("l_supp_natkey").isin(asia))
        )
        o = (
            ord_dn.select("o_orderkey", "o_cust_natkey")
            .where(F.col("o_cust_natkey").isin(asia))
        )
        # the natkey equality must stay a RESIDUAL condition: written as a plain
        # EqualTo(attr, attr) Catalyst promotes it to a second join key, whose
        # hashpartitioning(natkey, orderkey) no longer matches the bucket layout
        # and re-shuffles BOTH fact sides (measured: Exchange+Sort on each).
        # (a - b) == 0 references both sides inside one expression, so it can
        # only ever be an "other condition" of the orderkey SMJ.
        g = (
            li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
            .where((F.col("l_supp_natkey") - F.col("o_cust_natkey")) == 0)
            .groupBy("l_supp_natkey")
            .agg(money_sum_fast(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                                "revenue"))
        )
        return g.join(F.broadcast(nr), F.col("l_supp_natkey") == F.col("n_nationkey")).select(
            "n_name", "revenue")

    current = load_all()["q4_star_join"].builder

    # correctness first
    a = sorted(map(tuple, q4_denorm().collect()))
    b = sorted(map(tuple, current(spark, sf).collect()))
    print("rows match:", a == b, f"({len(a)} rows)")
    if a != b:
        print("DENORM:", a)
        print("CURRENT:", b)
        sys.exit(1)

    # interleaved A/B
    cur_t, dn_t = [], []
    for i in range(args.n):
        t0 = time.time(); current(spark, sf).collect(); cur_t.append(time.time() - t0)
        t0 = time.time(); q4_denorm().collect(); dn_t.append(time.time() - t0)
    print(f"current: min={min(cur_t):.3f}  samples={[round(t,3) for t in cur_t]}")
    print(f"denorm : min={min(dn_t):.3f}  samples={[round(t,3) for t in dn_t]}")
    q4_denorm().explain("formatted")


if __name__ == "__main__":
    main()
