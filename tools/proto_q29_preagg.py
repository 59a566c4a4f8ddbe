"""Round-14 prototype (r13 verdict #3 follow-through): q29's custkey exchange fed
by per-orderkey pre-aggregated revenue instead of raw join output.

Why not the verdict's literal Bloom filter: the round-10 denorm layout already
pushes the customer-region semi-join into the orders scan as an In() filter on
the materialized o_cust_natkey (PushedFilters: In(o_cust_natkey, [...])) —
"customer in ASIA/EUROPE/AMERICA" is EXACTLY "o_cust_natkey IN nks", so a Bloom
filter over the filtered custkeys can never drop a row that filter keeps (every
order's custkey exists in customer). The remaining §2.3 lever is the volume of
the (custkey, natkey, yr) aggregate's exchange: its input is the ~4-lines-per-
order join stream, and the group cardinality (~customers x years) is high enough
that map-side partial aggregation barely reduces it. Pre-summing revenue units
per l_orderkey INSIDE the lineitem buckets (exchange-free: subset partitioning)
collapses the join stream to one row per order before the custkey shuffle.

q4's pre-agg was rejected (r8) because its selective lineitem filter left ~1.3
surviving lines/group; q29's lineitem side keeps ~every line (IS NOT NULL), so
the pre-agg collapses ~4:1 — the arithmetic that sank q4 favors q29.

NULL semantics: per-order SUM(units) is NULL iff every line's unit is NULL;
the outer SUM skips NULL partials — identical to the flat SUM's skip-NULLs.

Usage: python tools/proto_q29_preagg.py [SF_DIR] [--n 4]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rubix_spark import catalog, get_session
from rubix_spark.fns import money_from_units
from rubix_spark.queries import load_all

REG = load_all()
SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rubix_testdata/sf10"
N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 4


def cust_sales_preagg(spark, sf_dir):
    from rubix_spark.sources.bucketing import bucketed_table
    from rubix_spark.sources.dictionaries import region_nationkeys

    nks = region_nationkeys(spark, sf_dir, ("ASIA", "EUROPE", "AMERICA"))
    unit = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    li_pre = (
        bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
        .select("l_orderkey", "l_supp_natkey", unit.alias("u"))
        .where(F.col("l_supp_natkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.sum("u").alias("su"))
    )
    orders = (
        bucketed_table(spark, sf_dir, "orders", "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_cust_natkey", "o_orderdate")
        .where(F.col("o_cust_natkey").isin(nks))
        .hint("merge")
    )
    nr = (
        catalog.table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                catalog.table(spark, sf_dir, "region").where(
                    F.col("r_name").isin("ASIA", "EUROPE", "AMERICA")
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    g = (
        li_pre.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_cust_natkey").alias("nk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(money_from_units(F.sum("su"), "rev"))
    )
    return g.join(F.broadcast(nr), F.col("nk") == F.col("n_nationkey")).select(
        "c_custkey", F.col("n_name").alias("nation"), "yr", "rev"
    )


def q29_preagg(spark, sf_dir):
    from pyspark.sql import Window

    cust_sales = cust_sales_preagg(spark, sf_dir).localCheckpoint()
    from rubix_spark.fns import money_sum_fast

    nation_year = cust_sales.groupBy("nation", "yr").agg(money_sum_fast("rev", "nation_rev"))
    w0 = Window.partitionBy("c_custkey", "nation").orderBy("yr")
    joined = (
        cust_sales.select(
            "nation", "c_custkey",
            F.col("yr").alias("yr1"),
            F.col("rev").alias("rev1"),
            F.lead("rev").over(w0).alias("rev2"),
            F.lead("yr").over(w0).alias("_yr2"),
        )
        .where((F.col("_yr2") == F.col("yr1") + 1) & (F.col("rev2") > F.col("rev1")))
        .join(F.broadcast(nation_year.withColumnRenamed("yr", "yr1")), ["nation", "yr1"])
        .select("nation", "c_custkey", "yr1", "rev1", "rev2", "nation_rev")
    )
    w = Window.partitionBy("nation", "yr1").orderBy(
        (F.col("rev2") - F.col("rev1")).desc(), F.col("c_custkey")
    )
    return joined.select("*", F.rank().over(w).alias("rk")).where(F.col("rk") <= 5)


def timed(fn, n=N):
    best = None
    rows = None
    for i in range(n):
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        print(f"  run {i}: {dt:.3f}s")
        best = dt if best is None else min(best, dt)
    return best, rows


spark = get_session(app_name="proto-q29-preagg")
spark.sparkContext.setLogLevel("ERROR")
catalog.analyze(spark, SF, route=True)

print("current q29:")
b_cur, r_cur = timed(lambda: REG["q29_deep_cte"].builder(spark, SF))
print("preagg q29:")
b_pre, r_pre = timed(lambda: q29_preagg(spark, SF))
print("current q29 (2nd position):")
b_cur2, _ = timed(lambda: REG["q29_deep_cte"].builder(spark, SF))
print("preagg q29 (2nd position):")
b_pre2, _ = timed(lambda: q29_preagg(spark, SF))

same = sorted(map(tuple, r_cur)) == sorted(map(tuple, r_pre))
print(
    f"RESULT rows_equal={same} n_rows={len(r_cur)} "
    f"current={min(b_cur, b_cur2):.3f}s preagg={min(b_pre, b_pre2):.3f}s"
)
