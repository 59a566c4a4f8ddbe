"""Round-8 prototype (r7 verdict #4): q4 with revenue pre-aggregated per
(l_orderkey, s_nationkey) INSIDE the bucket scan, before the merge join.

The supplier probe moves onto the lineitem scan (ASIA filter drops 4/5 of rows
during the probe), then a bucket-local aggregate collapses line items to
(orderkey, supplier-nation) unit sums — aggregation accepts SUBSET partitioning,
so it is exchange-free over the orderkey buckets — and the merge join then
probes ~orders-sized pre-aggregated rows instead of the raw 60M. Measured
keep-or-reject like the denorm prototype.
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


def q4_preagg(spark, sf_dir):
    from rubix_spark.sources.bucketing import bucketed_table

    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    orders = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    t = catalog.load(spark, sf_dir, ("customer", "supplier", "nation", "region"))
    nr = (
        t["nation"]
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nr.select("n_nationkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(nr.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey")
    )
    unit = F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000 + F.lit(0.5)).cast("long")
    # pre-agg inside the buckets: subset partitioning (orderkey ⊂ (orderkey, nk))
    li_pre = (
        li.select("l_orderkey", "l_suppkey", unit.alias("u"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_orderkey", "s_nationkey")
        .agg(F.sum("u").alias("su"))
    )
    o_f = (
        orders.select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    g = (
        li_pre.join(o_f.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("s_nationkey")
        .agg(money_from_units(F.sum("su"), "revenue"))
    )
    return g.join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "n_name", "revenue"
    )


def timed(fn, n=4):
    best, rows = None, None
    for _ in range(n):
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


spark = get_session(app_name="proto-q4-preagg")
catalog.analyze(spark, SF, route=True)

# interleave to neutralize the position effect (invariant 22)
b_cur, r_cur = timed(lambda: REG["q4_star_join"].builder(spark, SF))
b_pre, r_pre = timed(lambda: q4_preagg(spark, SF))
b_cur2, _ = timed(lambda: REG["q4_star_join"].builder(spark, SF))
b_pre2, _ = timed(lambda: q4_preagg(spark, SF))

same = sorted(map(tuple, r_cur)) == sorted(map(tuple, r_pre))
print(f"RESULT rows_equal={same} current={min(b_cur, b_cur2):.3f}s preagg={min(b_pre, b_pre2):.3f}s")
