"""PROTOTYPE (round 8, for round 9): q30 brand-dictionary probe — measured, not shipped.

The round-8 sf30 decomposition (idle, 48g heap, min-of-2 noop sinks) localized q30's
cost to the part probe, not the merge join or agg:

    scan lineitem only              0.93 s
    + orderkey merge join           1.50 s
    + broadcast part probe (6M)     6.63 s   <-- 5.1 s: the 6M-entry hash map
    + (yr, brand) aggregate         7.87 s
    alt: pre-agg (yr, partkey)     25.41 s   REJECTED (42M-group hash agg on 180M rows)

This prototype applies the q4/q29/q19 narrow-probe rule q30 never got: broadcast
(p_partkey -> bid:int) with bid from a 25-entry brand dictionary, group by
(yr:int, bid:int), attach the brand STRING on the ~175-row aggregate:

    current (string through probe + group key)   8.90 s
    proto   (int probe + key, late name)         7.17 s   (-19%, rows identical)

Worth shipping in round 9 WITH regenerated scale artifacts (invariant 20) — a
measured-source change here in round 8 would postdate the committed artifacts.
The residual cost is the 6M-long hash probe itself; the only deeper lever is a
partkey-bucketed layout for part+lineitem, which loses the orderkey merge (measured
worse in the r7 denorm prototype family).

Run: SPARK_GRAFT_DRIVER_MEM=48g python tools/proto_q30_dict.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from rubix_spark import catalog, get_session
    from rubix_spark.sources.bucketing import bucketed_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rubix_testdata/sf10"
    spark = get_session(app_name="proto-q30-dict")
    spark.sparkContext.setLogLevel("ERROR")
    li = bucketed_table(spark, sf, "lineitem", "l_orderkey")
    orders = bucketed_table(spark, sf, "orders", "o_orderkey")
    part = catalog.table(spark, sf, "part")

    def t(name, df):
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts):.2f}s", flush=True)

    base = li.where(F.col("l_returnflag").isNotNull()).select("l_orderkey", "l_partkey", "l_quantity")
    merged = base.join(
        orders.select("o_orderkey", "o_orderdate").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    units = F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")).alias("s")

    cur = (
        merged.join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"), F.col("p_brand").alias("brand"))
        .agg(units)
    )
    t("current (string probe+key)", cur)

    dict_df = part.select("p_brand").distinct().select(
        "p_brand", F.dense_rank().over(Window.orderBy("p_brand")).alias("bid")
    )
    part_small = part.select("p_partkey", "p_brand").join(F.broadcast(dict_df), "p_brand").select("p_partkey", "bid")
    agg = (
        merged.join(F.broadcast(part_small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"), "bid")
        .agg(units)
    )
    proto = agg.join(F.broadcast(dict_df), "bid").select("yr", F.col("p_brand").alias("brand"), "s")
    t("proto (int probe+key, late name)", proto)

    a = sorted(map(tuple, cur.collect()))
    b = sorted((r.yr, r.brand, r.s) for r in proto.collect())
    print("rows equal:", a == b, len(a))


if __name__ == "__main__":
    main()
