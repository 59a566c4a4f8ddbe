"""Deterministic scale-factor amplifier for the driver's parquet fixtures.

Produces an sf-N fixture directory from an existing one by replicating each table
``--factor`` times with key-space shifts, so that per-key cardinalities (orders per
customer, lineitems per order, events per user) stay EXACTLY what they are in the
source — the join fan-outs and group counts scale linearly, which is what a scale-up
benchmark must hold constant. Everything runs as Spark jobs (the engine under test
generates its own benchmark data; no driver-side row loops).

The reference sizes its perf database the same way — ``perf/perf.go`` points at a
SF=100 TPC-DS warehouse; the scale, not the generator, is the point.

Degenerate-duplicate guards (replicating text/vectors verbatim would make every row a
10-way exact dup and turn dedup/ANN benchmarks quadratic):
- ``documents.text``: replica i's token sequence is rotated by 7i+1 positions, which
  preserves length and vocabulary (quality/langid/token-count costs unchanged) while
  shifting every shingle (MinHash/SimHash see distinct documents);
- ``embeddings.embedding``: replica i's vector is rotated by i dimensions — norms and
  pairwise geometry within a replica are preserved, replicas decorrelate.

Usage:
    python tools/gen_sf.py --src /root/testdata/sf0.1 --out /tmp/rubix_testdata/sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from rubix_spark import get_session  # noqa: E402
from rubix_spark.catalog import ensure_session_confs  # noqa: E402

# (key columns to shift) per table; shift unit = 1 + max(key) of the PRIMARY table
# owning that key, so replicas occupy disjoint, consistent key ranges across tables.
_KEY_OWNERS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}
_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    # user_id shifts by its own range: sessions-per-user stays constant (10× users,
    # not 10× events per user — the latter would blow streaming state shape, not size)
    "events": {"event_id": "events", "user_id": "user"},
}
_COPY_ONLY = ("region", "nation")
_BIG = {"lineitem": 16, "orders": 8, "events": 8, "documents": 8, "embeddings": 8}


def _replicate(df: DataFrame, factor: int, shifts: dict[str, int]) -> DataFrame:
    reps = df.sparkSession.range(factor).withColumnRenamed("id", "_rep")
    out = df.crossJoin(F.broadcast(reps))
    for col, unit in shifts.items():
        out = out.withColumn(col, (F.col(col) + F.col("_rep") * F.lit(unit)).cast(dict(df.dtypes)[col]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/rubix_testdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_session(app_name="gen-sf")
    ensure_session_confs(spark)
    # µs on disk so every reader (incl. pyarrow footer unit detection) sees micros
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    src = {t: spark.read.parquet(f"{args.src.rstrip('/')}/{t}.parquet")
           for t in list(_SHIFTS) + list(_COPY_ONLY)}
    units = {name: src[name].agg(F.max(key)).first()[0] + 1 for name, key in _KEY_OWNERS.items()}
    units["user"] = src["events"].agg(F.max("user_id")).first()[0] + 1

    for t in _COPY_ONLY:
        src[t].coalesce(1).write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied")

    for t, shift_spec in _SHIFTS.items():
        shifts = {col: units[owner] for col, owner in shift_spec.items()}
        df = _replicate(src[t], args.factor, shifts)
        if t == "documents":
            # rotate the token sequence by 7*rep+1 for rep>0: same length/vocab,
            # every shingle shifted -> replicas are NOT near-dups of each other
            df = (
                df.withColumn("_w", F.split("text", " "))
                .withColumn("_r", (F.lit(7) * F.col("_rep") + 1) % F.greatest(F.size("_w"), F.lit(1)))
                .withColumn(
                    "text",
                    F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                        # the 'r<rep>' prefix token keeps token-PERIODIC texts (36% of
                        # the fixture is repetitive boilerplate, for which any rotation
                        # is the identity) from collapsing into 10-way exact dups
                        F.concat(
                            F.lit("r"),
                            F.col("_rep").cast("string"),
                            F.lit(" "),
                            F.array_join(
                                F.concat(
                                    F.expr("slice(_w, CAST(_r AS INT) + 1, size(_w) - CAST(_r AS INT))"),
                                    F.expr("slice(_w, 1, CAST(_r AS INT))"),
                                ),
                                " ",
                            ),
                        )
                    ),
                )
                .withColumn("n_chars", F.length("text").cast(dict(src[t].dtypes)["n_chars"]))
                .drop("_w", "_r")
            )
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                    F.expr(
                        "concat(slice(embedding, CAST(_rep % size(embedding) AS INT) + 1,"
                        " size(embedding) - CAST(_rep % size(embedding) AS INT)),"
                        " slice(embedding, 1, CAST(_rep % size(embedding) AS INT)))"
                    )
                ),
            )
        df = df.drop("_rep")
        parts = _BIG.get(t, 2)
        df.repartition(parts).write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: x{args.factor} -> {parts} files")

    # only stop a session this CLI created — getOrCreate() may have handed us a
    # caller's live session (the test suite drives main() against its shared fixture)
    if not preexisting:
        spark.stop()


if __name__ == "__main__":
    main()
