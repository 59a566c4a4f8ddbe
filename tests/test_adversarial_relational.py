"""Adversarial-warehouse oracle parity for the relational inventory.

The driver's TPC-H-ish generation is well-formed; this fixture stresses the
declared contract's edges instead: NULL foreign keys, NULL dimension names and
report keys (q3/q28/q31's dictionary slot-1 NULLs), NULL money columns, DANGLING
foreign keys, unicode names, boundary dates, and a hot order. Every oracle-bearing
query whose SQL references only the seven relational tables is compared against
DuckDB on it — the same cross-engine sweep the driver runs at sf0.01, pointed at
data the generator never produces.
"""

from __future__ import annotations

import datetime
import random
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rubix_spark.queries import load_all

REG = load_all()
_REL = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
_OTHER = ("events", "documents", "embeddings")


def _relational_queries():
    names = []
    for n, q in REG.items():
        if q.oracle is None:
            continue
        o = q.oracle.lower()
        if any(re.search(r"\b" + t + r"\b", o) for t in _OTHER):
            continue
        if any(re.search(r"\b" + t + r"\b", o) for t in _REL):
            names.append(n)
    return names


@pytest.fixture(scope="module")
def adversarial_wh_dir(tmp_path_factory):
    rng = random.Random(67)
    d = tmp_path_factory.mktemp("advwh")

    def write(name, cols):
        pq.write_table(pa.table(cols), str(d / f"{name}.parquet"))

    write("region", {
        "r_regionkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "r_name": pa.array(["ASIA", "AMERICA", "EUROPE", "AFRICA", None]),
    })
    write("nation", {
        "n_nationkey": pa.array(list(range(8)), pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1", None, "NÄTION_3",
                            "NATION_4", "NATION_5", "NATION_6", "NATION_7"]),
        # NULL regionkey + a dangling regionkey (9)
        "n_regionkey": pa.array([0, 0, 1, 1, 2, None, 9, 4], pa.int32()),
    })
    n_cust = 40
    write("customer", {
        "c_custkey": pa.array(list(range(n_cust)), pa.int64()),
        "c_name": pa.array([None if i % 11 == 3 else f"Cüstomer#{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array([None if i % 7 == 2 else i % 8 for i in range(n_cust)], pa.int32()),
        "c_acctbal": pa.array([None if i % 13 == 5 else round(rng.uniform(-999, 9999), 2)
                               for i in range(n_cust)], pa.float64()),
        "c_mktsegment": pa.array([None if i % 17 == 1 else rng.choice(["BUILDING", "AUTOMOBILE", ""])
                                  for i in range(n_cust)]),
    })
    n_supp = 12
    write("supplier", {
        "s_suppkey": pa.array(list(range(n_supp)), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array([None if i == 4 else i % 8 for i in range(n_supp)], pa.int32()),
        "s_acctbal": pa.array([round(rng.uniform(-100, 5000), 2) for i in range(n_supp)], pa.float64()),
    })
    n_part = 25
    write("part", {
        "p_partkey": pa.array(list(range(n_part)), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_part)]),
        "p_brand": pa.array([None if i % 9 == 4 else f"Brand#{i % 5}" for i in range(n_part)]),
        "p_type": pa.array([rng.choice(["STANDARD", "ECONOMY", None]) for i in range(n_part)]),
        "p_size": pa.array([None if i % 8 == 6 else rng.randint(1, 50) for i in range(n_part)], pa.int32()),
        "p_retailprice": pa.array([None if i % 10 == 7 else round(rng.uniform(900, 2000), 2)
                                   for i in range(n_part)], pa.float64()),
    })
    n_ord = 300
    statuses = ["O", "F", "P", None]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", None]
    write("orders", {
        "o_orderkey": pa.array(list(range(n_ord)), pa.int64()),
        "o_custkey": pa.array([None if i % 19 == 8 else rng.randrange(n_cust + 3)  # some dangling
                               for i in range(n_ord)], pa.int64()),
        "o_orderstatus": pa.array([statuses[i % 4] for i in range(n_ord)]),
        "o_totalprice": pa.array([None if i % 23 == 11 else round(rng.uniform(100, 300000), 2)
                                  for i in range(n_ord)], pa.float64()),
        "o_orderdate": pa.array(
            [None if i % 29 == 13 else
             datetime.datetime(1992 + i % 7, 1 + i % 12, 1 + i % 28)
             for i in range(n_ord)], pa.timestamp("us")),
        "o_orderpriority": pa.array([prios[i % 4] for i in range(n_ord)]),
    })
    rows = []
    for i in range(2500):
        ok = 0 if i % 50 == 7 else rng.randrange(n_ord + 4)  # hot order 0 + dangling keys
        rows.append((
            ok,
            None if i % 31 == 9 else rng.randrange(n_part + 2),
            None if i % 37 == 10 else rng.randrange(n_supp + 2),
            i % 7 + 1,
            None if i % 41 == 12 else float(rng.randint(1, 50)),
            None if i % 43 == 14 else round(rng.uniform(1, 90000), 2),
            None if i % 47 == 15 else rng.choice([0.0, 0.05, 0.1, 1.0]),
            rng.choice([0.0, 0.04, 0.08]),
            None if i % 27 == 5 else rng.choice(["A", "N", "R"]),
            None if i % 33 == 6 else rng.choice(["F", "O"]),
            None if i % 39 == 11 else
            datetime.datetime(1992 + i % 8, 1 + i % 12, 1 + i % 28),
        ))
    write("lineitem", {
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
        "l_discount": pa.array([r[6] for r in rows], pa.float64()),
        "l_tax": pa.array([r[7] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in rows]),
        "l_linestatus": pa.array([r[9] for r in rows]),
        "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
    })
    return str(d)


def _canon(rows):
    return sorted(rows, key=lambda row: tuple((x is None, x if x is not None else 0) for x in row))


@pytest.mark.parametrize("name", _relational_queries())
def test_relational_ops_match_oracle_on_adversarial_warehouse(spark, adversarial_wh_dir, name):
    import duckdb

    q = REG[name]
    con = duckdb.connect()
    for t in _REL:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{adversarial_wh_dir}/{t}.parquet'")
    o = _canon(tuple(r) for r in con.execute(q.oracle).fetchall())
    con.close()
    s = _canon(tuple(r) for r in q.builder(spark, adversarial_wh_dir).collect())
    assert s == o, f"{name}: spark={len(s)} rows, oracle={len(o)} rows; first diff: " + str(
        next(((a, b) for a, b in zip(s, o) if a != b), None) if len(s) == len(o) else "row count"
    )
