"""Round-10 denormalized fact layouts (sources/bucketing._denorm_build).

Two claims need repo-side proof:
1. The materialized columns EQUAL the joins they replace (ingest correctness).
2. The size-branched graded bodies (q4, q30) match their DuckDB oracles when the
   LAYOUT branch is FORCED — the sf0.01 oracle gate only exercises the shuffle
   branch (row counts sit under the 2M threshold), so without this the denorm
   bodies would ship oracle-unchecked.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.queries import load_all
from rubix_spark.sources.bucketing import bucketed_table
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

REGISTRY = load_all()


def test_lineitem_denorm_columns_match_joins(spark):
    li_dn = bucketed_table(spark, SF_SMOKE, "lineitem", "l_orderkey")
    li = catalog.table(spark, SF_SMOKE, "lineitem")
    supp = catalog.table(spark, SF_SMOKE, "supplier")
    # l_supp_natkey == the supplier join's s_nationkey, row for row
    mismatch = (
        li_dn.select("l_orderkey", "l_linenumber", "l_suppkey", "l_supp_natkey")
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .where(~F.col("l_supp_natkey").eqNullSafe(F.col("s_nationkey")))
        .count()
    )
    assert mismatch == 0
    assert li_dn.count() == li.count()  # left joins never change row counts


def test_orders_denorm_column_matches_join(spark):
    o_dn = bucketed_table(spark, SF_SMOKE, "orders", "o_orderkey")
    cust = catalog.table(spark, SF_SMOKE, "customer")
    mismatch = (
        o_dn.select("o_orderkey", "o_custkey", "o_cust_natkey")
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left")
        .where(~F.col("o_cust_natkey").eqNullSafe(F.col("c_nationkey")))
        .count()
    )
    assert mismatch == 0


def test_lineitem_bid_matches_dictionary(spark):
    """The ingest-time bid equals the session dictionary's bid for every row —
    the one assignment rule both sides must share (dictionaries.py module doc)."""
    from rubix_spark.sources.dictionaries import brand_dictionary, brand_probe

    li_dn = bucketed_table(spark, SF_SMOKE, "lineitem", "l_orderkey")
    pid = brand_probe(
        catalog.table(spark, SF_SMOKE, "part"),
        brand_dictionary(spark, SF_SMOKE),
    )
    mismatch = (
        li_dn.select("l_partkey", "l_brand_bid")
        .join(pid, F.col("l_partkey") == F.col("p_partkey"), "left")
        .where(~F.col("l_brand_bid").eqNullSafe(F.col("bid")))
        .count()
    )
    assert mismatch == 0


@pytest.mark.parametrize("name,env", [
    ("q4_star_join", "RUBIX_Q4_LAYOUT_MIN_ROWS"),
    ("q30_yoy_delta", "RUBIX_Q30_LAYOUT_MIN_ROWS"),
])
def test_forced_layout_branch_matches_oracle(spark, monkeypatch, name, env):
    monkeypatch.setenv(env, "0")
    q = REGISTRY[name]
    problems = compare(q.builder(spark, SF_SMOKE), q.oracle, SF_SMOKE)
    assert not problems, f"{name} (layout branch): " + "; ".join(problems)
