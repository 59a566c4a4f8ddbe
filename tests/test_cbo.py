"""catalog.analyze — ANALYZE TABLE statistics feeding Spark's cost-based optimizer.

The scale story: size-only planning sees a dimension's FILE size; only row/column stats
let the planner see that a *filtered* dimension fits a broadcast. The test pins the
decision flip itself: same query, same thresholds — sort-merge without stats, broadcast
with them. (AQE is disabled inside the test so the *planning-time* decision is visible;
at runtime AQE could rescue the plan only after materializing both shuffle sides.)
"""

from __future__ import annotations

import contextlib

from rubix_spark import catalog
from tests.conftest import SF_T2

_JOIN = """
SELECT o.o_orderkey, c.c_name FROM rx_orders o
JOIN rx_customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey <= 50
"""


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _spark_plan(spark, sql: str) -> str:
    return spark.sql(sql)._jdf.queryExecution().sparkPlan().toString()


def test_analyze_stats_flip_filtered_dim_to_broadcast(spark):
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",
            # between the CBO post-filter estimate (~50 rows) and customer's file size
            "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024),
            "spark.sql.cbo.enabled": "false",
        },
    ):
        # external tables, no statistics yet: planner sees file size -> sort-merge
        for name in ("orders", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS rx_{name}")
            spark.sql(
                f"CREATE TABLE rx_{name} USING parquet LOCATION '{SF_T2}/{name}.parquet'"
            )
        before = _spark_plan(spark, _JOIN)
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before

        stats = catalog.analyze(spark, SF_T2, names=("orders", "customer"))
        assert stats["customer"]["rows"] and stats["customer"]["rows"] > 0
        assert stats["orders"]["bytes"] and stats["orders"]["bytes"] > 0

        # same query, same threshold: min/max column stats price c_custkey <= 50 at
        # ~3% selectivity, the estimate drops under the threshold -> broadcast
        after = _spark_plan(spark, _JOIN)
        assert "BroadcastHashJoin" in after, after

        # cleanup: drop the catalog tables and switch CBO back off for other tests
        for name in ("orders", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS rx_{name}")
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


def test_analyze_route_prefixes_are_per_dir(spark, tmp_path):
    """Routing two sf_dirs must not silently re-point one dir's tables at the other
    (ADVICE r5): default routed prefixes embed a digest of sf_dir, and explicitly
    reusing a routed prefix for a different dir raises."""
    import shutil

    from tests.conftest import SF_SMOKE

    alt = tmp_path / "sfalt"
    alt.mkdir()
    for name in catalog.TABLES:
        src = f"{SF_SMOKE}/{name}.parquet"
        shutil.copy(src, alt / f"{name}.parquet")
    try:
        catalog.analyze(spark, SF_T2, route=True)
        catalog.analyze(spark, str(alt), route=True)  # distinct digest prefix: fine
        routed = spark._rubix_analyzed_prefix
        assert routed[SF_T2.rstrip("/")] != routed[str(alt)]
        # explicit reuse of the first dir's prefix for another dir must refuse
        import pytest as _pytest

        with _pytest.raises(ValueError):
            catalog.analyze(spark, str(alt), prefix=routed[SF_T2.rstrip("/")], route=True)
        # and each dir's catalog.table still reads its own data
        assert catalog.table(spark, SF_T2, "nation").count() == catalog.table(
            spark, str(alt), "nation"
        ).count()
    finally:
        routed = getattr(spark, "_rubix_analyzed_prefix", {})
        for d in (SF_T2.rstrip("/"), str(alt)):
            p = routed.pop(d, None)
            if p:
                for name in catalog.TABLES:
                    spark.sql(f"DROP TABLE IF EXISTS {p}{name}")
        memo = getattr(spark, "_rubix_table_memo", {})
        for k in [k for k in memo if k[0] in (SF_T2.rstrip("/"), str(alt))]:
            del memo[k]
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


def test_analyze_reports_stats_for_all_fixture_tables(spark):
    """analyze() must succeed across every fixture table (incl. events' timestamp and
    embeddings' array column, where column stats are restricted to supported types)."""
    stats = catalog.analyze(spark, SF_T2, prefix="rxall_")
    try:
        for name, st in stats.items():
            assert st["rows"] is not None and st["rows"] > 0, (name, st)
    finally:
        for name in stats:
            spark.sql(f"DROP TABLE IF EXISTS rxall_{name}")
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
