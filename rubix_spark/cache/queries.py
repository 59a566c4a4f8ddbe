"""Cache-integrated query: the flagship star join read *through* the CacheManager.

This is the reference's end-to-end story (engine query over CachingFileSystem,
``CachingFileSystem.java:227-260``) in one correctness-gated entry: first execution warms
the cache (read-through, A6), repeat executions hit warmed local parquet — and the result
is hash-identical to the direct-read oracle either way (the warm/cold equivalence
contract, FIXTURES.md §4).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark.cache.manager import CacheManager
from rubix_spark.fns import duck_sum2, money_sum_fast
from rubix_spark.queries import register

_managers: dict[str, CacheManager] = {}


def _manager(spark: SparkSession, sf_dir: str) -> CacheManager:
    """One session-scoped manager per sf_dir (embedded mode — A26's default for us)."""
    key = sf_dir.rstrip("/")
    if key not in _managers:
        cache_dir = os.path.join(tempfile.gettempdir(), "rubix_spark_cache", key.replace("/", "_"))
        _managers[key] = CacheManager(spark, cache_dir)
    return _managers[key]


@register(
    "c1_cached_star_join",
    f"""
    SELECT n.n_name, {duck_sum2('l.l_extendedprice', 'rev')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "Star join where every table is read through the cache layer (read-through warm on "
        "first run, local-parquet hits after); results must equal the direct-read oracle — "
        "the warm/cold equivalence gate."
    ),
)
def cached_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cm = _manager(spark, sf_dir)
    sf = sf_dir.rstrip("/")
    li = cm.read(f"{sf}/lineitem.parquet")
    orders = cm.read(f"{sf}/orders.parquet")
    customer = cm.read(f"{sf}/customer.parquet")
    nation = cm.read(f"{sf}/nation.parquet")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money_sum_fast("l_extendedprice", "rev"))
    )


@register(
    "c2_datasource_scan",
    f"""
    SELECT l_returnflag, COUNT(*) AS cnt, {duck_sum2('l_extendedprice', 'rev')}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Scan through the rubix_cache Python Data Source (spark.read.format('rubix_cache')): "
        "plan-time cache resolution + read-through warm, Arrow-batch reads partitioned per "
        "parquet row-group — the literal 'Spark data source integration for caching'."
    ),
)
def datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rubix_spark.catalog import ensure_session_confs
    from rubix_spark.sources.cached_source import register_cache_source

    # sets spark.sql.python.filterPushdown.enabled, without which Spark refuses to
    # plan a DataSource that implements pushFilters() — must happen HERE, not rely on
    # an earlier query having touched the catalog (c2 can run first / alone)
    ensure_session_confs(spark)
    register_cache_source(spark)
    li = (
        spark.read.format("rubix_cache")
        .option("path", f"{sf_dir.rstrip('/')}/lineitem.parquet")
        .option("cache_dir", os.path.join(tempfile.gettempdir(), "rubix_spark_cache", "ds"))
        # the Python DS API has no column-pruning pushdown — pass the projection so
        # only 2 of 11 column chunks are decoded and shipped through Arrow
        .option("columns", "l_returnflag,l_extendedprice")
        .load()
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"), money_sum_fast("l_extendedprice", "rev")
    )
