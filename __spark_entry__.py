"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``rubix_spark.queries.REGISTRY``: every implemented operator from
SURVEY.md §2.B (Q1..Q20, X1..X5, S1..S2) registers a (spark, sf_dir) -> DataFrame builder
plus a DuckDB oracle SQL string (None → rows-only check for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rubix_spark.queries import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q4 star join — perf/query_tpcds.sql shape) on sf0.001."""
    registry = load_all()
    return registry["q4_star_join"].builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
