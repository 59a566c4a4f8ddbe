"""Declared query inventory (SURVEY.md §2.B) + extension operators (X1..X4, S1..S2).

Every query registers itself into ``REGISTRY`` with:
- ``builder(spark, sf_dir) -> DataFrame``  — the Spark-native implementation
- ``oracle``                               — equivalent DuckDB SQL (None → rows-only check)

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: registry population) and return the registry."""
    import rubix_spark.queries.relational  # noqa: F401
    import rubix_spark.queries.extended  # noqa: F401
    import rubix_spark.ops.dedup  # noqa: F401
    import rubix_spark.ops.similarity  # noqa: F401
    import rubix_spark.ops.text  # noqa: F401
    import rubix_spark.ops.udf  # noqa: F401
    import rubix_spark.ops.multimodal  # noqa: F401
    import rubix_spark.ops.asof  # noqa: F401
    import rubix_spark.ops.pipeline  # noqa: F401
    import rubix_spark.streaming.events  # noqa: F401
    import rubix_spark.streaming.stateful  # noqa: F401
    import rubix_spark.cache.queries  # noqa: F401

    return REGISTRY
