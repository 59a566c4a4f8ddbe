"""MERGE / upsert emulation (no Delta/Iceberg jars in this image — plain parquet).

``merge_upsert`` = the classic MERGE INTO decomposition: updates win over existing rows
(anti-join out the matched targets, union in the source), everything else passes through.
``scd2_apply`` layers slowly-changing-dimension-2 history on top: matched rows are
close-dated instead of dropped, and new versions open-dated.

Scale notes: both are single-shuffle-per-side equi-joins on the key; with the target
stored bucketed by key (sources/bucketing.py) the anti-join reads co-located buckets and
only the source shuffles. This is exactly how MERGE executes under Delta before
deletion-vector optimizations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Rows of target not matched by source, plus all of source (source wins)."""
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    key: str,
    ts_col: str,
    current_flag: str = "is_current",
    end_col: str = "end_ts",
) -> DataFrame:
    """SCD2: close-date current rows that the source supersedes; append new versions.

    target schema must carry ``is_current: boolean`` and ``end_ts: timestamp`` columns;
    source rows provide the new attribute values with their effective ``ts_col``.
    """
    src_keys = source.select(key, F.col(ts_col).alias("_new_ts"))
    closed = (
        target.join(src_keys, key, "inner")
        .where(F.col(current_flag))
        .withColumn(end_col, F.col("_new_ts"))
        .withColumn(current_flag, F.lit(False))
        .drop("_new_ts")
    )
    untouched = target.join(
        src_keys.select(key), key, "left_anti"
    ).unionByName(target.join(src_keys.select(key), key, "left_semi").where(~F.col(current_flag)))
    # the source's ts_col only sets the close date of superseded rows; the new version
    # row itself carries the target schema (open-ended, current)
    new_rows = (
        source.drop(ts_col)
        .withColumn(current_flag, F.lit(True))
        .withColumn(end_col, F.lit(None).cast(dict(target.dtypes)[end_col]))
    )
    return untouched.unionByName(closed).unionByName(new_rows)
