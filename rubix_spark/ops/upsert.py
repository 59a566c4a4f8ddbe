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

from pyspark.sql import DataFrame, Window
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

    Contract notes (r13 review — both were silent data loss/duplication):
    - a matched target row whose current flag is NULL counts as NOT current: it
      stays untouched history. The old pair of filters (``WHERE is_current`` /
      ``WHERE NOT is_current``) each rejected NULL, so the row fell through BOTH
      branches and vanished from the output.
    - multiple source rows for one key build the full SCD2 version CHAIN in one
      batch: each version close-dates at the NEXT version's ts (lead over the
      source), only the last is current, and the target's old current row
      close-dates at the key's FIRST new ts. The old inner-join emitted N
      conflicting close-dated copies of the old current row plus N
      simultaneously-"current" versions. Exact duplicate source rows collapse;
      remaining equal-ts rows order deterministically by their attribute struct.
    """
    other = [c for c in source.columns if c not in (key, ts_col)]
    src = source.distinct()
    order = [F.col(ts_col)] + ([F.struct(*[F.col(c) for c in other])] if other else [])
    src_v = src.withColumn(
        "_next_ts", F.lead(ts_col).over(Window.partitionBy(key).orderBy(*order))
    )
    first_ts = src.groupBy(key).agg(F.min(ts_col).alias("_new_ts"))
    cur = F.coalesce(F.col(current_flag), F.lit(False))
    closed = (
        target.join(first_ts, key, "inner")
        .where(cur)
        .withColumn(end_col, F.col("_new_ts"))
        .withColumn(current_flag, F.lit(False))
        .drop("_new_ts")
    )
    untouched = target.join(
        src.select(key), key, "left_anti"
    ).unionByName(target.join(src.select(key), key, "left_semi").where(~cur))
    end_type = dict(target.dtypes)[end_col]
    new_rows = (
        src_v.withColumn(current_flag, F.col("_next_ts").isNull())
        .withColumn(end_col, F.col("_next_ts").cast(end_type))
        .drop(ts_col, "_next_ts")
    )
    return untouched.unionByName(closed).unionByName(new_rows)
