"""Bucketed tables: shuffle-free co-located joins (the 100 TB join strategy).

``bucketBy(n, key)`` pre-shuffles a table ON WRITE; any later equi-join or aggregation on
that key reads co-located buckets and skips the exchange entirely — at 100 TB that's the
difference between an hourly pipeline re-shuffling 100 TB per run and reading it in
place. This is the Spark analog of the reference's stable split→node ownership (consistent
hashing, ``ClusterManager.java:127-130``): both pin data placement by key so repeated
work lands where the data already is.

Requires ``saveAsTable`` (bucket metadata lives in the catalog, not the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed (and optionally sorted) by key into the session catalog."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across sessions but their warehouse dirs
    # survive — clear the location so saveAsTable doesn't refuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plan must contain no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
