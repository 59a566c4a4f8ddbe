"""Small-file compaction: fewer, sized files; identical content; atomic swap layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rubix_spark.ops.maintenance import compact, parquet_files


def test_compact_rewrites_fragmented_table(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    df.repartition(40).write.parquet(path)
    assert len(parquet_files(path)) == 40

    before = {(r.id, r.k, r.v) for r in spark.read.parquet(path).collect()}
    stats = compact(spark, path, target_file_mb=16, sort_within_by="id")
    assert stats["files_before"] == 40 and stats["files_after"] < 40
    assert stats["rows"] == 100_000
    # identical content after the swap
    after = {(r.id, r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert after == before
    # no leftover temp/old dirs
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if "_compact_" in d or "_old_" in d]
