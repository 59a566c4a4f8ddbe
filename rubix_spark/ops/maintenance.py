"""Table maintenance: small-file compaction.

The small-files problem is the quiet killer of 100 TB scan performance (this repo
measured it twice: round-1 warm copies fragmented into 32 part-files made cache hits
as slow as remote reads; a single-row-group file capped a scan at one task). Streaming
sinks, incremental upserts, and per-partition writers all produce it. ``compact``
rewrites a parquet table directory into part files sized for scan parallelism — the
OPTIMIZE/rewrite_data_files job of the lakehouse formats, on plain parquet.

Scale shape: one distributed read + one distributed write; the only coordination is
choosing the output file count from the input bytes (driver-side arithmetic on file
metadata, no data through the driver). Atomicity: written to a temp dir, then swapped
in with two renames — readers see old or new, never a mix.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def table_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    return total


def parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return sorted(out)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: str | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ceil(bytes / target) part files.

    ``sort_within_by``: optional column to sortWithinPartitions on — clusters row
    groups for predicate pushdown (the min/max-stats locality an OPTIMIZE ZORDER
    approximates on one column).

    Returns {files_before, files_after, bytes, rows}.
    """
    before = parquet_files(path)
    n_bytes = table_bytes(path)
    n_out = max(1, -(-n_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    rows = df.count()
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(sort_within_by)
    tmp = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(parquet_files(path)),
        "bytes": n_bytes,
        "rows": rows,
    }


def zorder_key(c1, c2, bits: int = 16):
    """Morton/Z-order interleave of the low ``bits`` bits of two non-negative int
    columns — the multi-column clustering key behind OPTIMIZE ZORDER: sorting by it
    gives row groups bounded min/max spans in BOTH dimensions, so parquet stats prune
    scans filtered on either column. Pure JVM bit arithmetic (shift/and/or), constant-
    folded into one codegen'd expression; pass the result to
    ``compact(sort_within_by=...)``-style sortWithinPartitions.
    """
    from pyspark.sql import Column, functions as F

    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key.bitwiseOR(F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
            .bitwiseOR(F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
        )
    return key
