"""``rubix_cache`` — a Spark Python Data Source that reads through the cache layer.

This is the literal "Spark data source integration for caching" the charter names
(BASELINE.json ``spark_approach``): after ``register_cache_source(spark, cache_dir)``,

    spark.read.format("rubix_cache").option("path", remote_path).load()

resolves the path through the CacheManager at *plan time* (hit → the warmed local copy,
miss → read-through warm, stale → invalidate + re-warm — all A2/A6/A16 semantics), then
scans whatever copy won as Arrow record batches, one input partition per parquet
row-group for parallelism.

Reference parity: this is the ``CachingFileSystem.open()`` seam
(``rubix-core/.../CachingFileSystem.java:227-260``) expressed as a DataSource instead of
a Hadoop FileSystem shim — the engine's scan API is the integration point in both
designs. Locality note: partition→row-group mapping is where ``preferredLocations`` from
``cache/ring.py`` plugs in on a real cluster (the Python DS API doesn't expose it yet, so
the local build relies on Spark's default placement).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_MANAGERS: dict[str, object] = {}


def _manager(cache_dir: str):
    """One sessionless CacheManager per cache_dir.

    DataSource planning runs in a dedicated python worker with no SparkSession, so the
    manager operates in sessionless mode: warm() is a local file copy there (manifest /
    generation / staleness semantics unchanged).
    """
    if cache_dir not in _MANAGERS:
        from rubix_spark.cache.manager import CacheManager

        _MANAGERS[cache_dir] = CacheManager(None, cache_dir)
    return _MANAGERS[cache_dir]


def _resolve(options: dict) -> str:
    """Plan-time path resolution through the cache (read-through warm on miss)."""
    remote = options["path"]
    cache_dir = options.get("cache_dir", "/tmp/rubix_spark_cache/ds")
    cm = _manager(cache_dir)
    entry = cm.manifest.get(remote)
    if entry is not None and cm._fresh(entry, remote):
        cm.manifest.touch(remote)
        with cm._lock:
            cm._counters["hits"] += 1
        return entry.local_path
    with cm._lock:
        cm._counters["misses"] += 1
    if entry is not None:
        cm.invalidate(remote)
    local = cm.warm(remote) if cm.cacheable(remote) else None
    return local if local and cm.manifest.get(remote) is not None else remote


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def _normalize_schema(schema):
    """Spark's Arrow bridge accepts only µs timestamps; retime ms/ns fields."""
    import pyarrow as pa

    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
        else:
            fields.append(f)
    return pa.schema(fields)


@dataclass
class _FilePartition(InputPartition):
    file: str
    row_group: int


class RubixCacheReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._options = options
        self._resolved = _resolve(options)

    def partitions(self):
        import pyarrow.parquet as pq

        parts = []
        for f in _parquet_files(self._resolved):
            for rg in range(pq.ParquetFile(f).num_row_groups):
                parts.append(_FilePartition(file=f, row_group=rg))
        return parts or [_FilePartition(file=self._resolved, row_group=-1)]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        table = pf.read_row_group(partition.row_group) if partition.row_group >= 0 else pf.read()
        yield from table.cast(_normalize_schema(table.schema)).to_batches()


class RubixCacheDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rubix_cache"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _parquet_files(_resolve(self.options))
        return from_arrow_schema(_normalize_schema(pq.read_schema(files[0])))

    def reader(self, schema: StructType) -> DataSourceReader:
        return RubixCacheReader(schema, self.options)


def register_cache_source(spark) -> None:
    """Register the rubix_cache format with a session."""
    spark.dataSource.register(RubixCacheDataSource)


def cache_source_stats(cache_dir: str = "/tmp/rubix_spark_cache/ds") -> dict:
    """Metrics surface of the data-source-scoped cache manager (A27)."""
    return _manager(cache_dir).stats()
