"""rubix_cache Python Data Source: read-through caching behind spark.read.format()."""

from __future__ import annotations

import os
import shutil

import pytest

from rubix_spark.sources.cached_source import register_cache_source
from tests.conftest import SF_SMOKE


@pytest.fixture()
def remote_dir(tmp_path):
    d = tmp_path / "remote"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/nation.parquet", d / "nation.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _read(spark, path, cache_dir):
    return (
        spark.read.format("rubix_cache")
        .option("path", path)
        .option("cache_dir", cache_dir)
        .load()
    )


def test_cached_source_roundtrip_and_hit(spark, remote_dir, tmp_path):
    register_cache_source(spark)
    cache_dir = str(tmp_path / "dscache")
    path = f"{remote_dir}/nation.parquet"
    direct = _rows(spark.read.parquet(path))
    first = _rows(_read(spark, path, cache_dir))
    assert first == direct  # read-through warm, same data
    # delete the remote: the source must keep serving from cache (the reference's
    # signature behavior, TestCachingInputStream.java:165-177)
    os.remove(path)
    second = _rows(_read(spark, path, cache_dir))
    assert second == direct


def test_cached_source_parallel_partitions(spark, remote_dir, tmp_path):
    register_cache_source(spark)
    cache_dir = str(tmp_path / "dscache2")
    path = f"{remote_dir}/nation.parquet"
    df = _read(spark, path, cache_dir)
    assert df.count() == spark.read.parquet(path).count()
    # partitioning is per row-group: at least one input partition materialized
    assert df.rdd.getNumPartitions() >= 1
