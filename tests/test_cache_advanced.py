"""Async warm-up (A10/A18), ownership ring (A12/A21), validator (A25), stress loop
(rubix-stress analog: bounded cache + repeated queries → evictions, results stay correct).
"""

from __future__ import annotations

import os
import shutil

import pytest

from rubix_spark.cache import CacheManager
from rubix_spark.cache.ring import locate_key, split_owners
from tests.conftest import SF_SMOKE


@pytest.fixture()
def remote_dir(tmp_path):
    d = tmp_path / "remote"
    d.mkdir()
    for t in ("nation", "region", "orders", "customer"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_async_warmup_serves_remote_then_hits(spark, remote_dir, tmp_path):
    """Parallel warm-up: first read serves remote immediately (no cache entry yet),
    background fetch populates; subsequent read hits (RemoteFetchRequestChain analog)."""
    cm = CacheManager(spark, str(tmp_path / "cache"), async_warmup=True)
    path = f"{remote_dir}/nation.parquet"
    first = _rows(cm.read(path))
    assert cm.drain_warmup(60)
    assert cm.manifest.get(path) is not None  # background warm landed
    second = _rows(cm.read(path))
    assert first == second
    s = cm.stats()
    assert s["hits"] == 1 and s["misses"] == 1 and s["warmed_files"] == 1


def test_async_warmup_dedupes_requests(spark, remote_dir, tmp_path):
    """Duplicate queued requests collapse (RemoteFetchProcessor merge semantics)."""
    cm = CacheManager(spark, str(tmp_path / "cache"), async_warmup=True)
    path = f"{remote_dir}/orders.parquet"
    assert cm._warmup.enqueue(path) in (True, False)
    second_enqueue = cm._warmup.enqueue(path)
    cm.drain_warmup(60)
    assert second_enqueue is False or cm.stats()["warmed_files"] == 1


def test_ring_stability_under_membership_change():
    """Consistent hashing: removing one node remaps only that node's keys (A21)."""
    nodes = [f"host{i}" for i in range(8)]
    keys = [f"/data/file{i}.parquet" for i in range(500)]
    before = {k: locate_key(k, nodes) for k in keys}
    smaller = [n for n in nodes if n != "host3"]
    after = {k: locate_key(k, smaller) for k in keys}
    moved = [k for k in keys if before[k] != after[k]]
    # only keys owned by the removed node move
    assert all(before[k] == "host3" for k in moved)
    assert 20 <= len(moved) <= 140  # ≈ 1/8 of 500, generous bounds


def test_split_owners_shape():
    """256 MiB split ownership mirrors BookKeeper.java:272-281 key structure."""
    owners = split_owners("/data/big.parquet", int(1.5 * 1024**3), ["a", "b", "c"])
    assert len(owners) == 6  # ceil(1.5GiB / 256MiB)
    assert owners[0][0] == 0 and owners[-1][1] == int(1.5 * 1024**3)
    assert {o[2] for o in owners} <= {"a", "b", "c"}


def test_validator_repairs_broken_entries(spark, remote_dir, tmp_path):
    """A25 self-test: corrupt a cached copy on disk → validate() invalidates it."""
    cm = CacheManager(spark, str(tmp_path / "cache"))
    path = f"{remote_dir}/nation.parquet"
    expected = _rows(cm.read(path))
    entry = cm.manifest.get(path)
    shutil.rmtree(entry.local_path)
    report = cm.validate()
    assert report == {"checked": 1, "broken": 1, "repaired": 1, "orphans_swept": 0}
    assert cm.manifest.get(path) is None
    # next read re-warms and returns the same data
    assert _rows(cm.read(path)) == expected


def test_stress_loop_bounded_cache(spark, remote_dir, tmp_path):
    """rubix-stress analog: working set > budget, repeated mixed reads force evictions
    while every result stays correct (fact_tables.sql sizing intent)."""
    tables = ["nation", "region", "orders", "customer"]
    sizes = {t: os.path.getsize(f"{remote_dir}/{t}.parquet") for t in tables}
    budget = int(sum(sizes.values()) * 0.6)
    cm = CacheManager(spark, str(tmp_path / "cache"), budget_bytes=budget)
    expected = {t: _rows(spark.read.parquet(f"{remote_dir}/{t}.parquet")) for t in tables}
    for round_i in range(3):
        for t in tables:
            assert _rows(cm.read(f"{remote_dir}/{t}.parquet")) == expected[t], (round_i, t)
    s = cm.stats()
    assert s["evictions"] >= 1
    assert cm.manifest.total_bytes() <= budget


def test_ttl_expiry(spark, remote_dir, tmp_path):
    """expireAfterWrite analog (BookKeeper.java:674-680): entries past TTL are
    invalidated on access and transparently re-warmed."""
    import time as _time

    cm = CacheManager(spark, str(tmp_path / "cache"), ttl_seconds=0.5)
    path = f"{remote_dir}/nation.parquet"
    first = _rows(cm.read(path))
    _time.sleep(0.7)
    second = _rows(cm.read(path))
    assert first == second
    s = cm.stats()
    assert s["invalidations"] == 1 and s["warmed_files"] == 2 and s["hits"] == 0
