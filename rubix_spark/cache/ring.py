"""Consistent-hash ownership ring — reference parity A12/A21.

The reference assigns each 256 MiB split of a remote file to a worker via a consistent
hash over cluster membership (``ClusterManager.java:43-46, 127-130``; ownership key
``remotePath + splitIndex`` at ``BookKeeper.java:272-281``), so every node warms and
serves a stable subset of the data and membership churn only remaps 1/n of the keys.

Spark-side this becomes *locality preference*, not a data plane: `owners()` maps a file's
splits onto the current executor set (``sc.statusTracker``), and a cluster deployment
would feed that into task placement (DataSource V2 ``InputPartition.preferredLocations``)
so scan tasks land where the cache copy lives.  On local[N] there is one host and the
ring is trivially single-node — the math is still exercised by tests because it's pure.

Rendezvous (highest-random-weight) hashing instead of a ring of virtual nodes: same
1/n-remap property, no ring state, deterministic from (key, node) alone.
"""

from __future__ import annotations

import hashlib

DEFAULT_SPLIT_BYTES = 256 * 1024 * 1024  # reference default: CacheConfig.java:181


def _weight(key: str, node: str) -> int:
    return int.from_bytes(hashlib.md5(f"{key}|{node}".encode()).digest()[:8], "big")


def locate_key(key: str, nodes: list[str]) -> str:
    """Owner of a key under rendezvous hashing (ClusterManager.locateKey analog)."""
    if not nodes:
        raise ValueError("no nodes")
    return max(sorted(nodes), key=lambda n: _weight(key, n))


def split_owners(
    remote_path: str,
    file_size: int,
    nodes: list[str],
    split_bytes: int = DEFAULT_SPLIT_BYTES,
) -> list[tuple[int, int, str]]:
    """[(split_start, split_end, owner_node)] for a file — BookKeeper.java:272-281 analog.

    The ownership key matches the reference's shape: path + split START offset + split
    end (``CachingFileSystem.java:424`` hashes ``path + startOffset + endOffset``).
    Must stay bit-identical to the Java shim (RubixLocalFileSystem.java) — change both
    together; tests/test_locality.py asserts parity.
    """
    out = []
    n_splits = max(1, (file_size + split_bytes - 1) // split_bytes)
    for i in range(n_splits):
        start = i * split_bytes
        end = min(file_size, start + split_bytes)
        out.append((start, end, locate_key(f"{remote_path}{start}{end}", nodes)))
    return out


def executor_hosts(spark) -> list[str]:
    """Current executor hosts from the status tracker (ClusterManager.getNodes analog).

    Python's StatusTracker wrapper doesn't expose executor infos — go through the JVM
    tracker (a Java array of SparkExecutorInfo via py4j)."""
    infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    return sorted({infos[i].host() for i in range(len(infos))})
