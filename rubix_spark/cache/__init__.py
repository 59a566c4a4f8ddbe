"""Spark-idiomatic re-expression of RubiX's caching layer (SURVEY.md §2.A).

The reference caches byte ranges of remote object-store files on local disks behind the
Hadoop FileSystem API (``rubix-core/.../CachingFileSystem.java``,
``rubix-bookkeeper/.../BookKeeper.java``).  Spark-first, the same semantics land as:

- a **manifest** (generation-numbered, per-file cache state — the analog of BookKeeper's
  bitmap metadata, A12-A17) in :mod:`rubix_spark.cache.manifest`;
- a **CacheManager** (warm / read-through / staleness / LRU eviction / metrics — A2, A5,
  A6, A10, A15, A16, A18-A19, A26, A27) in :mod:`rubix_spark.cache.manager`, which
  materializes hot parquet onto local disk with a distributed ``spark.read → write`` copy
  and rewrites reads to the local copy.

Deliberately NOT ported (SURVEY.md §7 risk register): the cross-NODE read chains
(NonLocalReadRequestChain, A8/A9) — the locality shim (``cache/locality.py``) schedules
the scan task onto the owning node instead, and off-ring tasks read remote directly;
and the thrift RPC tier (A22-A23) — coordination state lives in the file-locked
manifest, not a service.

The LDTS's actual job (A20) — several ENGINE PROCESSES on one node serving each
other's cached blocks (the reference's Presto+Spark+Hive-share-one-BookKeeper
deployment) — survives without its socket protocol: clients mount the same cache dir,
the flock'd manifest CAS is the coordination point, and a client hits on data another
client warmed (``tests/test_cache_cross_client.py``).
"""

from rubix_spark.cache.manager import CacheManager

__all__ = ["CacheManager"]
