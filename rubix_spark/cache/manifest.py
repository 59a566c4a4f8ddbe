"""Cache manifest: the metadata/ownership layer of the cache (reference parity A12-A17).

The reference keeps, per cached file, a bitmap mdfile plus a generation number
(``rubix-bookkeeper/.../FileMetadata.java:96-97, 125-182``) and checks staleness by
``lastModified`` (``BookKeeper.java:295-305, 774-777``).  We cache whole parquet
files/directories (Spark's natural unit — a row-group re-read costs the same scan task),
so the manifest is one entry per remote path:

    remote_path -> {local_path, size_bytes, last_modified, generation, last_access, state}

States mirror the thrift ``Location`` enum (``bookkeeper.thrift:6-10``): CACHED (local
copy valid) / WARMING (async materialization queued) — LOCAL/NON_LOCAL ownership does not
apply driver-side.  Persistence is a JSON file next to the cached data, rewritten
atomically; generation numbers survive restarts exactly like the ``_g<N>`` file suffixes
(``rubix-spi/.../CacheUtil.java:162-167``).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict, dataclass, field


CACHED = "CACHED"
WARMING = "WARMING"


@dataclass
class Entry:
    remote_path: str
    local_path: str
    size_bytes: int
    last_modified: float
    generation: int
    state: str = CACHED
    last_access: float = field(default_factory=time.time)
    # sub-file granularity (FileMetadata.java:96-97's block bitmap, at parquet's natural
    # block size — the row group): which remote row groups this entry materializes.
    # None → whole file. size_bytes is then the LOCAL subset size (what eviction weighs);
    # remote_size carries the full remote size for the staleness compare.
    row_groups: list[int] | None = None
    remote_size: int | None = None


class Manifest:
    """Thread-safe, JSON-persisted map of cached files.

    ``touch()`` (the per-cache-hit LRU timestamp) is in-memory with periodic flush —
    a synchronous whole-manifest rewrite per hit would throttle the read path at
    thousands of entries. Lost touches on crash only age LRU ordering, never
    correctness; structural mutations (put/remove/generation) always flush.
    """

    TOUCH_FLUSH_INTERVAL = 5.0  # seconds between touch-driven flushes

    def __init__(self, path: str):
        self._path = path
        self._lock = threading.RLock()
        self._entries: dict[str, Entry] = {}
        # highest generation ever seen per remote path, even after eviction — a stale
        # writer can never resurrect an invalidated copy (FileMetadata.java:125-182)
        self._generations: dict[str, int] = {}
        self._dirty_touches = 0
        self._last_flush = time.time()
        self._load()

    def _load(self) -> None:
        if os.path.exists(self._path):
            with open(self._path) as f:
                raw = json.load(f)
            self._entries = {k: Entry(**v) for k, v in raw.get("entries", {}).items()}
            self._generations = dict(raw.get("generations", {}))

    def _save(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "entries": {k: asdict(v) for k, v in self._entries.items()},
                    "generations": self._generations,
                },
                f,
            )
        os.replace(tmp, self._path)
        self._dirty_touches = 0
        self._last_flush = time.time()

    def get(self, remote_path: str) -> Entry | None:
        with self._lock:
            return self._entries.get(remote_path)

    def touch(self, remote_path: str) -> None:
        with self._lock:
            e = self._entries.get(remote_path)
            if e:
                e.last_access = time.time()
                self._dirty_touches += 1
                if time.time() - self._last_flush >= self.TOUCH_FLUSH_INTERVAL:
                    self._save()

    def flush(self) -> None:
        """Force pending touch timestamps to disk (shutdown/test hook)."""
        with self._lock:
            if self._dirty_touches:
                self._save()

    def next_generation(self, remote_path: str) -> int:
        with self._lock:
            g = self._generations.get(remote_path, 0) + 1
            self._generations[remote_path] = g
            self._save()
            return g

    def put(self, entry: Entry) -> bool:
        """Commit an entry iff its generation is current (CAS — BookKeeper.java:427-431)."""
        with self._lock:
            if entry.generation != self._generations.get(entry.remote_path, 0):
                return False
            self._entries[entry.remote_path] = entry
            self._save()
            return True

    def remove(self, remote_path: str) -> Entry | None:
        with self._lock:
            e = self._entries.pop(remote_path, None)
            if e:
                self._save()
            return e

    def entries(self) -> list[Entry]:
        with self._lock:
            return list(self._entries.values())

    def total_bytes(self) -> int:
        with self._lock:
            return sum(e.size_bytes for e in self._entries.values())
