"""Adversarial schedules for the async warm-up queue (A10/A18/A19) — the generated-
schedule method applied to WarmupProcessor. Two defects found while building it
(fixed in the same commit):

 - ``enqueue`` cleared the idle flag OUTSIDE the lock, so a drain() racing between
   pending.add and idle.clear observed the stale set flag and reported "drained"
   with the fresh request still unprocessed.
 - ``_run`` gated on ``manifest.get(path) is None``, skipping any EXISTING entry —
   stale included — while the module docstring promises staleness is re-checked at
   execution time. A warm request enqueued after the remote changed silently kept
   serving the old copy until a foreground read paid the warm.

The processor is exercised against a duck-typed manager so schedules control timing
exactly; the Spark-integration path is covered by test_cache_advanced.
"""

from __future__ import annotations

import random
import threading
import time


class _FakeSC:
    def setLocalProperty(self, *_):
        pass


class _FakeSpark:
    sparkContext = _FakeSC()


class _Entry:
    pass


class _FakeManager:
    """Duck-typed CacheManager: records warm() calls; per-path freshness and entry
    presence are test-controlled; warm() can be made slow or racy via hooks."""

    spark = _FakeSpark()

    def __init__(self):
        self.entries: dict[str, _Entry] = {}
        self.stale: set[str] = set()
        self.warmed: list[str] = []
        self.warm_started = threading.Event()
        self.warm_gate: threading.Event | None = None
        self._mu = threading.Lock()

    class _Manifest:
        def __init__(self, outer):
            self.outer = outer

        def get(self, path):
            return self.outer.entries.get(path)

    @property
    def manifest(self):
        return self._Manifest(self)

    def _fresh(self, entry, path):
        return path not in self.stale

    def warm(self, path):
        self.warm_started.set()
        if self.warm_gate is not None:
            assert self.warm_gate.wait(10)
        with self._mu:
            self.warmed.append(path)
            self.entries[path] = _Entry()
            self.stale.discard(path)
        return path


def _proc(mgr):
    from rubix_spark.cache.warmup import WarmupProcessor

    return WarmupProcessor(mgr)


def test_stale_entry_is_rewarmed_not_skipped():
    """The declared contract: a request enqueued after the remote changed warms the
    new content — an existing-but-stale entry must NOT short-circuit the warm."""
    mgr = _FakeManager()
    mgr.entries["/data/t.parquet"] = _Entry()
    mgr.stale.add("/data/t.parquet")
    p = _proc(mgr)
    try:
        assert p.enqueue("/data/t.parquet")
        assert p.drain(10)
        assert mgr.warmed == ["/data/t.parquet"]
        # fresh entries still short-circuit (the coalescing half of the contract)
        assert p.enqueue("/data/t.parquet")
        assert p.drain(10)
        assert mgr.warmed == ["/data/t.parquet"]
    finally:
        p.stop()


def test_drain_cannot_report_done_with_fresh_request_pending():
    """The orchestrated race: enqueue a request while the worker is mid-warm on a
    previous one, then drain — drain must wait for BOTH (pre-fix, the out-of-lock
    idle.clear let a drain racing the enqueue return True immediately)."""
    mgr = _FakeManager()
    mgr.warm_gate = threading.Event()
    p = _proc(mgr)
    try:
        p.enqueue("/a.parquet")
        assert mgr.warm_started.wait(10)      # worker is blocked inside warm(a)
        p.enqueue("/b.parquet")               # idle must be clear from HERE on
        done = []
        t = threading.Thread(target=lambda: done.append(p.drain(15)))
        t.start()
        time.sleep(0.2)
        assert not done, "drain returned while a request was pending"
        mgr.warm_gate.set()
        t.join(20)
        assert done == [True]
        assert sorted(mgr.warmed) == ["/a.parquet", "/b.parquet"]
    finally:
        mgr.warm_gate.set()
        p.stop()


def test_inflight_duplicate_coalesces_but_later_enqueue_requeues():
    mgr = _FakeManager()
    mgr.warm_gate = threading.Event()
    p = _proc(mgr)
    try:
        assert p.enqueue("/a.parquet") is True
        assert mgr.warm_started.wait(10)
        assert p.enqueue("/a.parquet") is False   # in-flight: coalesced
        mgr.warm_gate.set()
        assert p.drain(10)
        mgr.warm_gate = None
        mgr.stale.add("/a.parquet")
        assert p.enqueue("/a.parquet") is True    # completed: a new request queues
        assert p.drain(10)
        assert mgr.warmed == ["/a.parquet", "/a.parquet"]
    finally:
        if mgr.warm_gate is not None:
            mgr.warm_gate.set()
        p.stop()


def test_enqueue_drain_storm_consistency():
    """Seeded random schedules: N enqueuer threads × random paths racing a drainer;
    after every storm, drain() == True implies every enqueued path was warmed
    (returns-True enqueues only; coalesced duplicates ride the winner)."""
    for seed in range(6):
        rng = random.Random(seed)
        mgr = _FakeManager()
        p = _proc(mgr)
        accepted: list[str] = []
        mu = threading.Lock()
        paths = [f"/d/p{i}.parquet" for i in range(rng.randint(2, 8))]

        def worker():
            for _ in range(10):
                path = rng.choice(paths)
                mgr.stale.add(path)  # make re-enqueues meaningful
                if p.enqueue(path):
                    with mu:
                        accepted.append(path)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(20)
        assert p.drain(20), f"seed {seed}: drain timed out"
        # every accepted request resulted in at least one warm of that path
        from collections import Counter

        warmed = Counter(mgr.warmed)
        for path in set(accepted):
            assert warmed[path] >= 1, f"seed {seed}: {path} accepted but never warmed"
        p.stop()


def test_failed_warm_clears_pending_and_drains():
    mgr = _FakeManager()

    def boom(path):
        raise OSError("remote gone")

    mgr.warm = boom
    p = _proc(mgr)
    try:
        assert p.enqueue("/gone.parquet")
        assert p.drain(10)                    # failure must not wedge the queue
        assert p.enqueue("/gone.parquet")     # and must not leak the pending mark
    finally:
        p.stop()
